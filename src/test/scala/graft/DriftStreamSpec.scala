package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.DriftStream

/** Streaming PSI drift monitor: windows score against a batch-fit
  * reference with the exact arithmetic of the batch form, emit once on
  * close, and late data never reopens a scored window.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The engine's exact PSI arithmetic, independently in the test. */
  private def psiRef(counts: Array[Long], ref: Array[Long]): Long = {
    val nB = ref.length
    val n = counts.sum
    val rt = ref.sum
    (0 until nB).map { i =>
      val p = (counts(i) + 1).toDouble / (n + nB).toDouble
      val q = (ref(i) + 1).toDouble / (rt + nB).toDouble
      math.floor(1e6 * ((p - q) * math.log(p / q))).toLong
    }.sum
  }

  test("windowed PSI: batch-arithmetic parity, drifted window scores high, " +
      "late rows dropped") {
    implicit val sqlCtx = spark.sqlContext
    // reference: uniform over 4 buckets
    val reference = DriftStream.fitReference(
      (0 until 40).map(i => (i % 4).toLong).toDF("b"), col("b"), nBuckets = 4)
    assert(reference.toSeq == Seq(10L, 10L, 10L, 10L))

    val input = MemoryStream[(Timestamp, Long)]
    val scored = DriftStream.windowedPsi(
      input.toDF().toDF("ts", "b"), "ts", least(col("b"), lit(3L)),
      reference, "5 minutes", "10 minutes")
    val q = scored.writeStream.format("memory").queryName("drift_out")
      .outputMode(OutputMode.Append()).start()

    // window 10:00 mirrors the reference shape (2 rows per bucket);
    // window 10:05 concentrates everything in bucket 0
    val w1 = (0 until 8).map(i => (ts(s"2024-01-01 10:00:0$i"), (i % 4).toLong))
    val w2 = (0 until 8).map(i => (ts(s"2024-01-01 10:05:0$i"), 0L))
    input.addData(w1 ++ w2: _*)
    q.processAllAvailable()
    // close both windows
    input.addData((ts("2024-01-01 10:30:00"), 1L))
    q.processAllAvailable()
    val rows = spark.table("drift_out")
      .select(col("window_start").cast("string"), col("psi_micro"), col("n_rows"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq("2024-01-01 10:00:00", "2024-01-01 10:05:00"))
    val Seq(same, drifted) = rows
    assert(same._3 == 8L && drifted._3 == 8L)
    assert(same._2 == psiRef(Array(2L, 2L, 2L, 2L), reference))
    assert(drifted._2 == psiRef(Array(8L, 0L, 0L, 0L), reference))
    assert(drifted._2 > 10 * math.max(math.abs(same._2), 1L),
      s"concentrated window must read as drift: $drifted vs $same")

    // a LATE row for the long-closed 10:00 window must not re-emit
    input.addData((ts("2024-01-01 10:01:00"), 3L))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 11:00:00"), 1L))
    q.processAllAvailable()
    val emitted = spark.table("drift_out")
      .filter(col("window_start").cast("string") === "2024-01-01 10:00:00")
      .count()
    assert(emitted == 1L, "closed window scored exactly once")
    q.stop()
  }
}
