package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DedupStream

/** Bounded-state streaming dedup: duplicates inside the watermark
  * window are dropped (same batch AND across batches); state expires
  * with the watermark, so a duplicate arriving after the window is
  * emitted again — the documented at-least-once-per-epoch contract
  * that idempotent sinks turn into exactly-once.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("in-window duplicates dropped across microbatches; state " +
      "expires with the watermark (late duplicate re-emitted)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val out = DedupStream.dedup(
      input.toDS().toDF("event_id", "ts", "value"),
      "ts", "10 minutes", Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    // batch 1: id 1 twice in one batch, id 2 once
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:00:30"), 1.5),
      (2L, ts("2024-01-01 10:01:00"), 2.0))
    q.processAllAvailable()
    // batch 2: id 1 again while still inside the 10m window -> dropped
    input.addData((1L, ts("2024-01-01 10:05:00"), 9.0))
    q.processAllAvailable()
    val mid = spark.table("dedup_out")
      .select($"event_id").as[Long].collect().sorted
    assert(mid.toSeq == Seq(1L, 2L), s"got ${mid.toSeq}")

    // advance the watermark far past 10:00 + 10m...
    input.addData((3L, ts("2024-01-01 11:00:00"), 3.0))
    q.processAllAvailable()
    // ...then re-deliver id 1: its state expired -> re-emitted (the
    // documented contract; an idempotent sink absorbs it)
    input.addData((1L, ts("2024-01-01 11:01:00"), 7.0))
    q.processAllAvailable()
    val fin = spark.table("dedup_out")
      .select($"event_id").as[Long].collect().sorted
    assert(fin.toSeq == Seq(1L, 1L, 2L, 3L), s"got ${fin.toSeq}")
    q.stop()
  }

  test("composed with the idempotent snapshot sink the pipeline is " +
      "exactly-once per id end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val t = java.nio.file.Files
      .createTempDirectory("graft_dedup_sink").toString + "/t"
    val input = MemoryStream[(Long, Timestamp, Double)]
    val deduped = DedupStream.dedup(
      input.toDS().toDF("event_id", "ts", "value"),
      "ts", "10 minutes", Seq("event_id"))
    val q = deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", t + "_ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // MERGE on the id: a re-emitted late duplicate updates in
        // place instead of double-counting
        if (!batch.isEmpty)
          graft.sources.SnapshotTable.merge(batch.sparkSession, t,
            batch, "event_id")
        ()
      }.start()
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:00:30"), 1.5))
    q.processAllAvailable()
    input.addData((2L, ts("2024-01-01 11:00:00"), 2.0)) // advances wm
    q.processAllAvailable()
    input.addData((1L, ts("2024-01-01 11:01:00"), 9.0)) // late replay
    q.processAllAvailable()
    val rows = graft.sources.SnapshotTable.read(spark, t)
      .select($"event_id").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L)) // exactly one row per id
    q.stop()
  }
}
