package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming n-gram heavy hitters: exact within-window counts,
  * watermark-bounded state, emission only on window close.
  */
class NgramStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed heavy hitters match batch counts; emit on close only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val hh = graft.streaming.NgramStream.heavyHitters(
      input.toDF().toDF("ts", "text"), "ts", "text",
      n = 2, minCount = 3L)
    val q = hh.writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 10:00-10:05: "click here" appears 3x (boilerplate),
      // everything else < 3
      input.addData(
        (ts("2024-01-01 10:00:10"), "click here to win"),
        (ts("2024-01-01 10:01:00"), "please click here now"),
        (ts("2024-01-01 10:02:00"), "just click here"),
        (ts("2024-01-01 10:03:00"), "something else entirely"))
      q.processAllAvailable()
      assert(spark.table("hh_out").isEmpty,
        "append mode: nothing emits before the watermark closes the window")

      // advance event time past 10:05 + 10min watermark
      input.addData((ts("2024-01-01 10:20:00"), "tick"))
      q.processAllAvailable()
      val emitted = spark.table("hh_out")
        .select($"window.start".cast("string"), $"ngram", $"cnt")
        .as[(String, String, Long)].collect().toSet
      assert(emitted == Set(("2024-01-01 10:00:00", "click here", 3L)))

      // a late row for the closed window is dropped, not re-emitted
      input.addData((ts("2024-01-01 10:01:30"), "click here again"),
        (ts("2024-01-01 10:40:00"), "tock"))
      q.processAllAvailable()
      assert(spark.table("hh_out").count() == 1, "late data dropped")
    } finally q.stop()
  }
}
