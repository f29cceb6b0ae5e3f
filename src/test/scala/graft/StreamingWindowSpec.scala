package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** E2 (SURVEY §2.10): event-time windowed aggregation with watermark —
  * not required for reference parity (the reference has no streaming
  * windows) but part of the engine's streaming surface.
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window + watermark: aggregates close and late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val windowed = input.toDF().toDF("ts", "user", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"user")
      .agg(sum($"value").as("total"), count(lit(1)).as("n"))
    val q = windowed.writeStream
      .format("memory").queryName("win_out")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: two users in the 10:00 window, one in 10:05
    input.addData(
      (ts("2024-01-01 10:00:30"), "a", 1.0),
      (ts("2024-01-01 10:01:00"), "a", 2.0),
      (ts("2024-01-01 10:02:00"), "b", 5.0),
      (ts("2024-01-01 10:06:00"), "a", 7.0))
    q.processAllAvailable()
    // append mode: nothing emitted until the watermark passes the window end
    // batch 2: advance event time far beyond 10:05+10min -> both windows close
    input.addData((ts("2024-01-01 10:30:00"), "c", 1.0))
    q.processAllAvailable()
    val closed = spark.table("win_out")
      .select($"window.start".cast("string"), $"user", $"total", $"n")
      .as[(String, String, Double, Long)].collect().toSet
    assert(closed == Set(
      ("2024-01-01 10:00:00", "a", 3.0, 2L),
      ("2024-01-01 10:00:00", "b", 5.0, 1L),
      ("2024-01-01 10:05:00", "a", 7.0, 1L)))

    // batch 3: a LATE row for the long-closed 10:00 window -> dropped
    input.addData((ts("2024-01-01 10:01:30"), "a", 100.0))
    q.processAllAvailable()
    // and close the 10:30 window to flush everything else
    input.addData((ts("2024-01-01 11:00:00"), "c", 1.0))
    q.processAllAvailable()
    val totalsForA = spark.table("win_out")
      .filter($"user" === "a" && $"window.start".cast("string") === "2024-01-01 10:00:00")
      .agg(sum("total")).head().getDouble(0)
    assert(totalsForA == 3.0, "late row must have been dropped by the watermark")
    q.stop()
  }
}
