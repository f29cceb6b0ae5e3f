package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream time-bounded join (attribution shape): matches inside
  * the window, no match outside it, and leftOuter emits the unmatched
  * row with nulls once the watermark closes its window.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner: clicks attribute to impressions within 10 minutes only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = graft.streaming.StreamJoin.timeBounded(
      imps.toDF().toDF("imp_user", "imp_ts"),
      clicks.toDF().toDF("clk_user", "clk_ts"),
      "imp_user", "clk_user", "imp_ts", "clk_ts",
      within = "10 minutes", watermarkDelay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()

    imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    clicks.addData(
      (1L, ts("2024-01-01 10:04:00")),  // in window
      (2L, ts("2024-01-01 10:30:00")),  // outside window
      (3L, ts("2024-01-01 10:02:00")))  // no impression
    q.processAllAvailable()
    val got = spark.table("attrib")
      .select($"imp_user", $"clk_ts".cast("string"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "2024-01-01 10:04:00")))
    q.stop()
  }

  test("leftOuter: unmatched impression emits nulls after its window closes") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = graft.streaming.StreamJoin.timeBounded(
      imps.toDF().toDF("imp_user", "imp_ts"),
      clicks.toDF().toDF("clk_user", "clk_ts"),
      "imp_user", "clk_user", "imp_ts", "clk_ts",
      within = "10 minutes", watermarkDelay = "5 minutes",
      joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append()).start()

    imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    clicks.addData((1L, ts("2024-01-01 10:03:00")))
    q.processAllAvailable()
    // advance BOTH watermarks far past 10:00 + 10min + 5min lateness so
    // the unmatched impression's state is provably closeable
    imps.addData((99L, ts("2024-01-01 11:00:00")))
    clicks.addData((99L, ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    imps.addData((98L, ts("2024-01-01 12:00:00")))
    clicks.addData((98L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    val rows = spark.table("attrib_outer")
      .select($"imp_user", $"clk_user")
      .as[(Long, Option[Long])].collect()
    val matched = rows.collect { case (u, Some(c)) => (u, c) }.toSet
    val unmatchedUsers = rows.collect { case (u, None) => u }.toSet
    assert(matched.contains((1L, 1L)))
    assert(unmatchedUsers.contains(2L),
      s"unmatched impression was never emitted with nulls: ${rows.toSeq}")
    q.stop()
  }
}
