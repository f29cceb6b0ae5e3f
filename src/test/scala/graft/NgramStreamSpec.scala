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

  test("CMS accumulator: cross-batch hitters, no false negatives, overcount only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val acc = new graft.streaming.NgramStream.CmsHeavyHitters(
      n = 2, topKPerBatch = 100)
    val q = input.toDF().toDF("text").writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.update(b, "text"))
      .start()
    try {
      // "buy now" reaches 4 only ACROSS batches — per-batch exact
      // counting would never see it clear the threshold
      input.addData("buy now please", "buy now friend")
      q.processAllAvailable()
      assert(acc.heavyHitters(4L).isEmpty, "not hot yet")
      input.addData("why buy now", "always buy now")
      q.processAllAvailable()
      val hot = acc.heavyHitters(4L)
      assert(hot.map(_._1) == Seq("buy now"), s"got $hot")
      assert(hot.head._2 >= 4L, "CMS only ever overcounts")
      // exact stream counts for every candidate are a lower bound
      assert(acc.heavyHitters(5L).isEmpty, "threshold respected")
      assert(acc.sketchBytes.nonEmpty, "state is checkpointable")
    } finally q.stop()
  }

  test("CMS accumulator: candidate head is bounded by capFactor x topK; pre-batch guard") {
    implicit val sqlCtx = spark.sqlContext
    val acc = new graft.streaming.NgramStream.CmsHeavyHitters(
      n = 1, topKPerBatch = 2, capFactor = 2)
    // checkpoint before any batch: clear error, not an NPE
    intercept[IllegalArgumentException](acc.sketchBytes)
    val input = MemoryStream[String]
    val q = input.toDF().toDF("text").writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.update(b, "text"))
      .start()
    try {
      // 4 batches of distinct unigrams admit 2 candidates each; without
      // eviction the head would reach 8 — the cap holds it at 4
      input.addData("a1 a2 a3"); q.processAllAvailable()
      input.addData("b1 b2 b3"); q.processAllAvailable()
      input.addData("c1 c2 c3"); q.processAllAvailable()
      input.addData("d1 d2 d3"); q.processAllAvailable()
      assert(acc.candidateCount <= 4,
        s"candidate head ${acc.candidateCount} exceeds cap")
    } finally q.stop()
  }
}
