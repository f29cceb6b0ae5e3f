package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.QualityGateStream

/** Continuous quality gate: thresholds fit in batch (model-as-table),
  * stream gated by a stateless stream-static broadcast join — parity
  * with the batch gate on the same rows, unknown-source passthrough,
  * and a threshold-table swap changes the gate without code changes.
  */
class QualityGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and it is a fine day in the sun"
  private val badText = "!!! ??? ,,, ;;; ::: !!! ??? ,,, ;;; :::"

  // good-majority per source, so the per-source MEDIAN is the good
  // score and each source's bad row falls below it
  private def corpus = Seq(
    (1L, "web", goodText), (2L, "web", goodText), (3L, "web", badText),
    (4L, "book", goodText), (5L, "book", badText), (6L, "book", goodText))
    .toDF("doc_id", "source", "text")

  test("stream gate == batch gate on the same rows; unknown sources pass") {
    implicit val sqlCtx = spark.sqlContext
    // fit on the existing corpus: median per source
    val thresholds = QualityGateStream.fitThresholds(corpus, "text", 0.5)
    val batchKept = QualityGateStream.gate(corpus, "text", thresholds)
      .select("doc_id").as[Long].collect().toSet

    val input = MemoryStream[(Long, String, String)]
    val gated = QualityGateStream.gate(
      input.toDF().toDF("doc_id", "source", "text"), "text", thresholds)
    val q = gated.writeStream.format("memory").queryName("qgate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // replay the corpus through the stream in two micro-batches,
      // plus an UNKNOWN source row that must pass (defaultKeep)
      input.addData((1L, "web", goodText), (2L, "web", goodText),
        (3L, "web", badText))
      q.processAllAvailable()
      input.addData((4L, "book", goodText), (5L, "book", badText),
        (6L, "book", goodText), (7L, "forum", badText))
      q.processAllAvailable()
      val streamKept = spark.table("qgate_out")
        .select("doc_id").as[Long].collect().toSet
      assert(streamKept - 7L == batchKept,
        s"stream $streamKept vs batch $batchKept")
      assert(streamKept.contains(7L), "unknown source must pass the left join")
      // the gate actually gates: low-quality known-source rows dropped
      assert(!streamKept.contains(3L) && !streamKept.contains(5L))
    } finally q.stop()
  }

  test("threshold-table swap changes the gate, not the query code") {
    implicit val sqlCtx = spark.sqlContext
    // an impossible threshold table drops everything for that source
    val strict = Seq(("web", 1e9)).toDF("source", "q_threshold")
    val input = MemoryStream[(Long, String, String)]
    val gated = QualityGateStream.gate(
      input.toDF().toDF("doc_id", "source", "text"), "text", strict,
      defaultKeep = false)
    val q = gated.writeStream.format("memory").queryName("qgate_strict")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "web", goodText), (2L, "forum", goodText))
      q.processAllAvailable()
      val kept = spark.table("qgate_strict").select("doc_id").as[Long].collect()
      assert(kept.isEmpty, s"strict gate + defaultKeep=false kept ${kept.toSeq}")
    } finally q.stop()
  }
}
