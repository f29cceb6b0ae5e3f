package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous distribution-drift monitoring — the streaming twin of
  * [[graft.core.Profile.psi]] (q108), and the fourth leg of the
  * model-as-state discipline (LM table q68, band index q70, threshold
  * table QualityGateStream): the REFERENCE distribution is fit in
  * batch over the existing corpus and enters the stream as nBuckets
  * driver-held longs (bounded model state, the literal-centroid
  * discipline); every event-time window's incoming distribution is
  * then PSI-scored against it on close.
  *
  * Execution shape: ONE windowed aggregation (watermark-bounded
  * state; nBuckets conditional counters collapse a window's
  * distribution into a single row — no second streaming aggregation,
  * which append mode would reject) followed by a STATELESS codegen
  * projection computing the PSI from that row and the reference
  * literals. Append mode emits each window exactly once when the
  * watermark closes it; restarts replay identically because the score
  * is a pure function of (window counts, reference).
  *
  * Same determinism contract as the batch form: add-one smoothing on
  * both sides, per-bucket terms floored to 1e-6 fixed-point BIGINT
  * before the (integer, order-free) sum.
  */
object DriftStream {

  /** Dense reference bucket counts from the existing corpus — the
    * batch fit the stream scores against. Driver holds nBuckets longs.
    */
  def fitReference(corpus: DataFrame, bucket: Column,
                   nBuckets: Int): Array[Long] = {
    val m = corpus.select(bucket.cast("long").as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until nBuckets).map(b => m.getOrElse(b.toLong, 0L)).toArray
  }

  /** Per-window PSI of a streaming DataFrame against `refCounts`.
    *
    * `bucket` must land every row in [0, refCounts.length) — clamp
    * with `least(...)` like the batch gate; out-of-range rows would
    * silently miss every counter.
    *
    * @return streaming (window_start, psi_micro, n_rows), append mode
    */
  def windowedPsi(stream: DataFrame, tsCol: String, bucket: Column,
                  refCounts: Array[Long], windowDur: String,
                  watermarkDelay: String): DataFrame = {
    val nB = refCounts.length
    require(nB >= 2, "psi needs at least 2 buckets")
    val counters = (0 until nB).map(i =>
      sum(when(col("__b") === i, lit(1L)).otherwise(lit(0L))).as(s"__c$i"))
    val agged = stream
      .withColumn("__b", bucket.cast("long"))
      .withWatermark(tsCol, watermarkDelay)
      // group on the window STRUCT; extracting .start before the agg
      // breaks watermark detection (see verify-skill gotchas)
      .groupBy(window(col(tsCol), windowDur))
      .agg(counters.head, counters.tail: _*)
    val n = (0 until nB).map(i => col(s"__c$i")).reduce(_ + _)
    val refTotal = refCounts.sum
    val terms = (0 until nB).map { i =>
      val p = (col(s"__c$i") + lit(1L)).cast("double") /
        (n + lit(nB.toLong)).cast("double")
      // the reference share is a LITERAL double — computed once on the
      // driver with the same (c+1)/(total+nB) smoothing
      val q = lit((refCounts(i) + 1L).toDouble / (refTotal + nB).toDouble)
      floor(lit(1000000.0) * ((p - q) * log(p / q))).cast("long")
    }
    agged.select(col("window").getField("start").as("window_start"),
      terms.reduce(_ + _).as("psi_micro"), n.as("n_rows"))
  }
}
