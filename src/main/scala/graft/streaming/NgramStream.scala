package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.TextAnalysis

/** Streaming boilerplate detection: windowed n-gram heavy hitters
  * over a document stream — the online form of
  * [[graft.core.TextAnalysis.topNgrams]] (batch) for catching
  * template/spam bursts as they arrive rather than in the nightly
  * sweep.
  *
  * Spark-first state story: the aggregation state is (window, ngram)
  * partial counts, map-side combined before the shuffle exactly like
  * the batch query, and EVICTED by the watermark — state is bounded
  * by (grams per window × windows in flight), not by stream length.
  * Counts within a window are exact; the heavy-hitter filter applies
  * at emission (append mode: a window's hitters emit once, when the
  * watermark closes it). For unbounded within-window cardinality
  * (web-scale 5-gram streams), [[graft.core.Sketches.countMin]] on a
  * foreachBatch loop is the documented sketch fallback — same answer
  * shape, ε-approximate counts, constant state.
  */
object NgramStream {

  def heavyHitters(docs: DataFrame, tsCol: String, textCol: String,
                   n: Int, minCount: Long,
                   windowDuration: String = "5 minutes",
                   watermark: String = "10 minutes"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(TextAnalysis.ngramsAll(col(textCol), n)).as("ngram"))
      .groupBy(window(col(tsCol), windowDuration), col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
}
