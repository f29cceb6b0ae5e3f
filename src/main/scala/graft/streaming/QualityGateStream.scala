package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.TextAnalysis

/** Continuous quality gating of an incoming document stream — the
  * streaming twin of `Sampling.thresholdGateByGroup` (q91's scale
  * variant), and the third leg of the model-as-table discipline
  * (bigram LM q68, band index q70): the per-source thresholds are FIT
  * IN BATCH (a percentile aggregation over the existing corpus),
  * live in a table, and join against the stream as a STATIC side.
  *
  * Execution shape: the quality score is the same codegen'd
  * projection the batch gate uses (exact integer ratios, one mul/add
  * chain — no state), and the stream-static join broadcasts the
  * S-row threshold table into every micro-batch, so the stream
  * carries NO aggregation state at all: any executor can gate any
  * row, restarts replay identically (the gate is a pure function of
  * row + table), and re-fitting the thresholds is a table swap, not
  * a stream restart with new code.
  */
object QualityGateStream {

  /** Per-source score thresholds from the EXISTING corpus: the batch
    * fit the stream gate reads. One partial-aggregated
    * percentile_approx per source — S tiny rows out.
    */
  def fitThresholds(corpus: DataFrame, textCol: String, quantile: Double,
                    accuracy: Int = 10000): DataFrame =
    TextAnalysis.qualityScore(corpus, textCol)
      .groupBy(col("source"))
      .agg(percentile_approx(col("quality_score"), lit(quantile),
        lit(accuracy)).as("q_threshold"))

  /** Gate a streaming DataFrame of (doc_id, source, text) rows: score
    * each row with the batch gate's exact projection, keep rows at or
    * above their source's threshold. `thresholds` is a STATIC
    * DataFrame (read from the fitted table); unknown sources pass
    * `defaultKeep` — a left join, so a source missing from the fit
    * never silently drops the stream's rows.
    */
  def gate(stream: DataFrame, textCol: String, thresholds: DataFrame,
           defaultKeep: Boolean = true): DataFrame =
    TextAnalysis.qualityScore(stream, textCol)
      .join(broadcast(thresholds), Seq("source"), "left")
      .filter(
        when(col("q_threshold").isNull, lit(defaultKeep))
          .otherwise(col("quality_score") >= col("q_threshold")))
      .select(col("doc_id"), col("source"), col("quality_score"))
}
