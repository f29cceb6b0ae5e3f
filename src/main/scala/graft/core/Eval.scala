package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier / filter evaluation operators — the measurement side of
  * the curation stack: every quality gate, language-ID heuristic or
  * learned classifier in the pipeline needs its accuracy AUDITED
  * against labels before it gates a 100 TB corpus.
  *
  * All four operators are exact-integer formulations (micro-scaled
  * BIGINT ratios, the q144 convention): sums are order-free across
  * partitions, every division is a single positive-integer `DIV` at
  * the end, so the DuckDB oracle replays them bit-for-bit — no float
  * reduction order, no transcendental, anywhere.
  *
  * Scale posture: each operator is one or two map-side-combinable
  * aggregations over the corpus; post-aggregate state is bounded by
  * the score grid (ROC — micro-rounded scores live on a ≤1.5M-value
  * lattice), the bin count (calibration), or the label alphabet
  * squared (confusion/kappa) — model-size tables, never corpus-size.
  */
object Eval {

  /** Exact ROC-AUC of a BIGINT score against a boolean label, by
    * tied-pair counting: AUC = (#{pos > neg} + ½·#{pos = neg}) /
    * (n_pos·n_neg). One grouped aggregation collapses the corpus to
    * (score, n_pos, n_neg); a single ordered pass over that bounded
    * lattice accumulates, per score s, the negatives strictly below
    * (concordant pairs) and the negatives AT s (tied pairs, weight ½
    * carried as 2× integers).  Result: one row
    * (n_pos, n_neg, auc_micro).
    *
    * The global window orders the distinct-score table only — micro-
    * rounded scores are lattice-bounded regardless of corpus size, so
    * the single-partition sort is model-size state (the vocab-
    * numbering precedent), not a corpus sort. The `num2 * 1e6`
    * product stays under 2^63 through ~1.5M positives × negatives;
    * beyond that the same sums feed a DECIMAL(38) division.
    */
  def rocAuc(df: DataFrame, scoreMicro: Column, label: Column): DataFrame = {
    val byScore = df
      .select(scoreMicro.cast("long").as("s"), label.as("y"))
      .groupBy("s")
      .agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("np"),
        sum(when(col("y"), 0L).otherwise(1L)).as("nn"))
    val below = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum_nn", coalesce(sum("nn").over(below), lit(0L)))
      .agg(
        sum("np").as("n_pos"),
        sum("nn").as("n_neg"),
        sum(expr("2 * np * cum_nn + np * nn")).as("num2"))
      .select(col("n_pos"), col("n_neg"),
        // single-class input (n_pos or n_neg = 0) leaves AUC undefined:
        // emit an explicit NULL instead of a silent ANSI-dependent
        // div-by-zero (null with ANSI off, exception with it on)
        expr("""CASE WHEN n_pos > 0 AND n_neg > 0
                THEN num2 * 1000000 DIV (2 * n_pos * n_neg) END""")
          .as("auc_micro"))
  }

  /** Reliability (calibration) bins: the score axis [lo, hi] (micro
    * units) split into `nBins` equal cells, per cell the doc count,
    * positive count, exact positive rate and the score mass — the
    * table a calibration curve is drawn from. Scores at the top edge
    * fold into the last bin (right-closed), matching every plotting
    * convention; scores below `loMicro` symmetrically fold into bin 0,
    * so every input row lands in exactly one of the nBins cells.
    * ONE aggregation; nBins rows out.
    */
  def calibrationBins(df: DataFrame, scoreMicro: Column, label: Column,
                      loMicro: Long, hiMicro: Long, nBins: Int): DataFrame = {
    val width = (hiMicro - loMicro) / nBins
    require(width > 0 && (hiMicro - loMicro) % nBins == 0,
      s"[$loMicro,$hiMicro] must split evenly into $nBins bins")
    df.select(scoreMicro.cast("long").as("s"), label.as("y"))
      .withColumn("bin",
        expr(s"greatest(least((s - (${loMicro}L)) DIV ${width}L, ${nBins - 1}L), 0L)"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum("s").as("sum_score_micro"))
      .withColumn("pos_rate_micro", expr("n_pos * 1000000 DIV n_docs"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        col("pos_rate_micro"), col("sum_score_micro"))
  }

  /** Confusion matrix of a categorical prediction against gold
    * labels: observed (gold, pred) cells with counts, the gold-class
    * total and the exact per-cell recall share. Sparse (only observed
    * cells), bounded by the label alphabet squared. One corpus
    * aggregation + one window over the cell table.
    */
  def confusion(df: DataFrame, gold: Column, pred: Column): DataFrame = {
    val cells = df.select(gold.as("gold"), pred.as("pred"))
      .groupBy("gold", "pred")
      .agg(count(lit(1)).as("n_docs"))
    val perGold = Window.partitionBy("gold")
    cells
      .withColumn("gold_total", sum("n_docs").over(perGold))
      .withColumn("share_micro", expr("n_docs * 1000000 DIV gold_total"))
      .select(col("gold"), col("pred"), col("n_docs"),
        col("gold_total"), col("share_micro"))
  }

  /** Two-proportion z-test — the A/B experiment readout: given a
    * two-armed variant column and a boolean success flag, one
    * aggregation collapses the corpus to four exact BIGINTs
    * (n/successes per arm) and the pooled z statistic
    *   z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))
    * is ONE fixed float expression over them at the very end. Every
    * float op in the tree (÷, −, +, ×, √) is IEEE-correctly-rounded,
    * so an external engine evaluating the SAME expression tree over
    * the same integers reproduces the double bit-for-bit — the q111
    * KS discipline. `significant` applies the two-sided 5% bound.
    * Arms with zero rows leave z NULL (explicitly, not via ANSI
    * div-by-zero — the rocAuc convention).
    */
  def twoProportionZ(df: DataFrame, variant: Column, success: Column,
                     armA: String, armB: String): DataFrame =
    df.select(variant.as("arm"), success.as("y"))
      .filter(col("arm").isin(armA, armB))
      .agg(
        sum(when(col("arm") === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === armA && col("y"), 1L).otherwise(0L)).as("x_a"),
        sum(when(col("arm") === armB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === armB && col("y"), 1L).otherwise(0L)).as("x_b"))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        expr("""CASE WHEN n_a > 0 AND n_b > 0
                  AND x_a + x_b > 0 AND x_a + x_b < n_a + n_b
                THEN round(
                  (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                   - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                  / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
                END""").as("z"))
      .withColumn("significant",
        col("z").isNotNull && abs(col("z")) > lit(1.959964))

  /** Cohen's kappa — chance-corrected agreement between a prediction
    * and gold labels (multiclass):
    *   kappa = (po − pe) / (1 − pe)
    *         = (n·agree − Σ_c row_c·col_c) / (n² − Σ_c row_c·col_c)
    * computed entirely in BIGINT from the confusion cells (n ≤ 3M
    * keeps n²·1e6 under 2^63; the sums themselves never overflow).
    * One corpus aggregation; the marginal join runs on the label-
    * alphabet-sized cell table. Result: one row with the agreement
    * anatomy and kappa_micro.
    */
  def cohenKappa(df: DataFrame, gold: Column, pred: Column): DataFrame = {
    val cells = df.select(gold.as("gold"), pred.as("pred"))
      .groupBy("gold", "pred")
      .agg(count(lit(1)).as("c"))
    val rowTot = cells.groupBy("gold").agg(sum("c").as("row_c"))
    val colTot = cells.groupBy("pred").agg(sum("c").as("col_c"))
    val chance = rowTot
      .join(colTot, rowTot("gold") === colTot("pred"))
      .agg(sum(expr("row_c * col_c")).as("chance_pairs"))
    val agree = cells.agg(
      sum("c").as("n_docs"),
      sum(when(col("gold") === col("pred"), col("c")).otherwise(0L))
        .as("n_agree"))
    agree.crossJoin(broadcast(chance))
      .select(col("n_docs"), col("n_agree"), col("chance_pairs"),
        expr("""(n_docs * n_agree - chance_pairs) * 1000000
                DIV (n_docs * n_docs - chance_pairs)""").as("kappa_micro"))
  }
}
