package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene step (remove eval overlap from the training corpus so
  * benchmark numbers measure generalization, not memorization).
  *
  * Plan shape, chosen for the 100 TB asymmetry (train is huge, the
  * benchmark set is tiny): build the DISTINCT eval shingle set once
  * and stream the training corpus through one explode -> semi-join ->
  * per-doc count. The join carries no hint on purpose: AQE broadcasts
  * the eval side from its MEASURED size when it is small (the common
  * case — the training side then never shuffles except the final
  * per-doc aggregation of hits), and degrades to a shuffled hash join
  * on the shingle key when an outsized eval suite would blow the
  * broadcast limit. The code declares the join; the optimizer picks
  * the physical strategy.
  *
  * The reference pipeline has no decontamination analogue; this is a
  * training-data extension (shingle machinery shared with
  * [[Dedup.shingles]], reference transform surface at
  * `/root/reference/process_etl.py:20-24`).
  */
object Decontaminate {

  /** Per-training-doc contamination audit against an eval set.
    *
    * @param train    training documents (huge side)
    * @param eval     benchmark/eval documents (small side; broadcast)
    * @param n        shingle width in words — published pipelines use
    *                 8-13-gram overlap; pick n large enough that chance
    *                 collisions vanish
    * @param minHits  distinct shared shingles required to flag
    * @return every training row with `n_hits` (distinct eval shingles
    *         shared) and `contaminated` (n_hits >= minHits)
    */
  def flagContaminated(train: DataFrame, eval: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 8, minHits: Int = 1): DataFrame = {
    val evalShingles = eval
      .select(explode(Dedup.shingles(col(textCol), n)).as("shingle"))
      .distinct()
    val trainShingles = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("shingle"))
    // inner join against the eval set = semi-join with a hit count;
    // eval shingles are distinct so each (doc, shingle) match counts
    // once. NO broadcast hint: a hint would FORCE broadcast even when
    // a huge eval suite exceeds the broadcast limit and the job should
    // degrade to a shuffled join — AQE broadcasts small sides from
    // their measured runtime size instead.
    val hits = trainShingles
      .join(evalShingles, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    train.join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** Decontaminated corpus: training rows with fewer than `minHits`
    * shared n-grams against the eval set.
    */
  def clean(train: DataFrame, eval: DataFrame, idCol: String,
            textCol: String, n: Int = 8, minHits: Int = 1): DataFrame =
    flagContaminated(train, eval, idCol, textCol, n, minHits)
      .filter(!col("contaminated"))
      .drop("n_hits", "contaminated")
}
