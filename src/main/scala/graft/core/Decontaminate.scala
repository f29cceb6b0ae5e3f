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

  /** SPAN-level decontamination — where [[flagContaminated]] flags
    * whole documents and [[clean]] drops them, this REWRITES: every
    * training token lying inside any `n`-token window that matches an
    * eval-set n-gram is removed (all its occurrences), and each doc
    * re-emits from its survivors — the Lee et al. 2022 ExactSubstr
    * rewrite with the EVAL SUITE as the duplicate source instead of
    * the corpus itself, salvaging the uncontaminated remainder of
    * long documents a doc-level gate would discard whole.
    *
    * Mechanics are [[SuffixArray.exactSubstrDedup]]'s verbatim: mark
    * duplicate window STARTS (here: train grams semi-joined against
    * the distinct eval gram keys — broadcast-friendly, never a gram
    * window), turn starts into covered-token marks with the per-doc
    * rowsBetween(−(n−1), 0) max window, rebuild each doc from
    * surviving tokens. Everything is doc- or gram-keyed; the eval
    * side is model-size by contract.
    *
    * Output: one row per TRAINING document — (idCol, clean_text,
    * n_tokens, n_removed); a fully-contaminated doc comes back with
    * empty clean_text (downstream decides).
    */
  def scrubSpans(train: DataFrame, eval: DataFrame, idCol: String,
                 textCol: String, n: Int = 8): DataFrame = {
    require(n >= 2, "n must be >= 2")
    val docs = SuffixArray.tokenized(train, idCol, textCol).persist()
    val evalKeys = SuffixArray.gramRows(
        SuffixArray.tokenized(eval, idCol, textCol), n)
      .select("g").distinct()
    val dupStarts = SuffixArray.gramRows(docs, n)
      .join(evalKeys, Seq("g"), "left_semi")
      .select(col("sa_doc"), col("pos"), lit(1L).as("ds"))
    val out = SuffixArray.rewriteMarked(docs, dupStarts, n, idCol)
    val mat = out.localCheckpoint(true)
    docs.unpersist()
    mat
  }

  /** [[flagContaminated]] behind a BLOOM PRE-FILTER — the 100 TB
    * shape of benchmark decontamination: the eval suite's shingles
    * build a [[Sketches.bloomBuild]] relational filter once
    * (model-size; collected to a [[Sketches.bloomWords]] literal
    * array), every training shingle probes it as a codegen'd bit
    * test INSIDE its own projection ([[Sketches.bloomTestLit]] — no
    * distinct, no probe join, no re-aggregation), and only the
    * surviving CANDIDATES enter the exact verification join. At
    * production FPR (~1% at 10 bits/key) the exact join's probe side
    * shrinks by ~99% — the train shingle stream never shuffles, it
    * genuinely dies at the bit test. Train parquet is read twice
    * (totals pass + verify pass) — deliberate; see the body comment.
    *
    * Exactness is NOT approximated: a bloom filter has no false
    * negatives, so `n_hits`/`contaminated` equal [[flagContaminated]]
    * bit-for-bit (`BloomSpec` gates it); false positives only cost
    * verification work, surfaced per doc as `n_candidates` (the gate
    * pins the pre-filter's selectivity relationally). The filter uses
    * the portable rollingHash→mix32 double-hash chain, so the WHOLE
    * pipeline — bits included — replays in SQL.
    *
    * Output: (idCol, n_shingles, n_candidates, n_hits, contaminated),
    * one row per training doc; shingles are per-doc DISTINCT (the
    * [[Dedup.shingles]] contract).
    */
  def flagContaminatedBloom(train: DataFrame, eval: DataFrame,
                            idCol: String, textCol: String,
                            n: Int = 8, minHits: Int = 1,
                            numBits: Int = 1 << 20,
                            numHashes: Int = 4): DataFrame = {
    // eval shingles materialize ONCE (model-size by contract) and
    // feed both the filter build and the exact verify join — the
    // previous shape re-derived them per consumer (ADVICE r14)
    val evalShingles = eval
      .select(explode(Dedup.shingles(col(textCol), n)).as("shingle"))
      .distinct().localCheckpoint(true)
    val words = Sketches.bloomWords(
      Sketches.bloomBuild(evalShingles, col("shingle"), numBits,
        numHashes), numBits)
    val trainShingles = train
      .select(col(idCol),
        explode(Dedup.shingles(col(textCol), n)).as("shingle"))
    // the probe is a literal-array bit test INSIDE the projection
    // ([[Sketches.bloomTestLit]]) — no distinct, no probe join, no
    // re-aggregation of the train shingle stream
    val marked = trainShingles.withColumn("__hit",
      Sketches.bloomTestLit(col("shingle"), words, numBits, numHashes))
    // pass 1: per-doc totals — nothing here shuffles except the
    // map-side-combinable doc-keyed aggregation
    val perDoc = marked.groupBy(idCol).agg(
      count(lit(1)).as("n_shingles"),
      sum(when(col("__hit"), 1L).otherwise(0L)).as("n_candidates"))
    // pass 2: only the bloom survivors (~1% at production FPR) enter
    // the exact verify join. The train side is scanned TWICE on
    // purpose: fusing the passes means either persisting the exploded
    // shingle stream (≫ source bytes at 100 TB) or joining the
    // UNFILTERED stream against eval (the full-stream shuffle the
    // bloom exists to avoid once the eval side outgrows broadcast) —
    // re-reading column-pruned parquet is the cheapest of the three.
    val hits = marked.filter(col("__hit"))
      .join(evalShingles, "shingle")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits)
          .as("contaminated"))
  }
}
