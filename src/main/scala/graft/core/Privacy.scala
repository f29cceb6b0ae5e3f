package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing operators — the measurement side of the
  * data-protection stack (the scrub side is TextAnalysis.piiScrub and
  * the SnapshotTable right-to-be-forgotten lifecycle, q54/q245): before
  * a table ships to a training pipeline or an external party, audit how
  * re-identifiable its quasi-identifiers leave it.
  */
object Privacy {

  /** k-anonymity audit over a set of quasi-identifier columns (the
    * Sweeney '02 framing): a row is k-anonymous when at least k rows
    * share its full quasi-identifier combination — smaller equivalence
    * classes are linkage-attack surface. For each requested k this
    * reports how many equivalence classes and rows fall BELOW it,
    * plus the exact micro share of rows at risk and the table-wide
    * minimum class size (the table's actual anonymity level).
    *
    * NULL handling: NULL is one more quasi-identifier VALUE (grouped
    * via null-safe grouping, Spark and SQL GROUP BY semantics agree) —
    * a null birth-date still links records.
    *
    * Scale shape: ONE grouped count over the quasi-identifier key
    * (map-side combinable), then every k evaluates as conditional
    * aggregates over the class-size table (bounded by distinct QI
    * combinations, never corpus-size rows); the ks spine is a literal
    * handful of rows. No window, no join on the corpus.
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[Column],
                       ks: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(ks.nonEmpty && ks.forall(_ >= 2), "each k must be >= 2")
    val classes = df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("class_size"))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_classes"),
        sum("class_size").as("n_rows"),
        min("class_size").as("min_class_size")) ++
      ks.map(k =>
        struct(
          sum(when(col("class_size") < k, 1L).otherwise(0L))
            .as("classes_below"),
          sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
            .as("rows_at_risk")).as(s"__k$k"))
    val stats = classes.agg(aggs.head, aggs.tail: _*)
    val kRows = ks.map(k =>
      struct(lit(k.toLong).as("k"),
        col(s"__k$k.classes_below").as("classes_below"),
        col(s"__k$k.rows_at_risk").as("rows_at_risk")))
    stats
      .select(col("n_classes"), col("n_rows"), col("min_class_size"),
        explode(array(kRows: _*)).as("r"))
      .select(col("r.k").as("k"), col("n_classes"), col("n_rows"),
        col("min_class_size"), col("r.classes_below").as("classes_below"),
        col("r.rows_at_risk").as("rows_at_risk"),
        expr("r.rows_at_risk * 1000000 DIV n_rows").as("risk_share_micro"),
        (col("min_class_size") >= col("r.k")).as("satisfies_k"))
  }

  /** l-diversity audit layered on the same equivalence classes: a
    * k-anonymous class is still disclosive when everyone in it shares
    * the same SENSITIVE value (the homogeneity attack k-anonymity
    * misses). Reports, per distinct-sensitive-value count l, how many
    * classes have fewer than l distinct sensitive values and the rows
    * they contain. One (QI, sensitive) distinct-count aggregation —
    * the same one-pass posture as [[kAnonymityReport]].
    */
  def lDiversityReport(df: DataFrame, qiCols: Seq[Column],
                       sensitive: Column, ls: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(ls.nonEmpty && ls.forall(_ >= 2), "each l must be >= 2")
    val classes = df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_classes"),
        sum("class_size").as("n_rows"),
        min("n_sensitive").as("min_diversity")) ++
      ls.map(l =>
        struct(
          sum(when(col("n_sensitive") < l, 1L).otherwise(0L))
            .as("classes_below"),
          sum(when(col("n_sensitive") < l, col("class_size")).otherwise(0L))
            .as("rows_at_risk")).as(s"__l$l"))
    val stats = classes.agg(aggs.head, aggs.tail: _*)
    val lRows = ls.map(l =>
      struct(lit(l.toLong).as("l"),
        col(s"__l$l.classes_below").as("classes_below"),
        col(s"__l$l.rows_at_risk").as("rows_at_risk")))
    stats
      .select(col("n_classes"), col("n_rows"), col("min_diversity"),
        explode(array(lRows: _*)).as("r"))
      .select(col("r.l").as("l"), col("n_classes"), col("n_rows"),
        col("min_diversity"), col("r.classes_below").as("classes_below"),
        col("r.rows_at_risk").as("rows_at_risk"),
        expr("r.rows_at_risk * 1000000 DIV n_rows").as("risk_share_micro"),
        (col("min_diversity") >= col("r.l")).as("satisfies_l"))
  }

  /** Randomized response (Warner 1965) — the local-DP collection
    * mechanism: each row reports its true bit with probability
    * 1 − f and the FLIPPED bit with probability f, giving per-row
    * plausible deniability (ε = ln((1−f)/f) local differential
    * privacy); the aggregate true count is then recovered unbiasedly
    * as ĉ = (c_reported − n·f) / (1 − 2f).
    *
    * The flip decision is the portable avalanched hash draw keyed by
    * (id, seed) — the [[Sampling.ppsSample]] u-convention — so the
    * "noise" is a pure function of the row id: reproducible across
    * engines, reruns, partitionings, and replayable by the SQL oracle
    * (a production deployment would swap the keyed hash for true
    * randomness at the CLIENT; the whole point of the mechanism is
    * that the aggregation pipeline is identical either way).
    *
    * All integer: the draw lives on the 1e6 lattice, the debiased
    * estimate is one signed DIV of (c_rep·1e6 − n·f_micro)·1e6 over
    * (1e6 − 2·f_micro) — reported in count-micro units beside the
    * true count and the absolute estimation error, so the gate audits
    * the debiasing algebra, not just the flip.
    *
    * Scale shape: one codegen'd projection (hash, flip, xor) + one
    * grouped aggregation — map-side combinable, no window, no join.
    *
    * Output: (group, n, c_true, c_reported, est_micro, err_micro).
    */
  def randomizedResponse(df: DataFrame, group: Column, id: Column,
                         truth: Column, flipMicro: Long,
                         seed: Long = 42L): DataFrame = {
    require(flipMicro > 0L && flipMicro < 500000L,
      "flip rate must be in (0, 0.5) — at 0.5 the signal is gone")
    val drawn = df.select(group.as("g"), truth.as("t"),
        pmod(Sketches.mix32(TextAnalysis.rollingHash(
          concat(id.cast("string"), lit(":"), lit(seed.toString)))),
          lit(1000000L)).as("u"))
      .withColumn("flip", col("u") < lit(flipMicro))
      .withColumn("rep", col("t") =!= col("flip")) // xor
    drawn.groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(when(col("t"), 1L).otherwise(0L)).as("c_true"),
        sum(when(col("rep"), 1L).otherwise(0L)).as("c_reported"))
      .select(col("g").as("group"), col("n"), col("c_true"),
        col("c_reported"),
        expr(s"""(c_reported * 1000000L - n * ${flipMicro}L) * 1000000L
                 DIV (1000000L - 2L * ${flipMicro}L)""").as("est_micro"))
      .withColumn("err_micro", abs(col("est_micro") - col("c_true") * 1000000L))
  }
}
