package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling / data-quality report: per-column completeness,
  * cardinality and range in ONE scan. The fleet-level generalization
  * of the reference's per-row validation split (`blobToCosmos.py`'s
  * skip-and-count) — the report a 100 TB ingest runs before and after
  * every pipeline stage to catch schema drift, null storms and key
  * collisions.
  *
  * One aggregation computes 4 statistics × N columns as codegen'd
  * expressions (a per-column loop over the table would be N scans);
  * the wide single row then unpivots to the tidy (column, stat) shape
  * via a `stack`-style explode — driver never sees data, just the
  * 4×N summary.
  */
object Profile {

  /** @return one row per profiled column:
    *   (column, n_rows, n_nulls, null_frac, n_distinct, min_repr, max_repr)
    *   — min/max as canonical strings so mixed-type tables profile
    *   into one frame.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
              approxDistinct: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    // N exact countDistincts in one aggregation rewrite through one
    // Expand (N× the scan's rows into the shuffle) — fine for a
    // profile pass; at the largest scales flip `approxDistinct` and
    // the whole report collapses to one non-expanded HLL pass.
    def dist(c: String) =
      if (approxDistinct) approx_count_distinct(col(c)).as(s"__dist_$c")
      else countDistinct(col(c)).as(s"__dist_$c")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        dist(c),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        round(col(s"__nulls_$c").cast("double") / greatest(col("__n"), lit(1L)), 6)
          .as("null_frac"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_repr"),
        col(s"__max_$c").as("max_repr"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Constraint checks over a profile: each rule is (name, predicate
    * over the profile row of its column). Returns (rule, column,
    * passed, observed) — the failure report an ingest gate consumes.
    */
  final case class Check(rule: String, column: String,
                         predicate: org.apache.spark.sql.Column)

  def complete(column: String): Check =
    Check("complete", column, col("n_nulls") === 0L)
  def unique(column: String): Check =
    Check("unique", column, col("n_distinct") === col("n_rows") - col("n_nulls"))
  def nonEmpty(column: String): Check =
    Check("non_empty", column, col("n_rows") > 0L)

  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val prof = profile(df, checks.map(_.column).distinct)
    checks.map { ck =>
      prof.filter(col("column") === ck.column)
        .select(lit(ck.rule).as("rule"), col("column"),
          ck.predicate.as("passed"),
          concat_ws("/", col("n_nulls"), col("n_distinct"), col("n_rows"))
            .as("observed"))
    }.reduce(_ unionByName _)
  }
}
