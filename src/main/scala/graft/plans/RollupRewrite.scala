package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Materialized-view query rewrite: an optimizer rule that answers the
  * canonical daily-rollup aggregate from the INCREMENTALLY MAINTAINED
  * rollup table ([[graft.sources.IncrementalRollup]]) instead of
  * re-scanning the raw source — the lakehouse MV contract (Snowflake/
  * BigQuery-style transparent rewrite): the user keeps writing the
  * aggregate over raw events, the engine substitutes the O(days) view
  * for the O(rows) scan. At 100 TB this turns the daily-dashboard
  * query from a full-corpus aggregation into a metadata-sized read.
  *
  * Matching is the CacheManager principle, not ad-hoc tree surgery:
  * [[register]] captures the OPTIMIZED canonical aggregate plan over
  * the source frame, and the rule fires on `sameResult` — Spark's own
  * canonicalized plan equality (exprId/name/alias-insensitive, and
  * relation-identity aware, exactly what `df.cache()` uses to match a
  * re-read of the same files). Anything that canonicalizes
  * differently — an extra filter, a different measure, another
  * grouping — simply does not match; the rule can never fire wrongly.
  *
  * The substituted plan projects the view's (d, total_micro, n) onto
  * the aggregate's own output attributes (names and exprIds
  * preserved), so parents resolve untouched.
  *
  * STALENESS is the registrant's contract, as with every MV system:
  * register a table only while it is being maintained for that
  * source ([[graft.sources.IncrementalRollup.upsertDaily]] per
  * batch). Registrations are head-first — re-registering a source
  * shadows the older entry. The registry is process-global (it
  * outlives sessions sharing the JVM): call [[clear]] — or
  * re-register — when a source stops being maintained, exactly as
  * you would DROP a stale MV.
  *
  * Inject per session via `spark.experimental.extraOptimizations`
  * (runtime, any session — the q48 pattern) or through
  * [[GraftExtensions]].
  */
object RollupRewrite extends Rule[LogicalPlan] {

  @volatile private var entries: List[(LogicalPlan, String)] = Nil
  // re-entrancy latch: register() and the replacement build both run
  // the optimizer, which would run THIS rule. Per-THREAD, not a
  // process-global flag: concurrent optimizer runs on other threads
  // must still see the rule active, and one thread's `finally` must
  // never clear a latch another thread set mid-build.
  private val building = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Register `rollupTable` as the maintained daily rollup of
    * `source` (same tsCol/valueCol the maintainer uses). Captures the
    * canonical aggregate NOW, in the caller's session — queries match
    * when their optimized plan is result-equal to it.
    */
  def register(source: DataFrame, rollupTable: String,
               tsCol: String = "ts", valueCol: String = "value"): Unit = {
    val canonical = source
      .groupBy(to_date(col(tsCol)).as("d"))
      .agg(sum(floor(col(valueCol) * lit(1000000.0)).cast("long"))
          .as("total_micro"),
        count(lit(1)).as("n"))
    building.set(true)
    val plan = try canonical.queryExecution.optimizedPlan
      finally building.set(false)
    entries = (plan, rollupTable) :: entries
  }

  def clear(): Unit = entries = Nil

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (entries.isEmpty || building.get()) plan
    else plan.transformUp {
      case agg: Aggregate =>
        entries.find(_._1.sameResult(agg)) match {
          case Some((_, table)) =>
            val spark = SparkSession.active
            building.set(true)
            val repl =
              try graft.sources.IncrementalRollup.readDaily(spark, table)
                .queryExecution.optimizedPlan
              finally building.set(false)
            // the view's (d, total_micro, n) onto the aggregate's own
            // attributes: positional, because sameResult-equal plans
            // have result-equal output order
            Project(agg.output.zip(repl.output).map { case (o, r) =>
              Alias(r, o.name)(exprId = o.exprId)
            }, repl)
          case None => agg
        }
    }
}
