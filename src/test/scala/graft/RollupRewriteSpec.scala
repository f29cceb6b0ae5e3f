package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RollupRewrite
import graft.sources.IncrementalRollup

/** Transparent MV rewrite: the canonical daily aggregate over raw
  * events is answered from the maintained rollup table — and ONLY
  * that aggregate: anything canonicalizing differently must pass
  * through untouched (the sameResult guarantee).
  */
class RollupRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def sourceDf(dir: String): DataFrame = {
    val rows = (0 until 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-03-${i % 10 + 1}%02d 0${i % 9}:15:00"), (i % 37) * 1.25)
    }
    rows.toDF("event_id", "ts", "value").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def daily(src: DataFrame): DataFrame =
    src.groupBy(to_date(col("ts")).as("d"))
      .agg(sum(floor(col("value") * lit(1000000.0)).cast("long"))
          .as("total_micro"),
        count(lit(1)).as("n"))

  private def readsPath(df: DataFrame, marker: String): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.inputFiles.exists(_.contains(marker))
          case _ => false
        }
      case _ => false
    }

  private def withRule[A](body: => A): A = {
    if (!spark.experimental.extraOptimizations.contains(RollupRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewrite
    try body
    finally {
      RollupRewrite.clear()
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RollupRewrite)
    }
  }

  test("the registered canonical aggregate is answered from the view " +
      "(plan reads the rollup, not the source) and matches exactly") {
    val base = Files.createTempDirectory("graft_mv").toString
    val srcDir = s"$base/events_src"
    val t = s"$base/rollup"
    val src = sourceDf(srcDir)
    IncrementalRollup.upsertDaily(spark, src.filter(col("event_id") % 2 === 0), t)
    IncrementalRollup.upsertDaily(spark, src.filter(col("event_id") % 2 === 1), t)
    val expected = daily(src) // no rule yet: the raw-scan answer
      .as[(java.sql.Date, Long, Long)].collect().sortBy(_._1.getTime).toSeq
    withRule {
      RollupRewrite.register(src, t)
      val q = daily(spark.read.parquet(srcDir)) // a FRESH read of the source
      assert(readsPath(q, "rollup"), "rewrite did not fire")
      assert(!readsPath(q, "events_src"), "raw source still scanned")
      val got = q.as[(java.sql.Date, Long, Long)].collect()
        .sortBy(_._1.getTime).toSeq
      assert(got == expected)
    }
  }

  test("non-matching shapes pass through: extra filter, different " +
      "measure, unregistered source") {
    val base = Files.createTempDirectory("graft_mv2").toString
    val srcDir = s"$base/events_src"
    val t = s"$base/rollup"
    val src = sourceDf(srcDir)
    IncrementalRollup.upsertDaily(spark, src, t)
    withRule {
      RollupRewrite.register(src, t)
      // filtered aggregate: the view cannot answer it — must not fire
      val filtered = src.filter(col("value") > 10)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * lit(1000000.0)).cast("long"))
            .as("total_micro"),
          count(lit(1)).as("n"))
      assert(!readsPath(filtered, "rollup"))
      // different measure — must not fire
      val avgAgg = src.groupBy(to_date(col("ts")).as("d"))
        .agg(avg(col("value")).as("m"))
      assert(!readsPath(avgAgg, "rollup"))
      // same shape over a DIFFERENT (unregistered) source — must not fire
      val otherDir = s"$base/other_src"
      (0 until 50).map(i => (i.toLong, java.sql.Timestamp.valueOf(
          "2024-04-01 10:00:00"), i * 1.0))
        .toDF("event_id", "ts", "value")
        .write.mode("overwrite").parquet(otherDir)
      assert(!readsPath(daily(spark.read.parquet(otherDir)), "rollup"))
    }
  }

  test("the session-build extension path alone fires the rewrite " +
      "(no extraOptimizations needed)") {
    // TestSession is built withExtensions(GraftExtensions), which
    // injectOptimizerRule's RollupRewrite — registry-empty for every
    // other suite, live here the moment a view registers
    val base = Files.createTempDirectory("graft_mv3").toString
    val srcDir = s"$base/events_src"
    val t = s"$base/rollup"
    val src = sourceDf(srcDir)
    IncrementalRollup.upsertDaily(spark, src, t)
    try {
      RollupRewrite.register(src, t)
      val q = daily(spark.read.parquet(srcDir))
      assert(readsPath(q, "rollup"), "extension-injected rule did not fire")
      assert(q.count() > 0)
    } finally RollupRewrite.clear()
  }
}
