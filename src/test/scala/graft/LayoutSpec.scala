package graft

import java.nio.file.Files
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Partition pruning and bucketed-join plans — asserted at the plan
  * level, not just row counts.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy: filters on the partition column prune at the scan") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/readings"
    val (readings, _) = graft.core.EnergyIngest.ingest(spark, RefCsv)
    Layout.writePartitioned(readings, dir, Seq("Season"))
    // physical layout: one dir per season
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("Season=Spring", "Season=Winter"))
    val q = spark.read.parquet(dir).filter($"Season" === "Spring")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("Season=Spring") || plan.contains("isnotnull(Season"), plan)
    val full = readings.filter($"Season" === "Spring").count()
    assert(q.count() == full)
  }

  test("q181 star join: dims broadcast, facts meet on one shuffled key") {
    val df = SparkEntry.queries("q181_local_supplier_volume")(
      spark, Sf0001)
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 3,
      s"supplier/nation/region (and post-filter orders under AQE) " +
        s"should broadcast, got $nBroadcast:\n$plan")
    val nSmj = "SortMergeJoin".r.findAllIn(plan).length
    assert(nBroadcast + nSmj == 5, s"six tables, five joins:\n$plan")
  }

  test("bucketBy: same-bucketed join on the bucket key plans with no shuffle") {
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")
    val ev = Tables.events(spark, Sf0001).select("event_id", "user_id", "value")
    Layout.writeBucketed(ev, "ev_bucketed_a", "user_id", 8)
    Layout.writeBucketed(
      ev.groupBy("user_id").agg(sum("value").as("total")),
      "ev_bucketed_b", "user_id", 8)
    // merge hint: without it the tiny side would broadcast and hide
    // the property under test (bucketing removes the SHUFFLE, so we
    // assert no hash-partitioning exchange in the sort-merge plan)
    val joined = Layout.readTable(spark, "ev_bucketed_a")
      .join(Layout.readTable(spark, "ev_bucketed_b").hint("merge"), "user_id")
    assert(joined.count() == ev.count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
  }
}
