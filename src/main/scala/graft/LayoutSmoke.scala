package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Drives the table-layout surface: partitioned write + pruned read,
  * bucketed tables + shuffle-free join. Local verification tool.
  */
object LayoutSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[8]")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_wh_smoke").toString), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("graft_layout_smoke").toString + "/ev"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("d", to_date($"ts"))
    Layout.writePartitioned(ev, dir, Seq("event_type"))
    println("[layout-smoke] partition dirs: " +
      new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted.mkString(","))
    val pruned = spark.read.parquet(dir).filter($"event_type" === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    println("[layout-smoke] pruned rows=" + pruned.count() +
      " partitionFilters=" + plan.contains("PartitionFilters"))

    Layout.writeBucketed(ev.select("event_id", "user_id", "value"), "ls_a", "user_id", 4)
    Layout.writeBucketed(ev.groupBy("user_id").agg(sum("value").as("t")), "ls_b", "user_id", 4)
    val j = Layout.readTable(spark, "ls_a").join(Layout.readTable(spark, "ls_b").hint("merge"), "user_id")
    println("[layout-smoke] bucketed join rows=" + j.count())
    val jplan = j.queryExecution.executedPlan.toString
    println("[layout-smoke] shuffle-free=" + !jplan.contains("Exchange hashpartitioning")
      + " sortMerge=" + jplan.contains("SortMergeJoin"))

    // skew: salted join vs plain join on a hot key
    val big = spark.range(200000).select(
      when($"id" < 190000, "hot").otherwise(concat(lit("k"), $"id" % 5)).as("key"),
      $"id".as("rid"))
    val small = Seq(("hot", 1.0), ("k1", 2.0)).toDF("key", "w")
    val plainN = big.join(small, "key").count()
    val saltedN = graft.core.Skew.saltedJoin(big, small, "key", $"rid", 16).count()
    println(s"[layout-smoke] salted join parity: plain=$plainN salted=$saltedN " +
      s"match=${plainN == saltedN}")

    // snapshot table: versioned commits, time travel, keyed upsert
    import graft.sources.SnapshotTable
    val st = Files.createTempDirectory("graft_snap_smoke").toString + "/readings"
    SnapshotTable.append(ev.limit(500), st)
    SnapshotTable.append(ev.limit(800).except(ev.limit(500)), st)
    SnapshotTable.upsert(spark, ev.limit(100)
      .withColumn("value", $"value" * 0), st, "event_id")
    println(s"[layout-smoke] snapshot versions=0..${SnapshotTable.currentVersion(st).get} " +
      s"latest=${SnapshotTable.read(spark, st).count()} " +
      s"v0=${SnapshotTable.read(spark, st, Some(0)).count()} " +
      s"zeroed=${SnapshotTable.read(spark, st).filter($"value" === 0).count()}")
    spark.stop()
  }
}
