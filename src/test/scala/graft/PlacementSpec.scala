package graft

import graft.core.Placement
import org.apache.spark.sql.functions._

class PlacementSpec extends SparkSpec {
  import spark.implicits._

  test("rendezvous: minimal movement — every moved key lands on the NEW shard") {
    val keys = (1L to 2000L).toDF("id")
    val out = Placement.rendezvousAudit(keys, col("id"), shards = 8)
      .as[(String, Long, Long)].collect()
    val n = 2000L
    val oldCounts = out.filter(_._1 == "n").map(_._3)
    val newCounts = out.filter(_._1 == "n_plus_1")
    val moved = out.find(_._1 == "moved").get._3
    assert(oldCounts.sum == n && newCounts.map(_._3).sum == n)
    // HRW grow property: a key moves iff the new shard (id 8) wins it,
    // so moved == the new shard's population
    val newShardPop = newCounts.find(_._2 == 8L).get._3
    assert(moved == newShardPop, s"moved $moved vs shard-8 $newShardPop")
    // expectation n/9 ~ 222; generous 3-sigma-ish band
    assert(moved > 140 && moved < 320, s"moved $moved")
    // balance: no shard is pathologically loaded
    assert(oldCounts.max < 2L * oldCounts.min + 80,
      oldCounts.toSeq.toString)
  }

  test("apportion: quotas sum to the budget exactly; hand-checked remainders") {
    // weights 1, 1, 1 with budget 10: bases 3,3,3 (sum 9), shortfall
    // 1; remainders tie -> the group-id tiebreak hands the single +1
    // to 'a'
    val df = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("g", "w")
    val got = Placement.apportion(df, col("g"), col("w"), 10L)
      .select("group", "base", "extra", "quota")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3L, 1L, 4L)))
    assert(got("b") == (("b", 3L, 0L, 3L)))
    assert(got("c") == (("c", 3L, 0L, 3L)))
    // proportionality + exact sum on skewed weights
    val skew = Seq(("x", 997L), ("y", 2L), ("z", 1L)).toDF("g", "w")
    val q = Placement.apportion(skew, col("g"), col("w"), 12345L)
      .select("quota").as[Long].collect()
    assert(q.sum == 12345L)
  }

  test("apportion: weights aggregate per group; partition-invariant") {
    val rows = (1 to 100).map(i => (s"s${i % 4}", i.toLong))
    val a = Placement.apportion(rows.toDF("g", "w"), col("g"), col("w"),
      777L).collect().toSet
    val b = Placement.apportion(rows.toDF("g", "w").repartition(7),
      col("g"), col("w"), 777L).collect().toSet
    assert(a == b)
    assert(a.map(_.getLong(4)).sum == 777L)
  }
}
