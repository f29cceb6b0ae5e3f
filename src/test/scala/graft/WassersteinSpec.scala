package graft

import graft.core.Profile
import org.apache.spark.sql.functions._

class WassersteinSpec extends SparkSpec {
  import spark.implicits._

  private def w1(rows: Seq[(String, Long, Boolean)]) =
    Profile.wasserstein1(rows.toDF("g", "v", "a"),
      "g", col("v"), col("a"))
      .select("g", "n_a", "n_b", "w1_num", "w1_cents", "w1_frac_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("hand-checked: point masses distance apart") {
    // arm a all at 0, arm b all at 7 -> W1 = 7 exactly
    val got = w1(Seq(("g", 0L, true), ("g", 0L, true),
      ("g", 7L, false), ("g", 7L, false)))
    val (_, na, nb, num, cents, frac) = got("g")
    assert(na == 2 && nb == 2)
    assert(num == 7L * 2 * 2 && cents == 7L && frac == 0L)
  }

  test("hand-checked: half the mass moves, fractional result") {
    // a = {0, 0}, b = {0, 3}: W1 = 3/2 -> 1 cent + 500000 micro
    val got = w1(Seq(("g", 0L, true), ("g", 0L, true),
      ("g", 0L, false), ("g", 3L, false)))
    val (_, _, _, num, cents, frac) = got("g")
    // lattice: v=0: |2*2 - 1*2| = 2, gap 3 -> 6; v=3 gap 0
    assert(num == 6L && cents == 1L && frac == 500000L)
  }

  test("identical distributions -> zero; empty arm drops; shift metric") {
    val same = w1(Seq(("g", 1L, true), ("g", 5L, true),
      ("g", 1L, false), ("g", 5L, false)))
    assert(same("g")._4 == 0L)
    val onearm = w1(Seq(("g", 1L, true), ("g", 2L, true)))
    assert(!onearm.contains("g"))
    // translation by d moves W1 by exactly d: {0,10} vs {4,14} -> 4
    val shift = w1(Seq(("g", 0L, true), ("g", 10L, true),
      ("g", 4L, false), ("g", 14L, false)))
    assert(shift("g")._5 == 4L && shift("g")._6 == 0L)
  }

  test("partition-invariant and matches a brute-force quantile coupling") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map(i => ("t", rnd.nextInt(100).toLong, i % 2 == 0))
    val got = w1(rows)("t")
    // equal arm sizes: W1 = (1/n) * sum |sorted_a(i) - sorted_b(i)|
    val sa = rows.filter(_._3).map(_._2).sorted
    val sb = rows.filterNot(_._3).map(_._2).sorted
    val exactNum = sa.zip(sb).map { case (x, y) => math.abs(x - y) }.sum
    assert(got._4 == exactNum * sa.length) // num = n_a*n_b*W1, n_a=n_b
    val re = Profile.wasserstein1(rows.toDF("g", "v", "a").repartition(13),
        "g", col("v"), col("a"))
      .select("g", "n_a", "n_b", "w1_num", "w1_cents", "w1_frac_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(re == got)
  }
}
