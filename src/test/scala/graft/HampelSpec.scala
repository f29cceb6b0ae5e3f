package graft

import graft.core.TimeSeries
import org.apache.spark.sql.functions._

class HampelSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: centered full windows, exact order
    * statistics, the same cross-multiplied predicate.
    */
  private def brute(vals: Seq[Long], window: Int, nMad: Int)
      : Seq[(Option[Long], Option[Long], Boolean)] = {
    val half = (window - 1) / 2
    vals.indices.map { i =>
      if (i < half || i + half >= vals.size) (None, None, false)
      else {
        val arr = vals.slice(i - half, i + half + 1)
        val med = arr.sorted.apply((window + 1) / 2 - 1)
        val mad = arr.map(v => math.abs(v - med)).sorted
          .apply((window + 1) / 2 - 1)
        (Some(med), Some(mad),
          math.abs(vals(i) - med) * 10000L > nMad.toLong * 14826L * mad)
      }
    }
  }

  private def run(vals: Seq[Long], window: Int = 5, nMad: Int = 3,
                  parts: Int = 1) =
    TimeSeries.hampelDespike(
        vals.zipWithIndex.map { case (v, i) => ("k", i, v) }
          .toDF("k", "dn", "v").repartition(parts),
        "k", col("dn"), col("v"), window, nMad)
      .orderBy("d")
      .collect()
      .map(r => (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5)))
      .toSeq

  test("constant series with one spike: only the spike flags " +
      "(mad=0 flags any deviation); edges emit unjudged rows") {
    val vals = Seq(100L, 100L, 100L, 100L, 1000L, 100L, 100L, 100L, 100L)
    val got = run(vals)
    assert(got == brute(vals, 5, 3))
    assert(got(4)._3, "the spike must flag")
    assert(got.zipWithIndex.count(_._1._3) == 1, "only the spike flags")
    assert(got(0) == ((None, None, false)) && got(8) == ((None, None, false)))
  }

  test("jittered series: brute parity with nonzero mad, " +
      "threshold scales with nMad, partition invariance") {
    val vals = Seq(10L, 25L, 18L, 30L, 22L, 400L, 28L, 15L, 27L, 20L, 24L)
    val tight = run(vals, 5, 1)
    val loose = run(vals, 5, 10)
    assert(tight == brute(vals, 5, 1))
    assert(loose == brute(vals, 5, 10))
    assert(tight.count(_._3) >= loose.count(_._3))
    assert(tight(5)._3, "the 400 spike flags at nMad=1")
    assert(run(vals, 5, 3, parts = 7) == run(vals, 5, 3))
  }

  test("multi-key isolation: one key's spike never flags the other") {
    val rows = (0 until 9).flatMap { i =>
      Seq(("a", i, if (i == 4) 900L else 50L), ("b", i, 50L))
    }
    val got = TimeSeries.hampelDespike(rows.toDF("k", "dn", "v"),
        "k", col("dn"), col("v"), 5, 3)
      .filter(col("is_spike")).select("k", "d")
      .as[(String, Int)].collect().toSet
    assert(got == Set(("a", 4)))
  }
}
