package graft

import graft.core.Profile
import org.apache.spark.sql.functions._

class QuantileNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked: two equal sources converge to the global distribution") {
    // source a = {10, 20}, source b = {100, 200}; global sorted =
    // [10, 20, 100, 200], N=4, n_s=2 -> rank 1 -> pos 2, rank 2 -> pos 4
    val df = Seq((1L, "a", 10L), (2L, "a", 20L),
      (3L, "b", 100L), (4L, "b", 200L)).toDF("id", "src", "v")
    val got = Profile.quantileNormalize(df, "id", "src", "v")
      .select("id", "src_rank", "n_source", "qnorm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, 2L, 20L)))   // pos ceil(1*4/2)=2 -> 20
    assert(got(2L) == ((2L, 2L, 2L, 200L)))  // pos 4 -> 200
    assert(got(3L) == ((3L, 1L, 2L, 20L)))
    assert(got(4L) == ((4L, 2L, 2L, 200L)))
  }

  test("uneven sources: ceil positions; normalized marginals match ranks") {
    // a = {1,2,3} (n=3), b = {50} (n=1); global = [1,2,3,50], N=4
    // a: ranks 1,2,3 -> pos ceil(4/3)=2, ceil(8/3)=3, 4 -> 2,3,50
    // b: rank 1 -> pos 4 -> 50
    val df = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "b", 50L)).toDF("id", "src", "v")
    val got = Profile.quantileNormalize(df, "id", "src", "v")
      .select("id", "qnorm").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 3L, 3L -> 50L, 4L -> 50L))
  }

  test("partition-invariant; equal-size sources end up with identical multisets") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map { i =>
      val src = s"s${i % 3}"
      // source-specific scale/shift artifacts
      (i.toLong, src, (rnd.nextInt(100) * (1 + i % 3) + 1000 * (i % 3)).toLong)
    }
    val df = rows.toDF("id", "src", "v")
    val a = Profile.quantileNormalize(df, "id", "src", "v")
    val b = Profile.quantileNormalize(df.repartition(11), "id", "src", "v")
    assert(a.collect().toSet == b.collect().toSet)
    val bySrc = a.select("src", "qnorm").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(bySrc("s0") == bySrc("s1") && bySrc("s1") == bySrc("s2"))
  }
}
