package graft

import graft.core.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("reservoir: exact size, rows from input, deterministic, roughly uniform") {
    val df = spark.range(100000).selectExpr("CAST(id AS DOUBLE) AS x")
    val s1 = Sampling.reservoirDoubles(df, Seq("x"), 2000, seed = 5L)
    val s2 = Sampling.reservoirDoubles(df, Seq("x"), 2000, seed = 5L)
    assert(s1.length == 2000)
    assert(s1.map(_(0)).toSeq == s2.map(_(0)).toSeq) // deterministic
    assert(s1.forall(v => v(0) >= 0 && v(0) < 100000))
    assert(s1.map(_(0)).distinct.length > 1900) // no pathological dup
    // uniformity: sample mean within 3 sigma of population mean
    val mean = s1.map(_(0)).sum / s1.length
    val sigma = 100000.0 / math.sqrt(12.0) / math.sqrt(2000.0)
    assert(math.abs(mean - 49999.5) < 3 * sigma, s"mean $mean")
  }

  test("reservoir: n larger than input returns everything") {
    val df = spark.range(50).selectExpr("CAST(id AS DOUBLE) AS x")
    val s = Sampling.reservoirDoubles(df, Seq("x"), 200, seed = 1L)
    assert(s.map(_(0)).toSet == (0 until 50).map(_.toDouble).toSet)
  }
}
