package graft

import graft.core.{ScalarQuantizer, Similarity}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization: fit/encode/decode error bound, code range
  * and determinism, and asymmetric top-k recall vs the exact baseline.
  */
class ScalarQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 40 deterministic 8-dim vectors with per-dim distinct ranges
  private def vecs(n: Int = 40, dim: Int = 8) =
    (0L until n.toLong).map { i =>
      (i, Array.tabulate(dim)(d =>
        (math.sin(i * 0.7 + d * 1.3) * (d + 1)).toFloat))
    }.toDF("vec_id", "embedding")

  test("fit: per-dim min/max equal the driver-computed truth") {
    val df = vecs()
    val m = ScalarQuantizer.fit(df, dim = 8)
    val raw = df.select("embedding").as[Array[Float]].collect()
    for (d <- 0 until 8) {
      assert(m.mins(d) == raw.map(_(d).toDouble).min)
      assert(m.maxs(d) == raw.map(_(d).toDouble).max)
    }
  }

  test("encode: codes in [0,255], extremes hit the rails, decode error " +
      "bounded by half a quantization cell per dimension") {
    val df = vecs()
    val m = ScalarQuantizer.fit(df, dim = 8)
    val enc = ScalarQuantizer.encode(df, m)
    val codes = enc.select("vec_id", "codes").as[(Long, Array[Int])].collect()
    assert(codes.forall(_._2.forall(c => c >= 0 && c <= 255)))
    // each dimension's min maps to 0 and max to 255 somewhere
    for (d <- 0 until 8) {
      val cs = codes.map(_._2(d))
      assert(cs.min == 0 && cs.max == 255, s"dim $d rails $cs")
    }
    val dec = enc.select(col("vec_id"),
        ScalarQuantizer.decodeExpr(col("codes"), m).as("dv"))
      .as[(Long, Array[Double])].collect().toMap
    val raw = df.as[(Long, Array[Float])].collect().toMap
    for ((id, v) <- raw; d <- 0 until 8) {
      val cell = (m.maxs(d) - m.mins(d)) / 255.0
      assert(math.abs(dec(id)(d) - v(d)) <= cell / 2 + 1e-12,
        s"vec $id dim $d: ${dec(id)(d)} vs ${v(d)}")
    }
  }

  test("encode is deterministic (re-encode equals, model refits equal)") {
    val df = vecs()
    val m1 = ScalarQuantizer.fit(df, dim = 8)
    val m2 = ScalarQuantizer.fit(df, dim = 8)
    assert(m1.mins.sameElements(m2.mins) && m1.maxs.sameElements(m2.maxs))
    val a = ScalarQuantizer.encode(df, m1).orderBy("vec_id").collect()
    val b = ScalarQuantizer.encode(df, m2).orderBy("vec_id").collect()
    assert(a.sameElements(b))
  }

  test("adcTopK: high recall@5 vs exact cosine top-k, deterministic ranks") {
    val df = vecs(n = 60)
    val m = ScalarQuantizer.fit(df, dim = 8)
    val enc = ScalarQuantizer.encode(df, m)
    val q = df.filter(col("vec_id") < 6)
    val approx = ScalarQuantizer.adcTopK(q, enc, m, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val exact = Similarity.cosineTopK(q, df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val recalls = exact.map { case (qid, ex) =>
      approx(qid).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@5 $mean (per-query $recalls)")
    // rank column is a dense 1..5 per query
    val ranks = ScalarQuantizer.adcTopK(q, enc, m, k = 5)
      .groupBy("query_id").agg(collect_list("rank").as("r"))
      .select("r").as[Seq[Int]].collect()
    assert(ranks.forall(_.sorted == Seq(1, 2, 3, 4, 5)))
  }

  test("fit fails fast on empty input; adcTopK drops zero-norm rows " +
      "instead of emitting NaN cosines") {
    val empty = vecs(n = 0)
    val e = intercept[IllegalArgumentException](ScalarQuantizer.fit(empty, dim = 8))
    assert(e.getMessage.contains("dimension 0"))
    // corpus with one zero vector: it must never appear as a neighbor,
    // and as a query it produces no rows (cosine undefined, not NaN)
    val zero = Seq((999L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val df = vecs(n = 20).unionByName(zero)
    val m = ScalarQuantizer.fit(df, dim = 8)
    val enc = ScalarQuantizer.encode(df, m)
    val out = ScalarQuantizer.adcTopK(df.filter(col("vec_id").isin(0L, 999L)),
      enc, m, k = 5)
    val byQ = out.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1)
    assert(!byQ.contains(999L), "zero-norm query must yield no rows")
    assert(byQ(0L).forall(_._2 != 999L), "zero-norm neighbor must be dropped")
    assert(out.filter(col("cosine").isNaN).count() == 0)
  }
}
