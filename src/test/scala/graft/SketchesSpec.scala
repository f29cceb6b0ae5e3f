package graft

import graft.core.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min: estimates >= exact, heavy hitters have no false negatives") {
    val toks = Tables.documents(spark, Sf0001)
      .select(explode(split(trim($"text"), "\\s+")).as("tok"))
    val exact = toks.groupBy("tok").count().as[(String, Long)].collect().toMap
    val cms = Sketches.countMin(toks, "tok")
    // CMS never undercounts
    exact.foreach { case (t, c) =>
      assert(cms.estimateCount(t) >= c, s"undercount for $t")
    }
    val minCount = exact.values.toSeq.sorted.reverse.take(5).last
    val hh = Sketches.heavyHitters(toks, "tok", minCount, cms)
      .as[(String, Long)].collect().toMap
    val trueHeavy = exact.filter(_._2 >= minCount).keySet
    assert(trueHeavy.subsetOf(hh.keySet), "CMS heavy hitters missed a true one")
  }

  test("bloom: no false negatives; pre-filter keeps all joining rows") {
    val ev = Tables.events(spark, Sf0001)
    val keys = ev.filter($"event_type" === "purchase")
      .select("user_id").distinct()
    val bf = Sketches.bloom(keys, "user_id", expectedItems = 1000)
    val keySet = keys.as[Long].collect().toSet
    keySet.foreach(k => assert(bf.mightContainLong(k)))
    // the filtered fact side retains every row that would join
    val kept = Sketches.mightContain(ev, "user_id", bf)
    val joining = ev.join(keys, "user_id").count()
    assert(kept.join(keys, "user_id").count() == joining)
    assert(kept.count() <= ev.count())
  }

  test("bloom on a STRING key column filters by string hash, not a null cast") {
    val docs = Tables.documents(spark, Sf0001)
    val keys = docs.filter($"source".isin("src0", "src1")).select("source").distinct()
    val bf = Sketches.bloom(keys, "source", expectedItems = 10)
    val kept = Sketches.mightContain(docs, "source", bf)
    // every truly-matching row survives (a cast-to-long would null-drop ALL)
    val joining = docs.join(keys, "source").count()
    assert(joining > 0)
    assert(kept.join(keys, "source").count() == joining)
    intercept[IllegalArgumentException](
      Sketches.mightContain(docs.select($"n_chars".cast("double").as("d")), "d", bf))
  }

  test("approx quantiles within relative-error bound of exact percentiles") {
    val ev = Tables.events(spark, Sf0001)
    val approx = Sketches.approxQuantiles(ev, "value",
      Array(0.25, 0.5, 0.75, 0.99), relativeError = 0.01)
    val n = ev.count()
    // the GK guarantee is on RANK error (<= relativeError * n), NOT on
    // value proximity — in a heavy tail a tiny rank slip is a large
    // value gap, so check the empirical CDF at the approximate values
    approx.zip(Seq(0.25, 0.5, 0.75, 0.99)).foreach { case (v, p) =>
      val rank = ev.filter($"value" <= v).count().toDouble / n
      assert(math.abs(rank - p) <= 0.011 + 1.0 / n,
        s"quantile $p: approx value $v has empirical rank $rank")
    }
  }

  test("hll registers: merging two halves' registers == registers of " +
      "the union (the rollup algebra), estimate within 3 sigma") {
    val keys = (1 to 5000).map(i => s"key:$i").toDF("k")
    val half1 = keys.filter(length($"k") % 2 === 0)
    val half2 = keys.filter(length($"k") % 2 === 1)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df.withColumn("g", lit("all")), $"k", Seq("g"))
    val merged = regs(half1).unionByName(regs(half2))
      .groupBy("g", "bucket").agg(max("rho").as("rho"))
    val direct = regs(keys)
    assert(merged.as[(String, Long, Int)].collect().toSet ==
      direct.as[(String, Long, Int)].collect().toSet,
      "register merge must equal union-of-keys registers")
    val est = Sketches.hllEstimate(direct, Seq("g"))
      .select("hll_estimate").as[Double].head()
    // m=128 -> relative std error 1.04/sqrt(128) ~ 9.2%; allow 3 sigma
    assert(math.abs(est - 5000) / 5000 < 0.28, s"estimate $est vs 5000")
  }

  test("hll small range: linear-counting branch, deterministic " +
      "across rebuilds") {
    val keys = (1 to 20).map(i => s"user:$i").toDF("k")
      .withColumn("g", lit("all"))
    def estimate() = Sketches.hllEstimate(
      Sketches.hllRegisters(keys, $"k", Seq("g")), Seq("g"))
      .select("hll_estimate").as[Double].head()
    val e1 = estimate()
    // n << m sits under 2.5m with empty buckets -> linear counting,
    // which is tight in this regime
    assert(e1 > 10 && e1 < 35, s"linear-counting estimate $e1 vs 20")
    assert(estimate() == e1, "sketch must be bit-deterministic")
  }

  test("kmv: merge-of-parts == direct sketch; partition invariant") {
    val keys = (1 to 3000).map(i => ("g", s"key:$i")).toDF("g", "k")
    val direct = Sketches.kmvSketch(keys, $"k", Seq("g"), 64)
      .as[(String, Long)].collect().toSet
    val partA = Sketches.kmvSketch(keys.filter($"k" < "key:2"), $"k", Seq("g"), 64)
    val partB = Sketches.kmvSketch(keys.filter($"k" >= "key:2"), $"k", Seq("g"), 64)
    val merged = Sketches.kmvMerge(partA.union(partB), Seq("g"), 64)
      .as[(String, Long)].collect().toSet
    assert(merged == direct, "merge of half sketches must equal the direct sketch")
    assert(direct.size == 64)
    val shuffled = Sketches.kmvSketch(keys.repartition(13), $"k", Seq("g"), 64)
      .as[(String, Long)].collect().toSet
    assert(shuffled == direct)
  }

  test("kmv pair overlap: exact mode below k; estimates track truth above") {
    // two small sets (< k distinct) -> theta = M, everything exact
    val small = ((1 to 20).map(i => ("a", s"x:$i")) ++
      (11 to 40).map(i => ("b", s"x:$i"))).toDF("g", "k")
    val sk = Sketches.kmvSketch(small, $"k", Seq("g"), 64)
    val ex = Sketches.kmvPairOverlap(sk, "g", 64)
      .select("est_a", "est_b", "union_est", "intersect_est")
      .as[(Long, Long, Long, Long)].head()
    assert(ex == ((20L, 30L, 40L, 10L)), s"exact mode must be exact: $ex")
    // two 3000-key sets sharing 1000 keys, k = 256: estimates must
    // land near truth (fixed data + deterministic hashes -> this is a
    // fixed number, banded generously at ~4 RSE)
    val big = ((1 to 3000).map(i => ("a", s"k:$i")) ++
      (2001 to 5000).map(i => ("b", s"k:$i"))).toDF("g", "k")
    val skb = Sketches.kmvSketch(big, $"k", Seq("g"), 256)
    val est = Sketches.kmvPairOverlap(skb, "g", 256)
      .select("est_a", "est_b", "union_est", "intersect_est")
      .as[(Long, Long, Long, Long)].head()
    assert(math.abs(est._1 - 3000) < 750 && math.abs(est._2 - 3000) < 750,
      s"per-set estimates: $est")
    assert(math.abs(est._3 - 5000) < 1250, s"union estimate: $est")
    assert(math.abs(est._4 - 1000) < 500, s"intersection estimate: $est")
  }

  test("native Mix32 == the composed xorshift formulation on a value " +
      "sweep incl. negatives and nulls") {
    import org.apache.spark.sql.functions._
    val df = spark.range(-50000, 50000)
      .select(col("id"), (col("id") * 104729L + 7L).as("h0"))
      .select(when(col("id") % 997 === 0, lit(null))
        .otherwise(col("h0")).as("h"))
    val cmp = df.select(
      graft.core.Sketches.mix32TestHook(col("h")).as("a"),
      graft.core.Sketches.mix32ComposedTestHook(col("h")).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(cmp.count() == 0L)
  }
}
