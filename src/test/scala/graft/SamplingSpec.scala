package graft

import graft.core.Sampling
import org.apache.spark.sql.functions._

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

  test("tokenBudgetSelect: prefix semantics, no back-fill, partition-invariant") {
    // priority order: 30 (5 tok), 20 (4 tok), 10 (3 tok), 5 (1 tok)
    val counted = Seq(
      (1L, 5L, 30L), (2L, 4L, 20L), (3L, 3L, 10L), (4L, 1L, 5L))
      .toDF("doc_id", "n_tokens", "prio")
    // budget 9 → docs 1+2 (cum 5, 9); doc 3 overflows at 12, and the
    // 1-token doc 4 would FIT but is cut by prefix semantics
    val got = Sampling.tokenBudgetSelect(counted, "doc_id", "prio", 9L)
      .select("doc_id", "tok_start", "tok_end")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 5L), (2L, 5L, 9L)))
    val repart = Sampling.tokenBudgetSelect(
        counted.repartition(7), "doc_id", "prio", 9L)
      .select("doc_id", "tok_start", "tok_end")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(repart == got)
  }

  test("tokenBudgetSelect: equal priorities order by id; budget >= total keeps all") {
    val counted = Seq((9L, 2L, 1L), (3L, 2L, 1L), (6L, 2L, 1L))
      .toDF("doc_id", "n_tokens", "prio")
    val got = Sampling.tokenBudgetSelect(counted, "doc_id", "prio", 100L)
      .select("doc_id", "tok_start", "tok_end")
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((3L, 0L, 2L), (6L, 2L, 4L), (9L, 4L, 6L)))
  }

  test("reservoir: n larger than input returns everything") {
    val df = spark.range(50).selectExpr("CAST(id AS DOUBLE) AS x")
    val s = Sampling.reservoirDoubles(df, Seq("x"), 200, seed = 1L)
    assert(s.map(_(0)).toSet == (0 until 50).map(_.toDouble).toSet)
  }

  test("rankEnsemble: ranks match a window replay, rank space " +
      "neutralizes a hot raw signal, blend is the exact rank sum") {
    import org.apache.spark.sql.expressions.Window
    // s_hot has one enormous outlier; s_even is well-behaved. A raw
    // score sum would let the outlier dominate; rank blending cannot.
    val rows = Seq(
      (1L, 1000000L, 10L), (2L, 5L, 30L), (3L, 4L, 20L), (4L, 3L, 40L))
    val df = rows.toDF("doc_id", "s_hot", "s_even").repartition(3)
    val got = Sampling.rankEnsemble(df, "doc_id", Seq("s_hot", "s_even"))
      .select("doc_id", "rank_s_hot", "rank_s_even", "blend_rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val replay = rows.toDF("doc_id", "s_hot", "s_even")
      .withColumn("rank_s_hot", row_number().over(
        Window.orderBy(col("s_hot").desc, col("doc_id"))).cast("long"))
      .withColumn("rank_s_even", row_number().over(
        Window.orderBy(col("s_even").desc, col("doc_id"))).cast("long"))
      .withColumn("blend_rank", col("rank_s_hot") + col("rank_s_even"))
      .select("doc_id", "rank_s_hot", "rank_s_even", "blend_rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == replay)
    val byBlend = got.sortBy(r => (r._4, r._1)).map(_._1)
    // doc 1's outlier buys it exactly ONE rank point of advantage:
    // doc 2 (2nd on hot, 2nd on even) beats it overall
    assert(byBlend.head == 2L, s"expected doc 2 best, got $byBlend")
    got.foreach { case (_, rh, re, b) => assert(b == rh + re) }
  }

  test("weightedSample: weight 1e6 keeps all, 0 keeps none, the kept " +
      "rate tracks the weight, epochs rotate the kept set") {
    val df = (0L until 2000L).map((_, 0L)).toDF("doc_id", "w")
    def kept(weight: Long, epoch: Int): Set[Long] =
      Sampling.weightedSample(
          df.withColumn("w", lit(weight)), "doc_id", "w", epoch)
        .select("doc_id").as[Long].collect().toSet
    assert(kept(1000000L, 0).size == 2000)
    assert(kept(0L, 0).isEmpty)
    // ~1/4 weight keeps roughly a quarter (hash-uniformity, loose)
    val quarter = kept(250000L, 0)
    assert(quarter.size > 350 && quarter.size < 650, s"${quarter.size}")
    // deterministic per epoch, different across epochs
    assert(kept(250000L, 0) == quarter)
    val e1 = kept(250000L, 1)
    assert(e1 != quarter, "epoch must rotate the kept set")
    assert(e1.size > 350 && e1.size < 650)
  }

  test("kPerGroup: exact size, deterministic, seed rotates the sample") {
    val df = (0L until 1000L).map(i => (s"g${i % 4}", i)).toDF("g", "id")
    val s1 = Sampling.kPerGroup(df, "g", "id", k = 5, seed = 42L)
      .select("g", "id").as[(String, Long)].collect().toSeq
    assert(s1.groupBy(_._1).forall(_._2.size == 5) && s1.size == 20)
    val s2 = Sampling.kPerGroup(df.repartition(9), "g", "id", 5, 42L)
      .select("g", "id").as[(String, Long)].collect().toSeq
    assert(s1.toSet == s2.toSet) // pure function of the data
    val other = Sampling.kPerGroup(df, "g", "id", 5, 43L)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(other != s1.toSet) // a new seed redraws
    // undersized group: min(k, n) rows
    val tiny = Seq(("t", 1L), ("t", 2L)).toDF("g", "id")
    assert(Sampling.kPerGroup(tiny, "g", "id", 5, 42L).count() == 2L)
  }

  test("preferencePairs: best-with-worst, margins, small-group drop") {
    // group a: 8 docs, scores 80..10 -> 2 pairs (80,10), (70,20);
    // group b: 3 docs -> 3 DIV 4 = 0 pairs
    val df = ((1L to 8L).map(i => ("a", i, (90L - 10L * i) * 1000)) ++
      Seq(("b", 1L, 5000L), ("b", 2L, 4000L), ("b", 3L, 3000L)))
      .toDF("src", "doc_id", "s")
    val got = Sampling.preferencePairs(df, "src", "s", "doc_id", 4)
      .select("src", "pair_rank", "chosen_id", "rejected_id", "margin_micro")
      .as[(String, Int, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("a", 1, 1L, 8L, 70000L),   // 80k vs 10k
      ("a", 2, 2L, 7L, 50000L)))  // 70k vs 20k
    // score ties break to the LOWER id as better
    val tied = Seq(("t", 1L, 9L), ("t", 2L, 9L), ("t", 3L, 1L),
      ("t", 4L, 0L)).toDF("src", "doc_id", "s")
    val p = Sampling.preferencePairs(tied, "src", "s", "doc_id", 4)
      .select("chosen_id", "rejected_id").as[(Long, Long)].head()
    assert(p == ((1L, 4L)))
  }

  test("curriculumPhases: integer phase identity, partition invariance") {
    val df = (1L to 10L).map(i => (i, 1000L - i)).toDF("doc_id", "s")
    // order s desc => rank = doc_id; phase = (rank-1)*4 DIV 10
    val got = Sampling.curriculumPhases(df, "doc_id",
        Seq(col("s").desc, col("doc_id").asc), 4)
      .select("doc_id", "rank", "phase")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) == (1L to 10L))
    assert(got.map(_._3) == Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L))
    val repart = Sampling.curriculumPhases(df.repartition(7), "doc_id",
        Seq(col("s").desc, col("doc_id").asc), 4)
      .select("doc_id", "rank", "phase")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(repart == got)
  }

  test("oversampleBalance: every class lands in [n_max, 2*n_max), " +
      "clones marked, originals conserved") {
    // labels with 100 / 30 / 7 rows
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 130).map(i => (i.toLong, "mid")) ++
      (131 to 137).map(i => (i.toLong, "tiny"))).toDF("id", "label")
    val bal = Sampling.oversampleBalance(df, "label")
    val census = bal.groupBy("label")
      .agg(count(lit(1)).as("n"), countDistinct($"id").as("orig"),
        max("copy_idx").as("mx"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(census("big") == (("big", 100L, 100L, 0L)))
    // 30 * ceil(100/30)=30*4=120; 7 * ceil(100/7)=7*15=105
    assert(census("mid") == (("mid", 120L, 30L, 3L)))
    assert(census("tiny") == (("tiny", 105L, 7L, 14L)))
    census.values.foreach { case (_, n, _, _) =>
      assert(n >= 100L && n < 200L, s"balanced size out of band: $n")
    }
  }

  test("stratifiedFolds: per-(label, fold) counts differ by <= 1; " +
      "seeded and partition invariant") {
    val df = ((1 to 23).map(i => (i.toLong, "a")) ++
      (24 to 40).map(i => (i.toLong, "b"))).toDF("id", "label")
    val folds = Sampling.stratifiedFolds(df, "label", "id", k = 4)
      .select("label", "fold", "id")
      .as[(String, Long, Long)].collect().toSeq
    val byCell = folds.groupBy(r => (r._1, r._2)).view.mapValues(_.size)
    Seq("a", "b").foreach { l =>
      val sizes = (0L until 4L).map(f => byCell.getOrElse((l, f), 0))
      assert(sizes.max - sizes.min <= 1, s"$l: $sizes")
    }
    // pure function of (id, seed): partition invariance
    val again = Sampling.stratifiedFolds(df.repartition(5), "label", "id", 4)
      .select("label", "fold", "id")
      .as[(String, Long, Long)].collect().toSeq
    assert(again.toSet == folds.toSet)
    // a different seed reshuffles assignments
    val other = Sampling.stratifiedFolds(df, "label", "id", 4, seed = 7L)
      .select("label", "fold", "id")
      .as[(String, Long, Long)].collect().toSeq
    assert(other.toSet != folds.toSet, "seed must matter")
  }

  test("ppsSample: fixed n per stratum, clean schema, deterministic") {
    val df = spark.range(200).selectExpr(
      "CAST(id % 4 AS STRING) AS src", "id",
      "CAST(1 + id % 50 AS BIGINT) AS tokens")
    val out = Sampling.ppsSample(df, "src", "id", "tokens", n = 10)
    // no helper columns leak into the caller's schema
    assert(out.columns.toSeq == df.columns.toSeq)
    val perStratum = out.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(perStratum.values.toSet == Set(10L))
    // pure function of (id, seed): same call -> same rows
    val again = Sampling.ppsSample(df, "src", "id", "tokens", n = 10)
    assert(again.select("id").as[Long].collect().sorted.toSeq ==
      out.select("id").as[Long].collect().sorted.toSeq)
    // different seed -> different draw
    val other = Sampling.ppsSample(df, "src", "id", "tokens", n = 10,
      seed = 7L)
    assert(other.select("id").as[Long].collect().toSet !=
      out.select("id").as[Long].collect().toSet)
  }

  test("ppsSample: n >= stratum size keeps the whole stratum; " +
    "size bias holds in aggregate") {
    val df = spark.range(30).selectExpr(
      "CAST(id % 10 AS STRING) AS src", "id", "CAST(id + 1 AS BIGINT) AS w")
    val all = Sampling.ppsSample(df, "src", "id", "w", n = 5)
    assert(all.count() == 30L)
    // PPS bias: with sizes 1 vs 1000 in one stratum, across many ids
    // the big-size rows must dominate the kept set
    val skew = spark.range(400).selectExpr(
      "'s' AS src", "id",
      "CAST(CASE WHEN id % 2 = 0 THEN 1000 ELSE 1 END AS BIGINT) AS w")
    val kept = Sampling.ppsSample(skew, "src", "id", "w", n = 40)
      .selectExpr("sum(CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END)")
      .as[Long].head()
    assert(kept >= 35L, s"expected heavy rows to dominate, got $kept/40")
  }

  test("ppsSample: non-positive size fails loudly") {
    val df = spark.range(5).selectExpr(
      "'s' AS src", "id", "CAST(id AS BIGINT) AS w") // id 0 -> size 0
    val ex = intercept[Exception] {
      Sampling.ppsSample(df, "src", "id", "w", n = 2).collect()
    }
    assert(ex.getMessage != null)
  }

  test("kCenterSelect: hand-checked greedy on the line, min-id ties") {
    // points on a line (padded to 2 dims): greedy from min id 1 at 0,
    // then the farthest (id 5 at 20), then id 2 at 10 (dist^2 100 to
    // both chosen beats id 3's 25 and id 4's 1)
    val emb = Seq(
      (1L, Array(0f, 0f)), (2L, Array(10f, 0f)), (3L, Array(5f, 0f)),
      (4L, Array(0f, 1f)), (5L, Array(20f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Sampling.kCenterSelect(emb, "vec_id", "embedding", k = 3)
      .select("step", "vec_id", "sel_dist")
      .as[(Long, Long, Long)].collect().toSeq
    val M = 1000000L
    assert(got == Seq(
      (1L, 1L, 0L),
      (2L, 5L, 400L * M * M),
      (3L, 2L, 100L * M * M)))
    // tie at equal distance -> smallest id: ids 10/11 both at dist^2 1
    val tie = Seq((1L, Array(0f)), (10L, Array(1f)), (11L, Array(-1f)))
      .toDF("vec_id", "embedding")
    val t = Sampling.kCenterSelect(tie, "vec_id", "embedding", k = 2)
      .select("step", "vec_id").as[(Long, Long)].collect().toSeq
    assert(t == Seq((1L, 1L), (2L, 10L)))
  }

  test("kCenterAssign: nearest-center census, equidistant ties to the " +
    "earliest step") {
    val emb = Seq(
      (1L, Array(0f, 0f)), (2L, Array(10f, 0f)), (3L, Array(5f, 0f)),
      (4L, Array(0f, 1f)), (5L, Array(20f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Sampling.kCenterAssign(emb, "vec_id", "embedding", k = 3)
      .select("step", "center_id", "n_assigned", "max_dist", "sum_dist")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val T = 1000000000000L // micro^2 per unit distance^2
    // centers: step1=id1@0, step2=id5@20, step3=id2@10. id3@5 is
    // equidistant (25) to centers 1 and 2 -> earliest step (1) wins;
    // id4 -> center 1 at distance 1
    assert(got == Seq(
      (1L, 1L, 3L, 25L * T, 26L * T),
      (2L, 5L, 1L, 0L, 0L),
      (3L, 2L, 1L, 0L, 0L)))
  }
}
