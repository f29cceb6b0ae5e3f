package graft

import graft.core.Eval
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc: perfect separation = 1.0, reversed = 0.0") {
    val df = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    val auc = Eval.rocAuc(df, col("s"), col("y"))
      .select("n_pos", "n_neg", "auc_micro")
      .as[(Long, Long, Long)].head()
    assert(auc == ((2L, 2L, 1000000L)))
    val rev = Eval.rocAuc(df, -col("s"), col("y"))
      .select("auc_micro").as[Long].head()
    assert(rev == 0L)
  }

  test("rocAuc: tied pairs count half") {
    // pos scores {1, 2}, neg {1}: (1,1) tied = 1/2, (2,1) concordant
    // = 1 -> AUC = 1.5/2 = 0.75
    val df = Seq((1L, true), (1L, false), (2L, true)).toDF("s", "y")
    val auc = Eval.rocAuc(df, col("s"), col("y"))
      .select("auc_micro").as[Long].head()
    assert(auc == 750000L)
    // random-classifier midpoint: all scores tied -> 0.5 exactly
    val flat = Seq((7L, true), (7L, false), (7L, true), (7L, false))
      .toDF("s", "y")
    assert(Eval.rocAuc(flat, col("s"), col("y"))
      .select("auc_micro").as[Long].head() == 500000L)
  }

  test("rocAuc: partition invariant") {
    val df = spark.range(1000).selectExpr(
      "CAST(id % 97 AS BIGINT) AS s", "id % 3 = 0 AS y")
    val a = Eval.rocAuc(df, col("s"), col("y"))
      .select("auc_micro").as[Long].head()
    val b = Eval.rocAuc(df.repartition(13), col("s"), col("y"))
      .select("auc_micro").as[Long].head()
    assert(a == b)
  }

  test("rocAuc: single-class input yields NULL auc, not div-by-zero") {
    val allPos = Seq((1L, true), (2L, true)).toDF("s", "y")
    val r = Eval.rocAuc(allPos, col("s"), col("y"))
      .select("n_pos", "n_neg", "auc_micro").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
    val allNeg = Seq((1L, false), (2L, false)).toDF("s", "y")
    assert(Eval.rocAuc(allNeg, col("s"), col("y"))
      .select("auc_micro").head().isNullAt(0))
  }

  test("calibrationBins: out-of-range scores clamp into the edge bins " +
      "on BOTH sides") {
    // range [10, 20) micro, 5 bins: s=3 (below lo) -> bin 0,
    // s=25 (above hi) -> bin 4; no negative or >4 bin ids ever
    val df = Seq((3L, true), (11L, false), (25L, false)).toDF("s", "y")
    val got = Eval.calibrationBins(df, col("s"), col("y"), 10L, 20L, 5)
      .select("bin", "n_docs", "n_pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 2L, 1L), (4L, 1L, 0L)))
  }

  test("calibrationBins: hand-built cells, top edge folds into last bin") {
    // range [0, 10) micro, 5 bins of width 2
    val df = Seq((0L, false), (1L, true), (2L, true), (9L, true),
      (10L, true)).toDF("s", "y")
    val got = Eval.calibrationBins(df, col("s"), col("y"), 0L, 10L, 5)
      .select("bin", "n_docs", "n_pos", "pos_rate_micro", "sum_score_micro")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 500000L, 1L),   // s=0 (neg), s=1 (pos)
      (1L, 1L, 1L, 1000000L, 2L),  // s=2
      (4L, 2L, 2L, 1000000L, 19L)  // s=9 and the edge s=10 clamped
    ))
  }

  test("confusion: cells, gold totals and exact shares") {
    val df = Seq(("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de")).toDF("g", "p")
    val got = Eval.confusion(df, col("g"), col("p"))
      .select("gold", "pred", "n_docs", "gold_total", "share_micro")
      .as[(String, String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("de", "de", 1L, 1L, 1000000L),
      ("en", "de", 1L, 3L, 333333L),
      ("en", "en", 2L, 3L, 666666L)))
  }

  test("cohenKappa: hand-computed 2x2 and degenerate cases") {
    // n=10: gold en=6/de=4; pred en=5/de=5; agree = 4 (en) + 3 (de) = 7
    // chance = 6*5 + 4*5 = 50; kappa = (10*7 - 50)/(100 - 50) = 0.4
    val rows =
      Seq.fill(4)(("en", "en")) ++ Seq.fill(2)(("en", "de")) ++
      Seq.fill(1)(("de", "en")) ++ Seq.fill(3)(("de", "de"))
    val got = Eval.cohenKappa(rows.toDF("g", "p"), col("g"), col("p"))
      .select("n_docs", "n_agree", "chance_pairs", "kappa_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((10L, 7L, 50L, 400000L)))
    // perfect agreement = 1.0 regardless of marginals
    val perfect = Seq(("a", "a"), ("b", "b"), ("b", "b")).toDF("g", "p")
    assert(Eval.cohenKappa(perfect, col("g"), col("p"))
      .select("kappa_micro").as[Long].head() == 1000000L)
  }

  test("twoProportionZ: hand case, arm filter, degenerate NULLs") {
    // 60/100 vs 40/100: pooled p = .5, se = sqrt(.25 * .02) ->
    // z = .2/.070711 = 2.828427 (pinned vs an independent python calc)
    val df = (Seq.fill(60)(("a", true)) ++ Seq.fill(40)(("a", false)) ++
      Seq.fill(40)(("b", true)) ++ Seq.fill(60)(("b", false)) ++
      Seq.fill(5)(("holdout", true))) // third arm must be ignored
      .toDF("arm", "y")
    val got = Eval.twoProportionZ(df, col("arm"), col("y"), "a", "b")
      .select("n_a", "x_a", "n_b", "x_b", "z", "significant")
      .as[(Long, Long, Long, Long, Double, Boolean)].head()
    assert(got == ((100L, 60L, 100L, 40L, 2.828427, true)))
    // all-success pooled p = 1 leaves the z undefined -> explicit NULL
    val allWin = Seq(("a", true), ("b", true)).toDF("arm", "y")
    val r = Eval.twoProportionZ(allWin, col("arm"), col("y"), "a", "b")
      .select(col("z").isNull, col("significant")).as[(Boolean, Boolean)].head()
    assert(r == ((true, false)))
    // an empty arm likewise
    val oneArm = Seq(("a", true), ("a", false)).toDF("arm", "y")
    assert(Eval.twoProportionZ(oneArm, col("arm"), col("y"), "a", "b")
      .select(col("z").isNull).as[Boolean].head())
  }

  test("twoProportionZ: symmetric arms give z = 0, not significant") {
    val df = (Seq.fill(30)(("a", true)) ++ Seq.fill(70)(("a", false)) ++
      Seq.fill(30)(("b", true)) ++ Seq.fill(70)(("b", false))).toDF("arm", "y")
    val got = Eval.twoProportionZ(df, col("arm"), col("y"), "a", "b")
      .select("z", "significant").as[(Double, Boolean)].head()
    assert(got == ((0.0, false)))
  }

  test("bootstrapCi: point inside CI, replicates vary, partition invariant") {
    val df = spark.range(2000).selectExpr("CAST(id AS STRING) AS id",
      "CAST(100 + id % 50 AS BIGINT) AS v")
    val got = Eval.bootstrapCi(df, col("id"), col("v"), b = 200)
      .select("n_rows", "point_mean_cents", "n_replicates",
        "ci_lo_cents", "ci_hi_cents")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got._1 == 2000L && got._3 == 200L)
    assert(got._4 <= got._2 && got._2 <= got._5,
      s"point ${got._2} inside [${got._4}, ${got._5}]")
    // true mean = 100 + 24.5 = 124.5 -> 124 on the integer lattice;
    // a correct bootstrap of n=2000 traps it tightly
    assert(got._4 >= 120L && got._5 <= 129L, s"CI too wide: $got")
    assert(got._4 < got._5, "replicates must VARY (the q159 affine-" +
      "correlation bug would collapse the interval)")
    val again = Eval.bootstrapCi(df.repartition(17), col("id"), col("v"), b = 200)
      .select("ci_lo_cents", "ci_hi_cents").as[(Long, Long)].head()
    assert(again == ((got._4, got._5)))
  }

  test("cuped: a perfect covariate removes all variance and equalizes arms") {
    // y == x exactly: theta = 1, every arm's adjusted mean collapses
    // to the POOLED mean, var_reduction = 1
    val df = (1 to 50).map(i => (if (i % 2 == 0) "a" else "b",
      (i * 7 % 31).toLong)).toDF("arm", "x")
      .withColumn("y", col("x"))
    val got = Eval.cuped(df, col("arm"), col("x"), col("y"), "a", "b")
      .select("arm", "mean_y_adj", "var_reduction")
      .as[(String, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.size == 2)
    assert(got(0)._2 == got(1)._2, s"adjusted means must collapse: $got")
    assert(got.forall(_._3 == 1.0), s"perfect covariate: $got")
    // an all-constant covariate must not divide by zero silently:
    // theta's denominator is 0 -> NaN/NULL surfaces, not a wrong number
    val flat = df.withColumn("x", lit(5L))
    val adj = Eval.cuped(flat, col("arm"), col("x"), col("y"), "a", "b")
      .select("mean_y_adj").as[Option[Double]].collect()
    assert(adj.forall(v => v.isEmpty || v.exists(_.isNaN)),
      s"zero-variance covariate must surface, got $adj")
  }

  test("liftTable: hand deciles, conservation, final lift = 1") {
    // 10 docs, scores 10..1, top-5 scores are the positives
    val df = (1 to 10).map(i => (s"d$i", (11 - i) * 1000L, i <= 5))
      .toDF("doc_id", "s", "y")
    val got = Eval.liftTable(df, "doc_id", col("s"), col("y"), nBuckets = 10)
      .select("bucket", "n_docs", "n_pos", "rate_micro", "cum_lift_micro")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.size == 10 && got.forall(_._2 == 1L))
    assert(got.take(5).forall(r => r._3 == 1L && r._4 == 1000000L))
    assert(got.drop(5).forall(r => r._3 == 0L && r._4 == 0L))
    // top decile lift = (1/1)/(5/10) = 2x; full-corpus lift = exactly 1
    assert(got.head._5 == 2000000L && got.last._5 == 1000000L)
    assert(got.map(_._3).sum == 5L, "positives conserved across cells")
  }

  test("rocAucBy: per-group AUC, NULL on single-class groups") {
    // g1: perfect separation (AUC 1.0); g2: perfectly inverted (0.0);
    // g3: all-positive (undefined -> NULL)
    val rows =
      Seq(("g1", 10L, true), ("g1", 9L, true), ("g1", 2L, false),
          ("g1", 1L, false),
          ("g2", 10L, false), ("g2", 9L, false), ("g2", 2L, true),
          ("g2", 1L, true),
          ("g3", 5L, true), ("g3", 6L, true))
        .toDF("g", "s", "y")
    val got = Eval.rocAucBy(rows, col("g"), col("s"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got("g1") == 1000000L && got("g2") == 0L && got("g3") == -1L,
      s"$got")
    // slices must agree with the global operator run per slice
    val solo = Eval.rocAuc(rows.filter($"g" === "g1"), col("s"), col("y"))
      .select("auc_micro").as[Long].head()
    assert(solo == got("g1"))
  }

  test("anovaF: hand-checked F, degenerate guards") {
    // A = {0, 0} cents, B = {190, 210}: means 0 and 2 dollars, grand 1,
    // SSB = 2*1 + 2*1 = 4; SSW = 0.1^2 + 0.1^2 = 0.02;
    // F = (4/1) / (0.02/2) = 400
    val df = Seq(("A", 0L), ("A", 0L), ("B", 190L), ("B", 210L))
      .toDF("g", "vc")
    val got = Eval.anovaF(df, col("g"), col("vc"))
      .select("n_groups", "n_rows", "ssb_micro", "ssw_micro", "f_value")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got._1 == 2L && got._2 == 4L)
    assert(got._3 == 4000000L && got._4 == 20000L, s"$got")
    assert(got._5 == 400.0, s"$got")
    // zero within-group variance: F undefined -> NULL, not a div blow-up
    val degen = Seq(("A", 0L), ("A", 0L), ("B", 200L), ("B", 200L))
      .toDF("g", "vc")
    assert(Eval.anovaF(degen, col("g"), col("vc"))
      .select("f_value").head().isNullAt(0))
    // one group: NULL as well
    val one = Seq(("A", 1L), ("A", 5L)).toDF("g", "vc")
    assert(Eval.anovaF(one, col("g"), col("vc"))
      .select("f_value").head().isNullAt(0))
  }

  test("diffInDiff: hand-checked estimate + SE, empty-cell guard") {
    // control +100 cents pre->post, treated +300: DiD = +200 cents
    val df = Seq(
      (0, 0, 100L), (0, 0, 200L), (0, 1, 200L), (0, 1, 300L),
      (1, 0, 100L), (1, 0, 300L), (1, 1, 400L), (1, 1, 600L))
      .toDF("t", "p", "vc")
    val got = Eval.diffInDiff(df, col("t") === 1, col("p") === 1, col("vc"))
      .select("did_micro", "se_micro").as[(Long, Long)].head()
    assert(got._1 == 2000000L, s"$got") // 2 dollars
    // SE = sqrt(2500 + 2500 + 10000 + 10000) = 158.11388 cents
    assert(got._2 == 1581139L, s"$got")
    // a missing cell nulls the estimate instead of dividing by zero
    val noCell = df.filter(!(col("t") === 1 && col("p") === 1))
    assert(Eval.diffInDiff(noCell, col("t") === 1, col("p") === 1,
      col("vc")).select("did_micro").head().isNullAt(0))
  }

  test("mutualInformation: ln2 on perfect dependence, 0 on independence") {
    val dep = Seq(("a", 0), ("a", 0), ("b", 1), ("b", 1)).toDF("x", "y")
    val g1 = Eval.mutualInformation(dep, col("x"), col("y"))
      .as[(Long, Long, Long)].head()
    // MI = ln 2 = 0.693147...; two cells of 0.5*ln2 micro-rounded
    assert(g1 == ((4L, 2L, 693148L)), s"$g1")
    val ind = Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1)).toDF("x", "y")
    val g2 = Eval.mutualInformation(ind, col("x"), col("y"))
      .as[(Long, Long, Long)].head()
    assert(g2 == ((4L, 4L, 0L)), s"$g2")
  }

  test("chiSquare: hand value on a 2x2, zero cell contributes E, " +
      "degenerate grid nulls") {
    // 2x2 with counts [[30,10],[10,30]]: E=20 everywhere, chi2 =
    // 4*(10^2/20) = 20; V = sqrt(20/80) = 0.5
    val rows = Seq.fill(30)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(10)(("b", 0)) ++ Seq.fill(30)(("b", 1))
    val g = Eval.chiSquare(rows.toDF("x", "y"), col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(g == ((80L, 2L, 2L, 1L, 20000000L, 0.5)), s"$g")
    // zero cell: ("b",1) absent -> O=0 contributes E -> chi2 > 0
    val zc = Seq(("a", 0), ("a", 1), ("b", 0)).toDF("x", "y")
    val g2 = Eval.chiSquare(zc, col("x"), col("y")).count() // one row out
    assert(g2 == 1L)
    val chi2z = Eval.chiSquare(zc, col("x"), col("y"))
      .select("chi2_micro").as[Long].head()
    // chi2 = 3*(1*... ) = 0.75 exactly for this table
    assert(chi2z == 750000L, s"$chi2z")
    // single column -> dof 0 -> NULL chi2 and V
    val degen = Seq(("a", 0), ("a", 1)).toDF("x", "y")
    assert(Eval.chiSquare(degen, col("x"), col("y"))
      .select("chi2_micro").head().isNullAt(0))
  }

  test("sprt: crosses h1 at the first boundary hit; balanced stream " +
      "continues; constants replay") {
    // p0=0.25 vs p1=0.75: incS = ln(3) = +1.0986, incF = -1.0986;
    // bounds at alpha=beta=0.05: +-ln(19) = +-2.9444 -> three
    // successes in a row cross h1 (3*1.0986 = 3.296 > 2.944)
    val rows = Seq(
      ("up", 1L, true), ("up", 2L, true), ("up", 3L, true),
      ("up", 4L, false),
      ("flat", 1L, true), ("flat", 2L, false),
      ("flat", 3L, true), ("flat", 4L, false))
      .toDF("k", "i", "s")
    val got = Eval.sprt(rows, col("k"), Seq(col("i")), col("s"),
        p0 = 0.25, p1 = 0.75)
      .select("key", "n_obs", "n_success", "decision", "n_at_decision")
      .as[(String, Long, Long, String, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("up") == (("up", 4L, 3L, "h1", Some(3L))), s"${got("up")}")
    assert(got("flat") == (("flat", 4L, 2L, "continue", None)),
      s"${got("flat")}")
    // llr_final is the exact integer n_s*incS + n_f*incF
    val incS = math.round(math.log(0.75 / 0.25) * 1e6)
    val incF = math.round(math.log(0.25 / 0.75) * 1e6)
    val llr = Eval.sprt(rows, col("k"), Seq(col("i")), col("s"),
        p0 = 0.25, p1 = 0.75)
      .filter(col("key") === "up").select("llr_final_micro")
      .as[Long].head()
    assert(llr == 3 * incS + incF, s"$llr")
  }

  test("kappa is chance-corrected where raw accuracy is not") {
    // a majority-class predictor: 90% accuracy but kappa = 0 (all
    // agreement is chance) -- the reason the audit ships kappa
    val rows = Seq.fill(9)(("maj", "maj")) ++ Seq(("min", "maj"))
    val got = Eval.cohenKappa(rows.toDF("g", "p"), col("g"), col("p"))
      .select("n_agree", "kappa_micro").as[(Long, Long)].head()
    assert(got._1 == 9L && got._2 == 0L)
  }

  test("mannWhitneyU: hand-checked midranks, U and tie-corrected z") {
    // A = {1, 2}, B = {2, 3}: ranks 1, 2.5 | 2.5, 4 -> R_A = 3.5,
    // U_A = 0.5 (u2_a = 1); sigma^2 = (4/12)*(5 - 6/12) = 1.5
    val df = Seq(("g", "a", 1L), ("g", "a", 2L), ("g", "b", 2L),
      ("g", "b", 3L)).toDF("k", "arm", "v")
    val got = Eval.mannWhitneyU(df, col("k"), col("arm"), col("v"),
        "a", "b")
      .select("n_a", "n_b", "u2_a", "z")
      .as[(Long, Long, Long, Double)].head()
    assert(got._1 == 2L && got._2 == 2L && got._3 == 1L)
    val z = -3.0 / (2.0 * math.sqrt(1.5))
    assert(math.abs(got._4 - math.rint(z * 1e6) / 1e6) < 1e-9, s"$got")
  }

  test("mannWhitneyU: degenerate keys yield NULL z; partition " +
      "invariant") {
    val df = Seq(("tied", "a", 5L), ("tied", "b", 5L), ("tied", "a", 5L),
      ("onearm", "a", 1L), ("onearm", "a", 2L)).toDF("k", "arm", "v")
    val got = Eval.mannWhitneyU(df, col("k"), col("arm"), col("v"),
        "a", "b").select("key", "z").collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(got("tied") && got("onearm"))
    val big = spark.range(2000).selectExpr("'k' AS k",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS arm",
      "CAST(id % 37 AS BIGINT) AS v")
    val a = Eval.mannWhitneyU(big, col("k"), col("arm"), col("v"),
      "a", "b").select("u2_a", "z").as[(Long, Double)].head()
    val b = Eval.mannWhitneyU(big.repartition(13), col("k"), col("arm"),
      col("v"), "a", "b").select("u2_a", "z").as[(Long, Double)].head()
    assert(a == b)
  }

  test("logRank: hand-checked two-arm contributions with censoring") {
    // T: death@1, censor@3; C: death@1, death@2
    // t=1: O-E = 0, V = 2*(1/2)(1/2)(2/3) = 1/3
    // t=2: O-E = -1/2, V = 1/4; t=3: censored only, no contribution
    val df = Seq(("g", 1L, true, true), ("g", 3L, false, true),
      ("g", 1L, true, false), ("g", 2L, true, false))
      .toDF("k", "dur", "death", "t1")
    val got = Eval.logRank(df, col("k"), col("dur"), col("death"),
        col("t1"))
      .select("n_a", "n_b", "deaths_a", "deaths_b", "oe_sum_micro",
        "var_sum_micro", "chi2")
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    assert(got._1 == 2L && got._2 == 2L && got._3 == 1L && got._4 == 2L)
    assert(got._5 == -500000L && got._6 == 333333L + 250000L)
    val chi2 = 500000.0 * 500000.0 / 1e6 / 583333.0
    assert(math.abs(got._7 - math.rint(chi2 * 1e6) / 1e6) < 1e-9)
  }

  test("logRank: identical arms cancel; all-censored key reports " +
      "zero sums with NULL chi2") {
    val same = Seq.tabulate(20) { i =>
      ("g", (i % 5 + 1).toLong, true, i % 2 == 0)
    }.toDF("k", "dur", "death", "t1")
    // arms interleave over identical duration profiles: |O-E| stays
    // small and chi2 exists (variance positive)
    val gotSame = Eval.logRank(same, col("k"), col("dur"), col("death"),
      col("t1")).select("chi2").as[Double].head()
    assert(math.abs(gotSame) < 1.0)
    val cens = Seq(("c", 1L, false, true), ("c", 2L, false, false))
      .toDF("k", "dur", "death", "t1")
    val r = Eval.logRank(cens, col("k"), col("dur"), col("death"),
      col("t1")).select("oe_sum_micro", "var_sum_micro", "chi2").head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("spearman: monotone = +/-1 exactly, ties via doubled midranks") {
    val up = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L))
      .toDF("g", "x", "y")
    assert(Eval.spearman(up, col("g"), col("x"), col("y"))
      .select("rho").as[Double].head() == 1.0)
    val down = Seq(("g", 1L, 30L), ("g", 2L, 20L), ("g", 3L, 10L))
      .toDF("g", "x", "y")
    assert(Eval.spearman(down, col("g"), col("x"), col("y"))
      .select("rho").as[Double].head() == -1.0)
    // duplicated point stays perfectly monotone under average ranks
    val tied = Seq(("g", 1L, 1L), ("g", 1L, 1L), ("g", 2L, 2L))
      .toDF("g", "x", "y")
    assert(Eval.spearman(tied, col("g"), col("x"), col("y"))
      .select("rho").as[Double].head() == 1.0)
    // constant marginal -> NULL (rank variance zero)
    val const = Seq(("g", 1L, 7L), ("g", 2L, 7L)).toDF("g", "x", "y")
    assert(Eval.spearman(const, col("g"), col("x"), col("y"))
      .select("rho").head().isNullAt(0))
  }

  test("spearman: rank-invariant under monotone transforms of x") {
    val df = spark.range(500).selectExpr("'g' AS g",
      "CAST(id % 91 AS BIGINT) AS x",
      "CAST((id * id) % 73 AS BIGINT) AS y")
    val a = Eval.spearman(df, col("g"), col("x"), col("y"))
      .select("rho").as[Double].head()
    // x -> x^3 + 7 preserves order exactly -> identical rho
    val b = Eval.spearman(df.selectExpr("g", "x * x * x + 7 AS x", "y"),
      col("g"), col("x"), col("y")).select("rho").as[Double].head()
    assert(a == b)
  }

  test("permTestFdr: null data never rejects, strong signal always " +
      "does; p-values are exact integer ratios") {
    // all-zero metric: every permuted stat equals the observed 0 ->
    // p = (1+B)/(B+1) = 1 exactly, nothing rejected
    val nul = Seq.tabulate(20) { i =>
      ("e" + (i % 2), i.toLong, 0L, i % 2 == 0)
    }.toDF("k", "u", "v", "t")
    val gotNull = Eval.permTestFdr(nul, col("k"), col("u"), col("v"),
      col("t"), b = 199).select("p_num", "p_den", "rejected").collect()
    assert(gotNull.forall(r =>
      r.getLong(0) == 200L && r.getLong(1) == 200L && !r.getBoolean(2)))
    // 64 treated units all +100: obs = 6400; a replicate ties it only
    // if all 64 hash signs agree (~2^-63 per replicate — and the draw
    // is deterministic, so this pin cannot flake once green)
    val strong = Seq.tabulate(64) { i =>
      ("exp", i.toLong, 100L, true)
    }.toDF("k", "u", "v", "t")
    val gotStrong = Eval.permTestFdr(strong, col("k"), col("u"),
        col("v"), col("t"), b = 199)
      .select("obs_cents", "p_num", "rejected").head()
    assert(gotStrong.getLong(0) == 6400L && gotStrong.getLong(1) == 1L
      && gotStrong.getBoolean(2))
  }

  test("permTestFdr: BH rejections are a prefix of the p-value order; " +
      "non-integral alpha*(B+1) fails loudly") {
    val mixed = Seq.tabulate(96) { i =>
      val exp = "e" + (i % 4)
      // e0/e1 carry signal (treated +200), e2/e3 pure noise around 0
      val v = if (i % 4 <= 1) { if (i % 2 == 0) 200L else 0L }
              else { if (i % 2 == 0) 1L else -1L }
      (exp, i.toLong, v, i % 2 == 0)
    }.toDF("k", "u", "v", "t")
    val got = Eval.permTestFdr(mixed, col("k"), col("u"), col("v"),
        col("t"), b = 199)
      .orderBy("bh_rank")
      .select("bh_rank", "rejected").as[(Long, Boolean)].collect()
    val lastRej = got.filter(_._2).map(_._1).maxOption.getOrElse(0L)
    assert(got.forall { case (rk, rej) => rej == (rk <= lastRej) })
    intercept[IllegalArgumentException] {
      Eval.permTestFdr(mixed, col("k"), col("u"), col("v"), col("t"),
        b = 200)
    }
  }

  test("isotonicCalibration: minimax equals the classic PAV result " +
      "on the textbook violator sequence") {
    // bins 0..3 hold y = [1, 0, 1, 1]: PAV pools the first two ->
    // [0.5, 0.5, 1, 1]
    val df = Seq((0L, true), (1L, false), (2L, true), (3L, true))
      .toDF("s", "y")
    val got = Eval.isotonicCalibration(df, col("s"), col("y"),
        0L, 4L, 4)
      .orderBy("bin").select("fit_micro").as[Long].collect().toSeq
    assert(got == Seq(500000L, 500000L, 1000000L, 1000000L))
    // fully decreasing input pools to one flat block
    val dec = Seq((0L, true), (1L, true), (2L, false), (3L, false))
      .toDF("s", "y")
    val flat = Eval.isotonicCalibration(dec, col("s"), col("y"),
        0L, 4L, 4)
      .orderBy("bin").select("fit_micro").as[Long].collect().toSeq
    assert(flat == Seq(500000L, 500000L, 500000L, 500000L))
  }

  test("isotonicCalibration: fit is monotone and mass-weighted on a " +
      "noisy synthetic score") {
    val df = spark.range(5000).selectExpr(
      "CAST(id % 1000 AS BIGINT) * 1000 AS s",
      "(id * 2654435761) % 997 < (id % 1000) AS y")
    val got = Eval.isotonicCalibration(df, col("s"), col("y"),
        0L, 1000000L, 40)
      .orderBy("bin").select("fit_micro").as[Long].collect().toSeq
    assert(got.zip(got.tail).forall { case (a, b) => a <= b }, s"$got")
    assert(got.last > got.head) // real signal, not a flat fit
  }

  test("gini: zero for equality, hand-checked concentration, loud on " +
      "negative values") {
    val eq = Seq(("g", 50L), ("g", 50L), ("g", 50L)).toDF("g", "v")
    assert(Eval.gini(eq, col("g"), col("v"))
      .select("gini_micro").as[Long].head() == 0L)
    // [0,0,0,100]: G = (2*400 - 5*100)/(4*100) = 0.75
    val conc = Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", 100L))
      .toDF("g", "v")
    val got = Eval.gini(conc, col("g"), col("v"))
      .select("n_rows", "sum_cents", "gini_micro")
      .as[(Long, Long, Long)].head()
    assert(got == ((4L, 100L, 750000L)))
    val neg = Seq(("g", -1L)).toDF("g", "v")
    intercept[Exception] {
      Eval.gini(neg, col("g"), col("v")).collect()
    }
  }

  test("gini: partition invariant; zero-total group yields NULL") {
    val big = spark.range(3000).selectExpr(
      "CAST(id % 4 AS STRING) AS g", "CAST((id * id) % 997 AS BIGINT) AS v")
    val a = Eval.gini(big, col("g"), col("v"))
      .orderBy("grp").as[(String, Long, Long, Long)].collect().toSeq
    val b = Eval.gini(big.repartition(11), col("g"), col("v"))
      .orderBy("grp").as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b)
    val zero = Seq(("z", 0L), ("z", 0L)).toDF("g", "v")
    assert(Eval.gini(zero, col("g"), col("v"))
      .select("gini_micro").head().isNullAt(0))
  }

  test("mcnemar: continuity-corrected chi2 from the discordant cells") {
    // n01=8, n10=2: chi2 = (|8-2|-1)^2/10 = 2.5 -> not significant
    val rows = Seq.fill(5)((true, true)) ++ Seq.fill(8)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("a", "b")
    val r = Eval.mcnemar(df, col("a"), col("b"))
      .select("n_pairs", "n_both", "n01", "n10", "chi2_micro", "significant")
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(r == ((18L, 5L, 8L, 2L, 2500000L, false)))
    // n01=15, n10=1: chi2 = 13^2/16 = 10.5625 -> significant at 5%
    val sig = (Seq.fill(15)((true, false)) ++ Seq.fill(1)((false, true)))
      .toDF("a", "b")
    val s = Eval.mcnemar(sig, col("a"), col("b"))
      .select("chi2_micro", "significant").as[(Long, Boolean)].head()
    assert(s == ((10562500L, true)))
  }

  test("mcnemar: zero discordant pairs leaves chi2 NULL, not significant") {
    val df = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    val row = Eval.mcnemar(df, col("a"), col("b")).head()
    assert(row.isNullAt(row.fieldIndex("chi2_micro")))
    assert(!row.getBoolean(row.fieldIndex("significant")))
  }

  test("mcnemar: partition invariant") {
    val df = spark.range(500).selectExpr("id % 3 = 0 AS a", "id % 5 = 0 AS b")
    val one = Eval.mcnemar(df, col("a"), col("b"))
      .select("chi2_micro").as[Long].head()
    val many = Eval.mcnemar(df.repartition(17), col("a"), col("b"))
      .select("chi2_micro").as[Long].head()
    assert(one == many)
  }

  /** Reference one-way ANOVA on the same q4/micro lattice. */
  private def bruteAnova(rows: Seq[(String, Long)])
      : (Long, Long, Long, Long, Option[Long]) = {
    val n = rows.size.toLong
    val per = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = per.size.toLong
    def q(num: BigInt, den: BigInt): BigInt = num / den
    val sumT = per.values.map { vs =>
      val sg = BigInt(vs.sum); q(sg * sg * 10000, vs.size) }.sum
    val s = BigInt(rows.map(_._2).sum)
    val qq = BigInt(rows.map(v => v._2 * v._2).sum)
    val ssb = (sumT - q(s * s * 10000, n)).max(BigInt(0))
    val ssw = qq * 10000 - sumT
    val f = if (k >= 2 && n > k && ssw > 0)
      Some(((ssb * (n - k) * 1000000) / (ssw * (k - 1))).toLong)
    else None
    (n, k, ssb.toLong, ssw.toLong, f)
  }

  test("anovaOneWay: brute parity on generated groups; known-equal " +
      "groups give F near 0; degenerate cases NULL out") {
    val rows = (1L to 300L).map(i =>
      (s"g${i % 4}", (i * 37 % 100) + (i % 4) * 25))
    val got = Eval.anovaOneWay(rows.toDF("g", "v"), col("g"), col("v"))
      .select("n_rows", "k_groups", "ssb_q4", "ssw_q4", "f_micro")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    val exp = bruteAnova(rows)
    assert((got._1, got._2, got._3, got._4, got._5) == exp)
    assert(got._5.exists(_ > 0L))
    // identical group means (shift = 0): SSB collapses to ~0
    val flat = (1L to 300L).map(i => (s"g${i % 4}", i * 37 % 100))
    val gotF = Eval.anovaOneWay(flat.toDF("g", "v"), col("g"), col("v"))
      .select("ssb_q4", "f_micro").as[(Long, Option[Long])].head()
    assert(gotF == ((bruteAnova(flat)._3, bruteAnova(flat)._5)))
    // one group -> no between df -> NULL F; constant values -> ssw=0
    val one = Eval.anovaOneWay(Seq(("a", 1L), ("a", 2L))
      .toDF("g", "v"), col("g"), col("v"))
      .select("f_micro").as[Option[Long]].head()
    assert(one.isEmpty)
    val const = Eval.anovaOneWay(Seq(("a", 5L), ("a", 5L), ("b", 5L),
        ("b", 5L)).toDF("g", "v"), col("g"), col("v"))
      .select("ssw_q4", "f_micro").as[(Long, Option[Long])].head()
    assert(const._1 == 0L && const._2.isEmpty)
  }

  test("brownForsythe: equals anovaOneWay on brute doubled-median " +
      "deviations; equal-spread shifted groups give W = 0; unequal " +
      "spread detected") {
    def med2(vs: Seq[Long]): Long = {
      val s = vs.sorted; val n = s.size
      s((n + 1) / 2 - 1) + s(n / 2)
    }
    def devs(rows: Seq[(String, Long)]): Seq[(String, Long)] = {
      val m = rows.groupBy(_._1).view
        .mapValues(vs => med2(vs.map(_._2))).toMap
      rows.map { case (g, v) => (g, math.abs(2 * v - m(g))) }
    }
    // spreads scale 1x/2x/3x by group — variance differs, means don't
    // matter to the deviations
    val rows = (1L to 300L).map(i =>
      (s"g${i % 3}", (i * 37 % 100) * (1 + i % 3)))
    val got = Eval.brownForsythe(rows.toDF("g", "v"), col("g"), col("v"))
      .select("n_rows", "k_groups", "ssb_q4", "ssw_q4", "w_micro")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert((got._1, got._2, got._3, got._4, got._5) == bruteAnova(devs(rows)))
    assert(got._5.exists(_ > 0L))
    // same spread, shifted means: identical deviation multisets per
    // group (equal sizes) -> SSB exactly 0, W = 0
    val flat = (1L to 300L).map(i =>
      (s"g${i % 3}", (i * 37 % 100) + (i % 3) * 1000))
    val gotF = Eval.brownForsythe(flat.toDF("g", "v"), col("g"), col("v"))
      .select("ssb_q4", "w_micro").as[(Long, Option[Long])].head()
    assert(gotF._1 == 0L && gotF._2.contains(0L))
    // even-sized group: the half-integer median is exercised exactly
    val even = Seq(("a", 1L), ("a", 2L), ("a", 10L), ("a", 11L),
      ("b", 5L), ("b", 5L), ("b", 5L), ("b", 5L))
    val gotE = Eval.brownForsythe(even.toDF("g", "v"), col("g"), col("v"))
      .select("n_rows", "k_groups", "ssb_q4", "ssw_q4", "w_micro")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert((gotE._1, gotE._2, gotE._3, gotE._4, gotE._5)
      == bruteAnova(devs(even)))
  }

  test("chrF: brute parity incl. blank/short edges; identity pair " +
      "scores exactly 1e6") {
    def brute(c0: String, r0: String, maxN: Int,
              beta: Int): (Long, Long, Long) = {
      val c = c0.trim.replaceAll("\\s+", "")
      val r = r0.trim.replaceAll("\\s+", "")
      def grams(s: String, n: Int): Seq[String] =
        if (s.length >= n) (0 to s.length - n).map(i => s.substring(i, i + n))
        else Seq.empty
      var sp = 0L; var sr = 0L
      for (n <- 1 to maxN) {
        val cc = grams(c, n).groupBy(identity).view.mapValues(_.size).toMap
        val rc = grams(r, n).groupBy(identity).view.mapValues(_.size).toMap
        // keys is a SET — map-then-sum over it would dedup equal
        // mins; force a Seq first
        val m = cc.keys.toSeq.filter(rc.contains)
          .map(g => math.min(cc(g), rc(g)).toLong).sum
        val cn = math.max(c.length - n + 1, 0)
        val rn = math.max(r.length - n + 1, 0)
        sp += (if (cn > 0) m * 1000000L / cn else 0L)
        sr += (if (rn > 0) m * 1000000L / rn else 0L)
      }
      val p = sp / maxN; val rr = sr / maxN
      val b2 = beta.toLong * beta
      val f = if (b2 * p + rr > 0) (1 + b2) * p * rr / (b2 * p + rr)
      else 0L
      (p, rr, f)
    }
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat sat on a mat"),
      (2L, "aaaa bbb aa", "zzz yyy zz"),
      (3L, "same same words", "same same words"),
      (4L, "", "nonblank here"),
      (5L, "   ", ""),
      (6L, "ab", "abcdefgh"),
      (7L, "repeated repeated repeated", "repeated once"))
    val got = Eval.chrF(pairs.toDF("id", "cand", "ref"), "id",
        col("cand"), col("ref"))
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    pairs.foreach { case (id, c, r) =>
      assert(got(id) == brute(c, r, 6, 2), s"pair $id")
    }
    assert(got(3L) == ((1000000L, 1000000L, 1000000L)))
    assert(got(2L)._3 == 0L)
    assert(got.size == pairs.size)
  }

  /** Reference Kruskal-Wallis on the same doubled-rank lattice. */
  private def bruteKw(rows: Seq[(String, Long)])
      : (Long, Long, Long, Option[Long], Option[Long]) = {
    val n = rows.size.toLong
    val sorted = rows.map(_._2).sorted
    // doubled average rank per value: 2c + t + 1
    val byV = rows.map(_._2).groupBy(identity).view.mapValues(_.size)
      .toMap
    // doubled average rank: 2·|{x < v}| + t + 1 (indexWhere on the
    // sorted pool IS the count of strictly-smaller values)
    def r2(v: Long): Long =
      2 * sorted.indexWhere(_ == v) + byV(v) + 1
    val per = rows.groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong,
        vs.map(x => BigInt(r2(x._2))).sum)).toMap
    val k = per.size.toLong
    val sumT = per.values.map { case (ng, r2g) => (r2g * r2g) / ng }.sum
    val t3 = byV.values.map(t => BigInt(t) * t * t - t).sum
    val h = if (k >= 2)
      Some(((sumT * 3000000) / (BigInt(n) * (n + 1))
        - BigInt(3000000) * (n + 1)).max(BigInt(0)))
    else None
    val denom = BigInt(n) * n * n - n - t3
    val hAdj = h.flatMap(hv =>
      if (denom > 0) Some(((hv * (BigInt(n) * n * n - n)) / denom)
        .toLong)
      else None)
    (n, k, t3.toLong, h.map(_.toLong), hAdj)
  }

  test("kruskalWallis: brute parity incl. heavy ties; shifted groups " +
      "give H > 0; all-tied NULLs the correction") {
    val rows = (1L to 240L).map(i =>
      (s"g${i % 3}", (i * 7 % 20) + (i % 3) * 8))
    val got = Eval.kruskalWallis(rows.toDF("g", "v"), col("g"), col("v"))
      .select("n_rows", "k_groups", "tie_t3", "h_micro", "h_adj_micro")
      .as[(Long, Long, Long, Option[Long], Option[Long])].head()
    assert(got == bruteKw(rows))
    assert(got._4.exists(_ > 0L) && got._5.exists(_ >= got._4.get))
    // every value identical: t3 = n^3 - n, correction denominator 0
    val tied = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
    val gt = Eval.kruskalWallis(tied.toDF("g", "v"), col("g"), col("v"))
      .select("h_micro", "h_adj_micro")
      .as[(Option[Long], Option[Long])].head()
    assert(gt._1.contains(0L) && gt._2.isEmpty)
    // one group: no H at all
    val one = Eval.kruskalWallis(Seq(("a", 1L), ("a", 2L))
      .toDF("g", "v"), col("g"), col("v"))
      .select("h_micro").as[Option[Long]].head()
    assert(one.isEmpty)
  }

  test("kruskalWallis: partition invariant") {
    val rows = (1L to 300L).map(i => (s"t${i % 4}", i * 13 % 31))
    val a = Eval.kruskalWallis(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().toSeq
    val b = Eval.kruskalWallis(rows.toDF("g", "v").repartition(9),
      col("g"), col("v")).collect().toSeq
    assert(a == b)
  }

  /** Reference Friedman on the doubled-rank micro lattice. */
  private def bruteFriedman(cells: Seq[(Long, String, Long)])
      : (Long, Long, Long, Long, Option[Long], Option[Long]) = {
    val k = cells.map(_._2).distinct.size.toLong
    val byB = cells.groupBy(_._1)
    val complete = byB.filter(_._2.size == k)
    val dropped = (byB.size - complete.size).toLong
    val n = complete.size.toLong
    def r2(vs: Seq[Long], v: Long): Long =
      2L * vs.count(_ < v) + vs.count(_ == v) + 1
    val r2j = complete.values.flatten.groupBy(_._2).view.mapValues { rs =>
      rs.map { case (b, _, v) =>
        BigInt(r2(complete(b).map(_._3), v)) }.sum
    }.toMap
    val ss = r2j.values.map(x => x * x).sum
    val t3 = complete.values.flatMap { rows =>
      rows.map(_._3).groupBy(identity).values.map(g =>
        BigInt(g.size) * g.size * g.size - g.size)
    }.sum
    val q = if (k >= 2 && n >= 1)
      Some(((ss * 3000000) / (BigInt(4) * n * k * (k + 1))
        - BigInt(3000000) * n * (k + 1)).max(BigInt(0)))
    else None
    val den = BigInt(n) * k * (k * k - 1) - t3
    val qa = q.flatMap(qv => if (den > 0)
      Some(((qv * (BigInt(n) * k * (k * k - 1))) / den).toLong)
      else None)
    (n, k, dropped, t3.toLong, q.map(_.toLong), qa)
  }

  test("friedman: brute parity with ties and an incomplete block; " +
      "identical treatments give Q = 0") {
    val treats = Seq("A", "B", "C")
    val cells = (1L to 20L).flatMap { b =>
      treats.zipWithIndex.map { case (t, i) =>
        (b, t, (b * 7 + i * i * 3) % 13) }
    } ++ Seq((99L, "A", 5L)) // incomplete block: must drop, loudly
    val got = Eval.friedman(
        cells.toDF("b", "tr", "v"), col("b"), col("tr"), col("v"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].head()
    assert(got == bruteFriedman(cells))
    assert(got._3 == 1L && got._5.nonEmpty)
    // every treatment identical within each block -> all ranks tie
    val flat = (1L to 10L).flatMap(b => treats.map(t => (b, t, b % 4)))
    val gf = Eval.friedman(flat.toDF("b", "tr", "v"),
        col("b"), col("tr"), col("v"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].head()
    assert(gf._5.contains(0L) && gf._6.isEmpty) // full ties: den = 0
  }

  /** Reference Cochran's Q. */
  private def bruteCochran(cells: Seq[(Long, String, Boolean)])
      : (Long, Long, Long, Long, Option[Long]) = {
    val k = cells.map(_._2).distinct.size.toLong
    val byB = cells.groupBy(_._1)
    val complete = byB.filter(_._2.size == k)
    val dropped = (byB.size - complete.size).toLong
    val rows = complete.values.flatten.toSeq
    val cj = rows.groupBy(_._2).view
      .mapValues(_.count(_._3).toLong).toMap
    val nn = cj.values.sum
    val sumCj2 = cj.values.map(c => BigInt(c) * c).sum
    val sumRb2 = complete.values.map { rs =>
      val rb = rs.count(_._3).toLong; BigInt(rb) * rb }.sum
    val den = BigInt(k) * nn - sumRb2
    val q = if (k >= 2 && den > 0)
      Some((((k - 1) * (k * sumCj2 - BigInt(nn) * nn) * 1000000)
        / den).toLong)
    else None
    (complete.size.toLong, k, dropped, nn, q)
  }

  test("cochranQ: brute parity; k = 2 equals McNemar's uncorrected " +
      "chi2 structure; constant blocks NULL the denominator") {
    val treats = Seq("A", "B", "C")
    val cells = (1L to 30L).flatMap { b =>
      treats.zipWithIndex.map { case (t, i) =>
        (b, t, (b * 3 + i * 7) % 5 < 2) }
    } ++ Seq((99L, "A", true)) // incomplete -> dropped
    val got = Eval.cochranQ(cells.toDF("b", "tr", "x"),
        col("b"), col("tr"), col("x"))
      .select("n_blocks", "k_treatments", "n_blocks_dropped",
        "grand_n", "q_micro")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(got == bruteCochran(cells))
    assert(got._3 == 1L && got._5.nonEmpty)
    // all-true blocks: k*N == sum Rb^2 -> denominator 0 -> NULL
    val const = (1L to 5L).flatMap(b => treats.map(t => (b, t, true)))
    val gc = Eval.cochranQ(const.toDF("b", "tr", "x"),
        col("b"), col("tr"), col("x"))
      .select("q_micro").as[Option[Long]].head()
    assert(gc.isEmpty)
  }

  test("friedman/cochranQ: partition invariant") {
    val treats = Seq("A", "B", "C", "D")
    val cells = (1L to 25L).flatMap { b =>
      treats.zipWithIndex.map { case (t, i) =>
        (b, t, (b * 11 + i * 5) % 9) } }
    val f1 = Eval.friedman(cells.toDF("b", "tr", "v"), col("b"),
      col("tr"), col("v")).collect().toSeq
    val f2 = Eval.friedman(cells.toDF("b", "tr", "v").repartition(7),
      col("b"), col("tr"), col("v")).collect().toSeq
    assert(f1 == f2)
    val q1 = Eval.cochranQ(cells.toDF("b", "tr", "v"), col("b"),
      col("tr"), expr("v % 2 = 0")).collect().toSeq
    val q2 = Eval.cochranQ(cells.toDF("b", "tr", "v").repartition(5),
      col("b"), col("tr"), expr("v % 2 = 0")).collect().toSeq
    assert(q1 == q2)
  }

  test("anovaOneWay: partition invariant") {
    val rows = (1L to 400L).map(i => (s"t${i % 5}", i * 13 % 97))
    val a = Eval.anovaOneWay(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().toSeq
    val b = Eval.anovaOneWay(rows.toDF("g", "v").repartition(11),
      col("g"), col("v")).collect().toSeq
    assert(a == b)
  }

  test("jonckheereTerpstra: brute parity (doubled JT, exact mean, " +
      "tie-corrected z); monotone trend positive, reversed negative; " +
      "degenerate ties NULL z") {
    def brute(rows: Seq[(Long, Long)]): (BigInt, BigInt, Option[Double]) = {
      val n = rows.size
      val gs = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val ks = gs.keys.toSeq.sorted
      var jt2 = BigInt(0)
      for {
        i <- ks.indices; j <- (i + 1) until ks.size
        x <- gs(ks(i)); y <- gs(ks(j))
      } { if (x < y) jt2 += 2 else if (x == y) jt2 += 1 }
      val mean2 = {
        val nn = BigInt(n)
        (nn * nn - gs.values.map(v => BigInt(v.size) * v.size).sum) / 2
      }
      def a3(m: BigInt) = m * (m - 1) * (2 * m + 5)
      def b3(m: BigInt) = m * (m - 1) * (m - 2)
      def c2(m: BigInt) = m * (m - 1)
      val sizes = gs.values.map(v => BigInt(v.size)).toSeq
      val tvs = rows.map(_._2).groupBy(identity).values
        .map(v => BigInt(v.size)).toSeq
      val nn = n.toDouble
      val varJt =
        (BigInt(n) * (n - 1) * (2 * n + 5) - sizes.map(a3).sum
          - tvs.map(a3).sum).toDouble / 72.0 +
        sizes.map(b3).sum.toDouble * tvs.map(b3).sum.toDouble /
          (36.0 * nn * (nn - 1) * (nn - 2)) +
        sizes.map(c2).sum.toDouble * tvs.map(c2).sum.toDouble /
          (8.0 * nn * (nn - 1))
      val z = if (varJt > 0)
        Some((jt2 - mean2).toDouble / 2.0 / math.sqrt(varJt))
      else None
      (jt2, mean2, z)
    }
    // increasing trend with deliberate cross-group ties
    val rows = (1L to 120L).map(i =>
      (i % 3, (i * 37 % 50) + (i % 3) * 10))
    val got = Eval.jonckheereTerpstra(rows.toDF("g", "v"),
        col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    val (jt2, mean2, z) = brute(rows)
    assert(got._1 == 120L && got._2 == 3L)
    assert(BigInt(got._3) == jt2 && BigInt(got._4) == mean2)
    assert(math.abs(got._5.get - z.get) < 1e-5)
    assert(got._5.get > 2.0) // the staged trend is strongly positive
    // reversed ordering flips the sign exactly
    val rev = rows.map { case (g, v) => (2 - g, v) }
    val gotR = Eval.jonckheereTerpstra(rev.toDF("g", "v"),
        col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(math.abs(gotR._5.get + got._5.get) < 1e-5)
    // all values tied -> variance 0 -> NULL z; jt2 = mean2 exactly
    val tied = (1L to 30L).map(i => (i % 3, 7L))
    val gotT = Eval.jonckheereTerpstra(tied.toDF("g", "v"),
        col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(gotT._3 == gotT._4 && gotT._5.isEmpty)
    // one group -> no pairs
    val one = Eval.jonckheereTerpstra(Seq((1L, 5L), (1L, 6L))
        .toDF("g", "v"), col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(one._3 == 0L && one._5.isEmpty)
  }

  test("pageTrend: brute parity (doubled L, exact E[L2], no-tie z); " +
      "staged within-block trend positive, reversed negative; " +
      "incomplete blocks dropped") {
    def brute(rows: Seq[(Long, Long, Long)]): (BigInt, BigInt, Double) = {
      val byB = rows.groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3))).toMap
      val k = rows.map(_._2).distinct.size
      val complete = byB.filter(_._2.map(_._1).distinct.size == k)
      val n = complete.size
      val ordIdx = rows.map(_._2).distinct.sorted.zipWithIndex
        .map { case (t, i) => t -> (i + 1) }.toMap
      var l2 = BigInt(0)
      complete.values.foreach { cells =>
        val vs = cells.map(_._2).sorted
        def r2(v: Long): Long =
          2 * vs.indexWhere(_ == v) + vs.count(_ == v) + 1
        cells.foreach { case (t, v) => l2 += BigInt(ordIdx(t)) * r2(v) }
      }
      val el2 = BigInt(n) * k * (k + 1) * (k + 1) / 2
      val varD = n.toDouble * k * k * (k + 1) * (k + 1) * (k - 1) / 144.0
      val z = ((l2 - el2).toDouble / 2.0) / math.sqrt(varD)
      (l2, el2, z)
    }
    // 40 blocks x 4 treatments, value grows with treatment index +
    // noise; one deliberate within-block tie; block 99 incomplete
    val rows = (for {
      b <- 1L to 40L; t <- 0L to 3L
    } yield (b, t, t * 10 + (b * 7 + t * 3) % 9)) ++
      Seq((99L, 0L, 5L))
    val got = Eval.pageTrend(rows.toDF("b", "t", "v"),
        col("b"), col("t"), col("v"))
      .select("n_blocks", "k_treatments", "n_blocks_dropped", "l2",
        "el2", "z")
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    val (l2, el2, z) = brute(rows)
    assert(got._1 == 40L && got._2 == 4L && got._3 == 1L)
    assert(BigInt(got._4) == l2 && BigInt(got._5) == el2)
    assert(math.abs(got._6.get - z) < 1e-5)
    assert(got._6.get > 2.0)
    // reversing the treatment order flips the sign exactly
    val rev = rows.map { case (b, t, v) => (b, 3L - t, v) }
    val gotR = Eval.pageTrend(rev.toDF("b", "t", "v"),
        col("b"), col("t"), col("v"))
      .select("z").as[Option[Double]].head()
    assert(math.abs(gotR.get + got._6.get) < 1e-5)
    // all-tied blocks: L2 lands exactly on E[L2] (average ranks)
    val tied = (for { b <- 1L to 10L; t <- 0L to 2L }
      yield (b, t, 7L))
    val gotT = Eval.pageTrend(tied.toDF("b", "t", "v"),
        col("b"), col("t"), col("v"))
      .select("l2", "el2").as[(Long, Long)].head()
    assert(gotT._1 == gotT._2)
  }

  test("ordered-test keys fail loudly on a non-numeric group/treatment " +
      "column instead of collapsing to one NULL group") {
    val jt = intercept[Exception] {
      Eval.jonckheereTerpstra(
        Seq(("low", 1L), ("mid", 2L), ("high", 3L)).toDF("g", "v"),
        col("g"), col("v")).collect()
    }
    assert(jt.getMessage.contains("non-numeric ordered key"))
    val pt = intercept[Exception] {
      Eval.pageTrend(
        Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("b", "t", "v"),
        col("b"), col("t"), col("v")).collect()
    }
    assert(pt.getMessage.contains("non-numeric ordered key"))
    // numeric STRINGS are a legitimate key encoding — still accepted
    val ok = Eval.jonckheereTerpstra(
      (for { g <- 1 to 3; i <- 1 to 4 }
        yield (g.toString, (g * 10 + i).toLong)).toDF("g", "v"),
      col("g"), col("v"))
      .select("k_groups").as[Long].head()
    assert(ok == 3L)
  }
}
