package graft

import graft.core.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None), (None, Some("a"))
  ).toDF("id", "tag")

  test("profile: nulls, distincts and ranges per column in one scan") {
    val p = Profile.profile(dirty).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getAs[Long]("n_rows") == 4L)
    assert(id.getAs[Long]("n_nulls") == 1L)
    assert(id.getAs[Double]("null_frac") == 0.25)
    assert(id.getAs[Long]("n_distinct") == 2L) // nulls excluded
    assert(id.getAs[String]("min_repr") == "1" && id.getAs[String]("max_repr") == "2")
    val tag = p("tag")
    assert(tag.getAs[Long]("n_nulls") == 1L && tag.getAs[Long]("n_distinct") == 2L)
    // approx variant keeps the same shape with HLL cardinalities
    val ap = Profile.profile(dirty, approxDistinct = true).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(ap("id") >= 1L && ap("tag") >= 1L)
  }

  test("checks: complete/unique pass and fail with observed evidence") {
    val report = Profile.runChecks(dirty, Seq(
      Profile.complete("id"), Profile.unique("id"),
      Profile.complete("tag"), Profile.nonEmpty("id")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(!report(("complete", "id")))  // one null id
    assert(!report(("unique", "id")))    // duplicate id 2
    assert(!report(("complete", "tag")))
    assert(report(("non_empty", "id")))
    val clean = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val ok = Profile.runChecks(clean, Seq(Profile.complete("id"), Profile.unique("id")))
      .select("passed").as[Boolean].collect()
    assert(ok.forall(identity))
  }

  test("psi: hand-computed 2-bucket case, exact fixed-point terms") {
    // group A: 3 rows bucket 0, 1 row bucket 1; group B: 1/3.
    // population: 4/4.
    val rows = Seq.fill(3)(("A", 0L)) ++ Seq(("A", 1L)) ++
      Seq(("B", 0L)) ++ Seq.fill(3)(("B", 1L))
    val df = rows.toDF("source", "b")
    val out = Profile.psi(df, "source", col("b"), nBuckets = 2)
      .select("source", "psi_micro", "n_rows")
      .as[(String, Long, Long)].collect()
    def term(c: Long, gt: Long, pc: Long, pt: Long): Long = {
      val p = (c + 1).toDouble / (gt + 2).toDouble
      val q = (pc + 1).toDouble / (pt + 2).toDouble
      math.floor(1e6 * ((p - q) * math.log(p / q))).toLong
    }
    val expA = term(3, 4, 4, 8) + term(1, 4, 4, 8)
    val expB = term(1, 4, 4, 8) + term(3, 4, 4, 8)
    val psiMap = out.map(r => r._1 -> r._2).toMap
    assert(psiMap("A") == expA && psiMap("B") == expB)
    assert(out.map(r => r._1 -> r._3).toMap == Map("A" -> 4L, "B" -> 4L))
  }

  test("psi: identical-shape group reads near zero, shifted group large; " +
      "empty buckets contribute (dense grid)") {
    // 'same'/'also' dominate the population and mirror its shape; the
    // small 'shift' group concentrates everything in one bucket.
    // (PSI is group-vs-POPULATION, so the shifted group must stay
    // small or it drags the baseline with it — the first version of
    // this test learned that the hard way.)
    val rows =
      (1 to 80).map(i => ("same", (i % 4).toLong)) ++
      (1 to 80).map(i => ("also", (i % 4).toLong)) ++
      (1 to 8).map(_ => ("shift", 3L))
    val df = rows.toDF("source", "b")
    val psi = Profile.psi(df, "source", col("b"), nBuckets = 4)
      .select("source", "psi_micro").as[(String, Long)].collect().toMap
    assert(math.abs(psi("same")) < 100000, s"same-shape psi ${psi("same")}")
    assert(psi("same") == psi("also"), "identical groups score identically")
    assert(psi("shift") > 500000, s"shifted psi ${psi("shift")}")
    // the drift signal REQUIRES the dense grid: 'shift' has zero mass
    // in buckets 0-2 where the population is heavy — those empty
    // buckets must appear as smoothed terms, not vanish
    assert(psi("shift") > 10 * math.max(math.abs(psi("same")), 1L))
  }

  test("ks: hand-computed 2-bucket case, exact fixed-point max gap") {
    // group A: 3 rows bucket 0, 1 row bucket 1 -> CDF (0.75, 1.0)
    // group B: 1/3 -> CDF (0.25, 1.0); population 4/8 -> (0.5, 1.0)
    val rows = Seq.fill(3)(("A", 0L)) ++ Seq(("A", 1L)) ++
      Seq(("B", 0L)) ++ Seq.fill(3)(("B", 1L))
    val out = Profile.ks(rows.toDF("source", "b"), "source", col("b"), 2)
      .select("source", "ks_micro", "n_rows")
      .as[(String, Long, Long)].collect()
    val ks = out.map(r => r._1 -> r._2).toMap
    assert(ks("A") == 250000L && ks("B") == 250000L) // |0.75-0.5| = |0.25-0.5|
    assert(out.map(r => r._1 -> r._3).toMap == Map("A" -> 4L, "B" -> 4L))
  }

  test("ks: location shift scores high, same shape scores zero, and a " +
      "group concentrated past the population's mass needs the dense grid") {
    val rows =
      (1 to 80).map(i => ("same", (i % 4).toLong)) ++
      (1 to 80).map(i => ("also", (i % 4).toLong)) ++
      (1 to 8).map(_ => ("shift", 3L))
    val ks = Profile.ks(rows.toDF("source", "b"), "source", col("b"), 4)
      .select("source", "ks_micro").as[(String, Long)].collect().toMap
    // the two mirror groups sit within rounding of the population CDF
    assert(ks("same") < 40000, s"same-shape ks ${ks("same")}")
    assert(ks("same") == ks("also"))
    // 'shift' has CDF 0 through bucket 2 while the population CDF has
    // already accumulated ~72% there — KS reads that gap directly,
    // and only because empty buckets 0-2 exist on the dense grid
    assert(ks("shift") > 650000, s"shifted ks ${ks("shift")}")
  }

  test("centroidDrift: single group equals the population -> drift 0, " +
      "hand-computed 2-dim case, opposed groups score high") {
    // one group IS the population: cos(s, s) == 1 up to the sqrt ulp
    // the clamp absorbs -> exactly 0
    val solo = Seq(("a", Seq(0.5f, 0.25f)), ("a", Seq(0.1f, -0.3f)))
      .toDF("g", "v")
    val s0 = Profile.centroidDrift(solo, "g", "v", 2)
      .select("g", "n_rows", "drift_micro").as[(String, Long, Long)]
      .collect().map { case (k, n, d) => k -> ((n, d)) }.toMap
    assert(s0("a") == ((2L, 0L)))

    // two groups on opposite unit axes: population sum = (1e6, 1e6),
    // group A sum = (2e6, 0) -> cos = 2e12/(2e6 * sqrt(2)e6) = 1/sqrt(2)
    val axes = Seq(
      ("A", Seq(1.0f, 0.0f)), ("A", Seq(1.0f, 0.0f)),
      ("B", Seq(0.0f, 1.0f)), ("B", Seq(0.0f, 1.0f))).toDF("g", "v")
    val d = Profile.centroidDrift(axes, "g", "v", 2)
      .select("g", "drift_micro").as[(String, Long)].collect().toMap
    val expect = math.floor(1e6 * (1.0 - 1.0 / math.sqrt(2.0))).toLong
    assert(d("A") == expect && d("B") == expect, s"$d vs $expect")

    // a group drawn from the same direction as the population centroid
    // scores ~0 while an orthogonal one scores ~1 - 1/sqrt(2)
    assert(d("A") > 250000L)
  }

  test("centroidDrift: additive fixed-point sums are partition-order free") {
    val rows = (0 until 64).map { i =>
      (if (i % 3 == 0) "x" else "y",
        Seq.tabulate(4)(j => ((i * 7 + j * 13) % 100 - 50) / 50.0f))
    }
    val df1 = rows.toDF("g", "v").repartition(1)
    val df8 = rows.reverse.toDF("g", "v").repartition(8)
    val a = Profile.centroidDrift(df1, "g", "v", 4)
      .select("g", "n_rows", "drift_micro").as[(String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val b = Profile.centroidDrift(df8, "g", "v", 4)
      .select("g", "n_rows", "drift_micro").as[(String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(a == b, s"$a vs $b")
  }

  test("covarianceMatrix: hand case, perfect and anti correlation, symmetry") {
    // dim1 = 2*dim0 (corr +1), dim2 = -dim0 (corr -1)
    val df = Seq(
      Seq(1.0f, 2.0f, -1.0f), Seq(2.0f, 4.0f, -2.0f), Seq(3.0f, 6.0f, -3.0f))
      .toDF("embedding")
    val got = Profile.covarianceMatrix(df, "embedding")
      .select("dim_i", "dim_j", "n", "cov_sum", "corr")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // centered micro deviations: dim0 (-1e6,0,1e6) -> var 2e12
    assert(got((0L, 0L)) == ((3L, 2000000000000L, 1.0)))
    assert(got((1L, 1L)) == ((3L, 8000000000000L, 1.0)))
    assert(got((0L, 1L)) == ((3L, 4000000000000L, 1.0)))
    assert(got((0L, 2L))._3 == -1.0)
    assert(got((1L, 2L))._3 == -1.0)
    // upper triangle only, all n equal
    assert(got.keySet == Set((0L, 0L), (0L, 1L), (0L, 2L), (1L, 1L),
      (1L, 2L), (2L, 2L)))
  }

  test("pcaTopComponent: correlated block dominates, unit norm, lambda") {
    // dims 0,1 move together; dim 2 carries unrelated alternation ->
    // top axis of the correlation matrix loads equally on dims 0,1
    val rows = Seq(
      Seq(1.0f, 1.0f, 1.0f), Seq(2.0f, 2.0f, -1.0f),
      Seq(3.0f, 3.0f, 1.0f), Seq(4.0f, 4.0f, -1.0f),
      Seq(5.0f, 5.0f, 1.0f), Seq(6.0f, 6.0f, -1.0f))
    val df = rows.toDF("embedding")
    val got = Profile.pcaTopComponent(df, "embedding", dim = 3, iters = 8)
      .select("dim", "component", "lambda")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.size == 3)
    val comps = got.map(_._2)
    assert(math.abs(comps(0) - comps(1)) < 1e-5,
      s"correlated dims load equally: $comps")
    assert(math.abs(comps(0)) > math.abs(comps(2)),
      "independent dim loads less")
    assert(math.abs(comps.map(c => c * c).sum - 1.0) < 1e-6, "unit norm")
    val lambda = got.head._3
    assert(lambda > 2.0 && lambda <= 3.0 + 1e-9,
      s"top eigenvalue of a 3-dim corr matrix with a 2-block: $lambda")
    // determinism across partitioning
    val again = Profile.pcaTopComponent(df.repartition(4), "embedding", 3, 8)
      .select("dim", "component", "lambda")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(again == got)
  }

  test("analyzeTable: nulls counted, NDV estimate tracks exact, " +
      "partition invariant") {
    val df = spark.range(2000).selectExpr(
      "CAST(id AS STRING) AS uid",
      "CASE WHEN id % 10 = 0 THEN NULL ELSE CAST(id % 37 AS STRING) END AS bucket",
      "'const' AS tag")
    val got = Profile.analyzeTable(df, Seq("uid", "bucket", "tag"))
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("uid")._2 == 2000L && got("uid")._3 == 0L
      && got("uid")._5 == 2000L)
    assert(got("bucket")._3 == 200L, "every 10th row is null")
    assert(got("bucket")._5 == 37L)
    // small-cardinality columns sit in the linear-counting regime:
    // tight estimates
    assert(math.abs(got("bucket")._4 - 37.0) < 6.0, s"${got("bucket")}")
    assert(got("tag")._5 == 1L && math.abs(got("tag")._4 - 1.0) < 0.5)
    // 2000 distinct at m=128: raw-HLL regime, ~9% RSE
    assert(math.abs(got("uid")._4 - 2000.0) < 500.0, s"${got("uid")}")
    val again = Profile.analyzeTable(df.repartition(13),
      Seq("uid", "bucket", "tag"))
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == got, "sketch must be partition invariant")
  }

  test("equiDepthHistogram: exact quarters; a heavy value absorbs ties") {
    // 1..100 once each, 4 buckets -> boundaries 25/50/75/100, 25 each
    val uniform = (1L to 100L).toDF("v")
    val got = Profile.equiDepthHistogram(uniform, col("v"), 4)
      .select("bucket", "hi", "n_rows")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 25L, 25L), (2L, 50L, 25L), (3L, 75L, 25L),
      (4L, 100L, 25L)), s"$got")
    // value 10 carries 90% of the mass: every early boundary collapses
    // onto it, its bucket reports the full tied mass once, later
    // duplicate boundaries report zero — the skew is VISIBLE
    val skewed = (Seq.fill(90)(10L) ++ Seq(1L, 2L, 3L, 4L, 5L, 20L, 30L,
      40L, 50L, 60L)).toDF("v")
    val sk = Profile.equiDepthHistogram(skewed, col("v"), 4)
      .select("bucket", "hi", "n_rows")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(sk.map(_._3).sum == 100L, "mass conserved")
    val heavy = sk.filter(_._2 == 10L)
    assert(heavy.map(_._3).max == 95L,
      s"the tied value's bucket carries its full mass once: $sk")
  }

  test("benford: dense digit grid, exact shares, sub-1 filtered") {
    // one value per leading digit -> 9 equal shares of 111111 micro
    val df = Seq(1.5, 23.0, 345.0, 4.0, 5e3, 6.0, 77.0, 8.0, 900.0)
      .toDF("v")
    val got = Profile.benford(df, col("v"))
      .select("digit", "n_obs", "share_micro", "benford_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (1L to 9L))
    assert(got.forall(r => r._2 == 1L && r._3 == 111111L))
    assert(got.head._4 == 301030L && got.last._4 == 45757L)
    // absent digits SHOW as zero-count rows; values < 1 never count
    val skewed = Seq(0.4, 19.0, 1e6, 150.0).toDF("v")
    val rows = Profile.benford(skewed, col("v"))
      .select("digit", "n_obs", "share_micro")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.size == 9)
    assert(rows.head == ((1L, 3L, 1000000L)))
    assert(rows.tail.forall(r => r._2 == 0L && r._3 == 0L))
  }

  test("functionalDependencies: NULL rhs counts as one more value " +
      "(a key mapping to {NULL, 'x'} violates)") {
    val df = Seq(
      ("k1", Some("x")), ("k1", None),    // k1 -> {x, NULL}: violates
      ("k2", Some("y")), ("k2", Some("y")), // k2 -> {y}: fine
      ("k3", None), ("k3", None)          // k3 -> {NULL}: one value, fine
    ).toDF("a", "b")
    val fd = Profile.functionalDependencies(df, Seq("a", "b"))
      .filter(col("lhs") === "a").collect().head
    assert(fd.getAs[Long]("n_keys") == 3L)
    assert(fd.getAs[Long]("n_viol_keys") == 1L) // only k1
    assert(fd.getAs[Long]("max_rhs_per_key") == 2L) // {x, NULL}
    assert(!fd.getAs[Boolean]("holds"))
  }
}
