package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** q192–q195: the rule/source matrix, RFM segmentation, Markov
  * transitions and Holt smoothing — consistency against independent
  * replays and fixtures engineered to break wrong formulations
  * (tie-ordering, quartile edges, trend sign).
  */
class AnalyticsShapesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_ashapes").toString
  private def rm(dir: String): Unit =
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })

  test("q192 rule/source matrix: consistent with the q177 per-doc battery") {
    val matrix = SparkEntry.queries("q192_rule_source_matrix")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val docs = SparkEntry.queries("q177_gopher_gate")(spark, Sf0001)
    val src = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select($"doc_id", $"source")
    val j = docs.join(src, "doc_id").collect()
    val rules = Seq("r_len", "r_mwl", "r_stop", "r_uniq", "r_short")
    val expected = j.flatMap { r =>
      rules.map(rule => (r.getAs[String]("source"), rule) ->
        (if (r.getAs[Boolean](rule)) 1L else 0L))
    }.groupBy(_._1).map { case (k, v) => k -> ((v.length.toLong, v.map(_._2).sum)) }
    assert(matrix == expected)
    // share arithmetic: micro = pass * 1e6 DIV docs
    SparkEntry.queries("q192_rule_source_matrix")(spark, Sf0001)
      .collect().foreach { r =>
        assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(2))
      }
  }

  test("q193 RFM: hand-built 8-user census lands each user in the " +
      "hand-computed quartile cell; census conserves users") {
    // 8 users; recency days 0..7 (maxd = day of user h), f = 1 for all
    // (degenerate metric -> everyone f_seg 1..?), m distinct
    val rows = (0 until 8).flatMap { u =>
      // user u: last event on day (20 - u) -> r_days = u after max
      // m_micro = (u+1) * 1_000_000; f = u % 2 + 1 events
      val base = Seq((s"u$u", s"2024-01-${20 - u} 10:00:00",
        (u + 1).toDouble, s"e${u}a"))
      val extra = if (u % 2 == 1)
        Seq((s"u$u", s"2024-01-${20 - u} 11:00:00", 0.0, s"e${u}b"))
      else Nil
      base ++ extra
    }
    val ev = rows.toDF("user_id", "tss", "value", "event_id")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("event_type", lit("x")).drop("tss")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q193_rfm_segments")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._4).sum == 8L) // census conserves users
    // quartile boundaries on r_days = {0..7}: ceil(8k/4)-th distinct
    // cumulative -> q1=1, q2=3, q3=5; seg(0)=1, seg(7)=4
    // f has two distinct values {1, 2} with 4 users each: q1=1 q2=1
    // q3=2 -> f=1 -> seg 1, f=2 -> seg 3
    val fSegs = got.map(_._2).distinct.sorted
    assert(fSegs.toSeq == Seq(1L, 3L))
    // r_seg of the user with r_days=0 must be 1 and r_days=7 must be 4
    // (m increases with u as r does, so check via joint cells)
    assert(got.exists(r => r._1 == 1L && r._4 > 0))
    assert(got.exists(r => r._1 == 4L && r._4 > 0))
    rm(dir)
  }

  test("q194 Markov: same-timestamp ties break on event_id; shares are " +
      "exact micro integers; from_total conserves transitions") {
    val ev = Seq(
      // user A: a -> b -> a (b,a share ts; event_id breaks the tie)
      ("A", "2024-01-01 10:00:00", "a", 1L),
      ("A", "2024-01-01 10:05:00", "b", 2L),
      ("A", "2024-01-01 10:05:00", "a", 3L),
      // user B: a -> b
      ("B", "2024-01-01 09:00:00", "a", 4L),
      ("B", "2024-01-01 09:30:00", "b", 5L)
    ).toDF("user_id", "tss", "event_type", "event_id")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("value", lit(1.0)).drop("tss")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q194_markov_transitions")(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // transitions: A: a->b, b->a; B: a->b  => from a: b:2/2; from b: a:1/1
    assert(got == Map(
      ("a", "b") -> ((2L, 2L, 1000000L)),
      ("b", "a") -> ((1L, 1L, 1000000L))))
    rm(dir)
  }

  test("q195 Holt: driver-side recursion replay matches; constant " +
      "series has zero trend; increasing ramp has positive trend") {
    val days = (1 to 10).map(d => f"2024-01-$d%02d 12:00:00")
    val ev = days.zipWithIndex.flatMap { case (ts, i) =>
      Seq(("flat", ts, 5.0, i.toLong * 2),
        ("ramp", ts, 1.0 + i, i.toLong * 2 + 1))
    }.toDF("event_type", "tss", "value", "event_id")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("user_id", lit("u")).drop("tss")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q195_holt_smoothing")(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // driver-side replay of the exact recursion on the micro lattice
    def holt(xs: Seq[Double]): (Double, Double) = {
      var l = xs.head; var b = 0.0
      xs.tail.foreach { x =>
        val l1 = 0.5 * x + 0.5 * (l + b)
        b = 0.125 * (x - l + b) + 0.75 * b
        l = l1
      }
      (l, b)
    }
    def micro(v: Double): Double = math.floor(v * 1000000.0)
    val (lf, bf) = holt(days.indices.map(_ => micro(5.0)))
    assert(got("flat")._1 == 10L)
    assert(math.abs(got("flat")._2 - math.rint(lf / 1e6 * 1e6) / 1e6) < 1e-9)
    assert(got("flat")._3 == 0.0) // constant series: zero trend exactly
    val (lr, br) = holt((0 until 10).map(i => micro(1.0 + i)))
    assert(math.abs(got("ramp")._2 - math.rint(lr / 1e6 * 1e6) / 1e6) < 1e-6)
    assert(got("ramp")._3 > 0.5) // slope 1/day, beta smoothed
    assert(math.abs(got("ramp")._4 - (got("ramp")._2 + got("ramp")._3))
      < 2e-6) // forecast = level + trend (up to final rounding)
    assert(br > 0)
    rm(dir)
  }

  test("q196 SAX: 7-day segmentation, integer PAA means, quartile " +
      "alphabet in rank order") {
    // one type, 14 days: week 1 all 1.0, week 2 all 9.0 -> two
    // segments with PAA 1e6 and 9e6; with two distinct PAA values the
    // quartiles are q1=1e6 q2=1e6 q3=9e6 -> symbols a (not > q1) and
    // c (> q1, > q2, not > q3)
    val ev = (1 to 14).map { d =>
      ("t", f"2024-01-$d%02d 08:00:00", if (d <= 7) 1.0 else 9.0,
        d.toLong)
    }.toDF("event_type", "tss", "value", "event_id")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("user_id", lit("u")).drop("tss")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q196_sax_symbols")(spark, dir)
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(
      0L -> ((7L, 1000000L, "a")),
      1L -> ((7L, 9000000L, "c"))))
    rm(dir)
  }

  test("q197 co-occurrence: hand-computed dot/cosine; pairs with no " +
      "shared user never appear") {
    val ev = Seq(
      // u1: 2xA, 1xB ; u2: 1xA, 3xB ; u3: 1xC (C co-occurs with none)
      ("u1", "A"), ("u1", "A"), ("u1", "B"),
      ("u2", "A"), ("u2", "B"), ("u2", "B"), ("u2", "B"),
      ("u3", "C")
    ).zipWithIndex.map { case ((u, t), i) =>
      (u, t, s"2024-01-01 0$i:00:00", i.toLong, 1.0)
    }.toDF("user_id", "event_type", "tss", "event_id", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q197_cooccurrence_sim")(spark, dir)
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (t1, t2, nu, dot, cos) = got.head
    assert((t1, t2, nu) == (("A", "B", 2L)))
    assert(dot == 2L * 1 + 1L * 3) // u1: 2*1, u2: 1*3
    // norms: A: 4+1=5, B: 1+9=10 -> cos = 5 / sqrt(50)
    assert(math.abs(cos - 5.0 / math.sqrt(50.0)) < 1e-6)
    rm(dir)
  }

  test("q200 seasonality strength: pure weekly pattern = 1.0 exactly, " +
      "constant = 0, period-2 alternation (anti-aligned with the week) " +
      "= 0.0 exactly") {
    // 14 days starting Mon 2024-01-01: 'weekly' repeats a 7-value
    // pattern (residuals vanish), 'flat' is constant (zero variance),
    // 'alt' alternates 1/3 with period 2 — day i and i+7 have opposite
    // parity, so every weekday mean is 2 and residuals carry ALL the
    // variance
    val ev = (0 until 14).flatMap { i =>
      Seq(
        ("weekly", f"2024-01-${i + 1}%02d 06:00:00", (1 + (i % 7)).toDouble, i * 3L),
        ("flat", f"2024-01-${i + 1}%02d 06:00:00", 5.0, i * 3L + 1),
        ("alt", f"2024-01-${i + 1}%02d 06:00:00", (1 + 2 * (i % 2)).toDouble, i * 3L + 2))
    }.toDF("event_type", "tss", "value", "event_id")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("user_id", lit("u")).drop("tss")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q200_seasonality_strength")(spark, dir)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map("weekly" -> 1.0, "flat" -> 0.0, "alt" -> 0.0), got)
    rm(dir)
  }

  test("q204 Kneser-Ney: hand-computed fixed-point probabilities; " +
      "per-context observed mass stays under 1 (discount reserves " +
      "mass for unseen continuations)") {
    // corpus: "a b a b" and "b a" -> c(a,b)=2, c(b,a)=2; both contexts
    // have c1=2, N1+(w·)=1; both words have N1+(·w)=1; T=2
    // p_kn = (4·2−3)·1e6/(4·2) + 3·1·1·1e6/(4·2·2) = 625000+187500
    val docs = Seq(
      (1L, "a b a b", "en", "s", 7L),
      (2L, "b a", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir()
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q204_kneser_ney")(spark, dir)
      .select($"w1", $"w2", $"p_kn_micro").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("a", "b") -> 812500L, ("b", "a") -> 812500L), got)
    rm(dir)
    // real corpus: per context the observed-continuation mass must
    // not exceed 1e6 (the discount is what funds unseen bigrams)
    val mass = SparkEntry.queries("q204_kneser_ney")(spark, Sf0001)
      .groupBy($"w1").agg(sum($"p_kn_micro").as("m"))
      .select($"m").as[Long].collect()
    assert(mass.nonEmpty && mass.forall(_ <= 1000000L),
      s"max observed mass ${mass.max}")
  }

  test("q201 dwell times: gaps are attributed to the FROM event's " +
      "type; p50/p90 are the discrete order statistics") {
    // one user, 11 events of type a at gaps 10,20,...,100s; the k-th
    // gap value is 10k -> p50 = min v with cum*2>=10 = 50, p90 = 90
    val times = (0 to 10).scanLeft(0L)((acc, i) => acc + i * 10).tail
    val ev = times.zipWithIndex.map { case (off, i) =>
      ("u1", "a", new Timestamp(1704100000000L + off * 1000L), i.toLong, 1.0)
    }.toDF("user_id", "event_type", "ts", "event_id", "value")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q201_dwell_times")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("a", 10L, 50L, 90L)), got.toSeq)
    rm(dir)
  }

  test("q202 n-gram novelty: an exact duplicate scores 0, a unique " +
      "doc scores 1e6, a half-copied doc in between") {
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val b = (21 to 40).map(i => s"w$i").mkString(" ")
    val half = (11 to 30).map(i => s"w$i").mkString(" ") // spans a+b
    val docs = Seq(
      (1L, a, "en", "s", a.length.toLong),
      (2L, a, "en", "s", a.length.toLong), // exact dup of 1
      (3L, b, "en", "s", b.length.toLong),
      (4L, half, "en", "s", half.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir()
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q202_ngram_novelty")(spark, dir)
      .select($"doc_id", $"novel_micro").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L && got(2L) == 0L) // every 8-gram shared
    assert(got(3L) < 1000000L) // doc 4 copies some of b's grams
    assert(got(4L) > 0L && got(4L) < 1000000L) // overlap region shared
    rm(dir)
  }

  test("q203 Hill tail index: a Pareto-like sample estimates 1/alpha " +
      "within tolerance; fewer than k+1 positive values -> no row") {
    // x_i = floor(1e6 / i^(1/2)) for i in 1..200 is Pareto(alpha=2):
    // hill_inv_alpha should be near 0.5
    val ev = (1 to 200).map { i =>
      ("u", "p", new Timestamp(1704100000000L + i * 1000L), i.toLong,
        math.pow(1e6 / i, 0.5) / 100.0) // /100: centi lattice restores
    }.toDF("user_id", "event_type", "ts", "event_id", "value")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q203_hill_tail")(spark, dir)
      .as[(String, Double)].collect().toMap
    assert(got.contains("p"))
    assert(math.abs(got("p") - 0.5) < 0.15, s"hill=${got("p")}")
    // a type with < 51 positive values emits nothing (documented)
    val tiny = (1 to 10).map { i =>
      ("u", "t", new Timestamp(1704100000000L + i * 1000L), 500L + i, 1.0)
    }.toDF("user_id", "event_type", "ts", "event_id", "value")
    val dir2 = tmpDir()
    ev.unionByName(tiny).write.mode("overwrite")
      .parquet(s"$dir2/events.parquet")
    val got2 = SparkEntry.queries("q203_hill_tail")(spark, dir2)
      .as[(String, Double)].collect().toMap
    assert(got2.contains("p") && !got2.contains("t"))
    rm(dir); rm(dir2)
  }

  test("q198 embedding outliers: a planted flipped vector is exactly " +
      "the one flagged in its label") {
    val dim = 8
    // label 0: 30 vectors near (1,0,...), one vector flipped to
    // (-1,0,...); tiny deterministic jitter keeps variance nonzero
    val rows = (0 until 30).map { i =>
      val v = Array.tabulate(dim)(d =>
        if (d == 0) 1.0f else (0.001f * ((i + d) % 3)))
      (i.toLong, v, 0L)
    } :+ ((999L, Array.tabulate(dim)(d =>
      if (d == 0) -1.0f else 0.0f), 0L))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val dir = tmpDir()
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val flagged = SparkEntry.queries("q198_embedding_outliers")(spark, dir)
      .filter(col("is_outlier")).select($"vec_id").as[Long].collect()
    assert(flagged.toSeq == Seq(999L))
    rm(dir)
  }

  test("q208 Kaplan-Meier: hand product 4/5*3/4*2/3*1/2 = 0.2 with " +
      "the censored tail at risk; a no-death stream survives at 1") {
    val base = 1704100000000L
    // type a: gaps 10,20,30,40 s; its last event is censored against
    // the GLOBAL end (type b's lone event, 500000 s out), so the
    // censored interval outlives every death and stays in every n_i
    val ev = (Seq(0L, 10L, 30L, 60L, 100L).zipWithIndex.map {
      case (off, i) => ("u1", "a", new Timestamp(base + off * 1000L),
        i.toLong, 1.0)
    } :+ (("u2", "b", new Timestamp(base + 500000L * 1000L), 99L, 1.0)))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val dir = tmpDir()
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q208_kaplan_meier")(spark, dir)
      .as[(String, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    Seq(21600L, 86400L, 259200L).foreach { h =>
      assert(got(("a", h)) == ((0.2, 4L)), got(("a", h)))
      assert(got(("b", h)) == ((1.0, 0L)), got(("b", h)))
    }
    assert(got.size == 6)
    rm(dir)
  }

  test("q210 Markov attribution: hand chain — removal effects and " +
      "normalized shares with exact floor arithmetic") {
    val base = 1704100000000L
    // u1: view -> purchase; u2: view -> click -> purchase; u3: click
    // (never converts). Chain: START->{view 2/3, click 1/3};
    // view->{CONV .5, click .5}; click->{CONV .5, NULL .5}.
    // Fixed point (per-edge floor micro): v(click)=500000,
    // v(view)=750000, p_full = 499999+166666 = 666665. Removing view:
    // p=166666 -> re=750001; removing click: p=333333 -> re=500000;
    // shares 600000 / 399999.
    val rows = Seq(
      ("u1", "view", 0L, 0L), ("u1", "purchase", 10L, 1L),
      ("u2", "view", 0L, 2L), ("u2", "click", 10L, 3L),
      ("u2", "purchase", 20L, 4L),
      ("u3", "click", 0L, 5L)
    ).map { case (u, t, off, id) =>
      (u, t, new Timestamp(base + off * 1000L), id, 1.0)
    }.toDF("user_id", "event_type", "ts", "event_id", "value")
    val dir = tmpDir()
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q210_markov_attribution")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("view") == ((166666L, 666665L, 750001L, 600000L)), got)
    assert(got("click") == ((333333L, 666665L, 500000L, 399999L)), got)
    rm(dir)
  }

  test("q211 histogram quantiles: hand bins — within-bin " +
      "interpolation, ceil ranks, out-of-range days excluded") {
    // values 1..8 on an in-range day: bins (width 4) hold 3/4/1.
    // p50: rank ceil(8*.5)=4 -> bin 1, interp 4M + 1*4M/4 = 5M; exact
    // order stat = 4M. p90/p99: rank 8 -> bin 2, 8M + 4M = 12M; exact
    // 8M. The day-25 value 100 must not leak into the 08..22 window.
    val inDay = java.sql.Timestamp.valueOf("2024-01-10 12:00:00")
    val outDay = java.sql.Timestamp.valueOf("2024-01-25 12:00:00")
    val rows = ((1 to 8).map(i => ("u1", "a", inDay, i.toLong, i.toDouble))
      :+ (("u1", "a", outDay, 99L, 100.0)))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val dir = tmpDir()
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q211_histogram_quantile_rollup")(
        spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", 50L)) == ((5000000L, 4000000L, 8L)), got)
    assert(got(("a", 90L)) == ((12000000L, 8000000L, 8L)), got)
    assert(got(("a", 99L)) == ((12000000L, 8000000L, 8L)), got)
    rm(dir)
  }

  test("q212 Bradley-Terry: total dominance lands exactly at " +
      "(2e6, 0) — the MM fixed point with floors") {
    // source A: clean prose; source B: junk. A wins every rank-
    // matched battle, so MM converges to s_A = 2e6, s_B = 0 EXACTLY
    // in the floor arithmetic (s_A' = sA + sB, then stable).
    val good1 = "The quick brown fox jumps over the lazy dog today."
    val good2 = "A clear and well formed sentence with many words here."
    val junk = "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz"
    val docs = Seq(
      (1L, good1, "en", "clean", good1.length.toLong),
      (2L, good2, "en", "clean", good2.length.toLong),
      (3L, junk, "en", "junk", junk.length.toLong),
      (4L, junk + " zzz", "en", "junk", (junk.length + 4).toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir()
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q212_bradley_terry")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("clean") == ((2L, 2L, 2000000L)), got)
    assert(got("junk") == ((0L, 2L, 0L)), got)
    rm(dir)
  }
}
