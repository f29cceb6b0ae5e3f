package graft

import graft.core.{Decontaminate, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Decontamination, repetition stats, PII scrubbing and per-source
  * quota — the corpus-hygiene operators (q52–q55).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDedup: first occurrence wins across and within documents") {
    // 2-word chunks: doc 1 = [a b][c d]; doc 2 repeats [a b] then adds
    // [x y]; doc 3 repeats [c d] twice -> drops out entirely; doc 4
    // repeats its own chunk internally
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d c d"),
      (4L, "p q p q r")).toDF("doc_id", "text")
    val out = graft.core.TextAnalysis.chunkDedup(docs, "doc_id", "text", 2)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1) == ((2L, "a b c d")))
    assert(out(2) == ((1L, "x y")), "cross-doc repeat of [a b] dropped")
    assert(!out.contains(3L), "all-duplicate doc drops out")
    assert(out(4) == ((2L, "p q r")), "within-doc repeat dropped, short tail kept")
  }

  test("decontaminate: flags docs sharing an n-gram with eval, spares the rest") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares 5-gram prefix with eval 100
      (2L, "one two three four five six seven"),   // clean
      (3L, "alpha beta gamma delta epsilon other") // shares the same 5-gram
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon final")
    ).toDF("doc_id", "text")
    val flagged = Decontaminate.flagContaminated(train, eval, "doc_id", "text", n = 5)
      .select("doc_id", "n_hits", "contaminated")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(flagged(1L) == (1L, true))
    assert(flagged(2L) == (0L, false))
    assert(flagged(3L) == (1L, true))
    val clean = Decontaminate.clean(train, eval, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
    // clean keeps the original schema
    assert(Decontaminate.clean(train, eval, "doc_id", "text", n = 5).columns.toSeq
      == train.columns.toSeq)
  }

  /** Reference span scrub: mark train tokens covered by any window
    * matching an eval n-gram, drop them, keep the rest in order.
    */
  private def bruteScrub(train: Seq[(Long, String)],
                         eval: Seq[(Long, String)], n: Int)
      : Map[Long, (String, Long, Long)] = {
    def tk(t: String) = if (t.trim.isEmpty) Vector.empty[String]
      else t.trim.split("\\s+").toVector
    val evg = eval.flatMap { case (_, t) =>
      tk(t).sliding(n).filter(_.size == n).map(_.mkString(" ")) }.toSet
    train.map { case (id, t) =>
      val ts = tk(t)
      val starts = ts.indices.filter(s => s + n <= ts.size &&
        evg(ts.slice(s, s + n).mkString(" "))).toSet
      val covered = ts.indices.filter(p =>
        (math.max(0, p - n + 1) to p).exists(starts)).toSet
      val kept = ts.indices.filterNot(covered).map(ts)
      id -> ((kept.mkString(" "), ts.size.toLong, covered.size.toLong))
    }.toMap
  }

  test("scrubSpans: eval-matching windows vanish from train text, " +
      "clean remainder survives in order; brute parity; partition " +
      "invariance") {
    val train = Seq(
      1L -> "intro alpha beta gamma delta epsilon tail words",
      2L -> "one two three four five six seven",
      3L -> "alpha beta gamma delta epsilon", // fully covered
      4L -> "  ")
    val eval = Seq(
      100L -> "alpha beta gamma delta epsilon final")
    def run(parts: Int) = Decontaminate.scrubSpans(
        train.toDF("doc_id", "text").repartition(parts),
        eval.toDF("doc_id", "text"), "doc_id", "text", n = 5)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val got = run(1)
    assert(got == bruteScrub(train, eval, 5))
    assert(got(1L)._1 == "intro tail words" && got(1L)._3 == 5L)
    assert(got(2L) == (("one two three four five six seven", 7L, 0L)))
    assert(got(3L) == (("", 5L, 5L)))
    assert(got(4L) == (("", 0L, 0L)))
    assert(run(7) == got)
  }

  test("decontaminate: minHits threshold requires that many shared shingles") {
    val train = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val eval = Seq((9L, "a b c d e f")).toDF("doc_id", "text") // 4 shared 3-grams
    def hits(minHits: Int) =
      Decontaminate.flagContaminated(train, eval, "doc_id", "text", n = 3, minHits = minHits)
        .select("contaminated").as[Boolean].head()
    assert(hits(4))
    assert(!hits(5))
  }

  test("repetition stats: ratios match hand computation") {
    val docs = Seq(
      (1L, "spam spam spam spam"),        // all dup; top bigram "spam spam" x3
      (2L, "all words here are distinct") // no repetition
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text", n = 2)
      .collect().map(row => row.getLong(0) -> row).toMap
    val spam = r(1L)
    assert(spam.getAs[Int]("n_tokens") == 4)
    assert(spam.getAs[Double]("dup_token_ratio") == 0.75) // 1 - 1/4
    assert(spam.getAs[Long]("top_ngram_count") == 3L)
    assert(spam.getAs[Double]("top_ngram_ratio") == 1.0)  // capped 3*2/4
    val clean = r(2L)
    assert(clean.getAs[Double]("dup_token_ratio") == 0.0)
    assert(clean.getAs[Long]("top_ngram_count") == 1L)
    assert(clean.getAs[Double]("top_ngram_ratio") == 0.4) // 1*2/5
  }

  test("repetition stats: doc shorter than n yields its single partial gram") {
    val r = TextAnalysis.repetitionStats(
      Seq((1L, "solo")).toDF("doc_id", "text"), "doc_id", "text", n = 2).head()
    assert(r.getAs[Long]("top_ngram_count") == 1L)
    assert(r.getAs[Double]("top_ngram_ratio") == 1.0) // capped
  }

  test("pii scrub: redacts emails, phones and id runs; counts on original") {
    val docs = Seq(
      (1L, "mail bob.smith+x@corp.example.org or call 415-555-0199 acct 123456789 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co and c.d@e-f.org plus 12345678 short digits")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(docs, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Int]("n_emails") == 1 && r1.getAs[Int]("n_phones") == 1
      && r1.getAs[Int]("n_ids") == 1)
    assert(r1.getAs[String]("scrubbed")
      == "mail <EMAIL> or call <PHONE> acct <ID> ok")
    val r2 = out(2L)
    assert(r2.getAs[Int]("n_emails") == 0 && r2.getAs[String]("scrubbed") == "no pii here at all")
    val r3 = out(3L)
    assert(r3.getAs[Int]("n_emails") == 2)
    assert(r3.getAs[Int]("n_ids") == 0) // 8 digits: below the id-run floor
    assert(r3.getAs[String]("scrubbed")
      == "two mails <EMAIL> and <EMAIL> plus 12345678 short digits")
  }

  test("stratified sample: per-stratum rates, deterministic, partition-independent") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "big" else "small"))
      .toDF("doc_id", "source")
    val s = Sampling.stratifiedSample(docs, "source", "doc_id",
      Map("big" -> 0.2, "small" -> 0.8))
    val rates = s.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(rates("big") / 2000.0 - 0.2) < 0.05, rates.toString)
    assert(math.abs(rates("small") / 2000.0 - 0.8) < 0.05, rates.toString)
    // decision is a pure row function: repartitioned input, same sample
    val again = Sampling.stratifiedSample(docs.repartition(13), "source", "doc_id",
      Map("big" -> 0.2, "small" -> 0.8))
      .select("doc_id").as[Long].collect().toSet
    assert(again == s.select("doc_id").as[Long].collect().toSet)
    // unlisted strata drop by default; different seed, different sample
    val withDefault = Sampling.stratifiedSample(docs, "source", "doc_id",
      Map("big" -> 0.2))
    assert(withDefault.filter($"source" === "small").count() == 0)
    val otherSeed = Sampling.stratifiedSample(docs, "source", "doc_id",
      Map("big" -> 0.2, "small" -> 0.8), seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(otherSeed != again)
  }

  test("hash split: complete, disjoint, near-target fractions, repartition-stable") {
    val docs = (0L until 5000L).map(i => Tuple1(i)).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s = Sampling.hashSplit(docs, "doc_id", splits)
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 5000L) // complete and disjoint
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.03, counts.toString)
    assert(math.abs(counts("val") / 5000.0 - 0.1) < 0.02, counts.toString)
    // pure row function: identical assignment after repartition
    val again = Sampling.hashSplit(docs.repartition(17), "doc_id", splits)
      .as[(Long, String)].collect().toMap
    assert(again == s.as[(Long, String)].collect().toMap)
    // different seed reshuffles membership
    val reseeded = Sampling.hashSplit(docs, "doc_id", splits, seed = 7L)
      .as[(Long, String)].collect().toMap
    assert(reseeded != again)
  }

  test("strip markup: scripts/styles elided, tags dropped, entities decoded once") {
    val docs = Seq(
      (1L, "<p>Hello <b>world</b></p><script>evil()</script>"),
      (2L, "a &amp;lt; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;"),
      (3L, "plain   text with    spaces"),
      (4L, "<style type=\"css\">p{}</style>keep<br/>this")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripMarkup(docs, "text")
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(got(1L) == "Hello world")
    // &amp;lt; decodes ONE level to &lt; — never double-decodes to <
    assert(got(2L) == "a &lt; b <tag> \"q\" 's'")
    assert(got(3L) == "plain text with spaces")
    assert(got(4L) == "keep this")
  }

  test("group quota: deterministic per-group cap with full audit") {
    val docs = Seq(
      (10L, "s1"), (11L, "s1"), (12L, "s1"),
      (20L, "s2"), (21L, "s2")
    ).toDF("doc_id", "source")
    val q = Sampling.groupQuota(docs, "source", "doc_id", cap = 2)
    val kept = q.filter(col("quota_kept")).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 11L, 20L, 21L))
    val ranks = q.collect().map(r => r.getLong(0) -> r.getAs[Int]("src_rank")).toMap
    assert(ranks(10L) == 1 && ranks(12L) == 3 && ranks(20L) == 1)
    assert(q.count() == docs.count()) // audit keeps every row
  }

  test("quantile gate: exact rank variant keeps ceil(fraction*n) per group") {
    // group A: 6 rows, scores 10..60 -> keep ceil(1.5)=2 (60, 50);
    // group B: 3 rows with a TIE at the cutoff -> doc_id breaks it
    val df = Seq(
      ("A", 1L, 10.0), ("A", 2L, 20.0), ("A", 3L, 30.0),
      ("A", 4L, 40.0), ("A", 5L, 50.0), ("A", 6L, 60.0),
      ("B", 7L, 5.0), ("B", 8L, 5.0), ("B", 9L, 1.0))
      .toDF("source", "doc_id", "score")
    val kept = Sampling.topFractionByGroup(df, "source", "score", "doc_id", 0.25)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    // A: ceil(6*0.25)=2 -> ids 6,5; B: ceil(3*0.25)=1 -> tie 5.0/5.0
    // broken by doc_id asc -> id 7
    assert(kept == Set(6L, 5L, 7L))
  }

  test("quantile gate: randomized parity with an independent reference") {
    // 3 seeds x (random groups, duplicate-heavy scores): the engine's
    // kept set must equal a plain-Scala reimplementation of
    // "top ceil(f*n) by (score desc, id asc)"
    for (seed <- Seq(1, 2, 3)) {
      val rng = new scala.util.Random(seed)
      val rows = (0L until 300L).map(i =>
        (s"s${rng.nextInt(5)}", i, rng.nextInt(40).toDouble))
      val expect = rows.groupBy(_._1).flatMap { case (_, g) =>
        val k = math.ceil(g.size * 0.3).toLong
        g.sortBy(r => (-r._3, r._2)).take(k.toInt)
      }.map(_._2).toSet
      val got = Sampling.topFractionByGroup(
          rows.toDF("source", "doc_id", "score"),
          "source", "score", "doc_id", 0.3)
        .filter(col("kept")).select("doc_id").as[Long].collect().toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("quantile gate: threshold scale variant tracks the exact gate") {
    // 400 rows, 2 sources, distinct scores: the approx-quantile
    // threshold keeps ~top 25% per source and agrees with the exact
    // gate away from the boundary
    val df = (0L until 400L).map(i =>
      (if (i % 2 == 0) "web" else "book", i, (i * 7919 % 401).toDouble))
      .toDF("source", "doc_id", "score")
    val exact = Sampling.topFractionByGroup(df, "source", "score", "doc_id", 0.25)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    val approx = Sampling.thresholdGateByGroup(df, "source", "score", 0.75)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    // per-source kept counts within one row of exact
    assert(math.abs(approx.size - exact.size) <= 2,
      s"approx ${approx.size} vs exact ${exact.size}")
    // high-score core agrees: any exact-kept row whose score clears
    // every source's threshold must be approx-kept
    assert((exact -- approx).size <= 2)
    // both gates keep strict supersets of the very top rows
    val topRows = df.filter(col("score") >= 390).select("doc_id")
      .as[Long].collect().toSet
    assert(topRows.subsetOf(exact) && topRows.subsetOf(approx))
  }

  test("temperature mix: alpha endpoints, flattening, determinism") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val n = d.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val nMin = n.values.min

    // alpha=1: natural distribution — every row kept
    val a1 = Sampling.temperatureSample(d, "source", "doc_id", alpha = 1.0)
    assert(a1.filter(!col("mix_kept")).count() == 0)

    // alpha=0.5: smallest source keeps everything; each source's
    // threshold is exactly floor(sqrt(nmin/ns) * 2^20)
    val a05 = Sampling.temperatureSample(d, "source", "doc_id", alpha = 0.5)
    val thresholds = a05.select("source", "keep_below").distinct()
      .as[(String, Long)].collect().toMap
    for ((s, ns) <- n) {
      val expect = math.floor(math.sqrt(nMin.toDouble / ns) * 1048576L).toLong
      assert(thresholds(s) == expect, s"threshold for $s")
    }
    val minSource = n.minBy(_._2)._1
    assert(a05.filter(col("source") === minSource && !col("mix_kept"))
      .count() == 0, "smallest source fully kept")

    // alpha=0: expected kept counts flatten toward n_min — every
    // source's keep rate is n_min/n_s, so realized counts concentrate
    // near n_min (hash Bernoulli, generous 3-sigma-ish bound)
    val a0 = Sampling.temperatureSample(d, "source", "doc_id", alpha = 0.0)
    val kept0 = a0.filter(col("mix_kept")).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    for ((s, k) <- kept0) {
      val sd = 3 * math.sqrt(nMin.toDouble) + 3
      assert(math.abs(k - nMin) <= sd, s"$s kept $k vs flat target $nMin")
    }

    // decisions are a pure row function: repartitioning changes nothing
    val again = Sampling.temperatureSample(d.repartition(13), "source", "doc_id", alpha = 0.5)
      .select("doc_id", "mix_kept")
    assert(a05.select("doc_id", "mix_kept").exceptAll(again).isEmpty)
  }

  test("epoch shuffle: reproducible keys, distinct permutations per epoch") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val e0 = Sampling.epochShuffle(d, "doc_id", 0)
      .select("doc_id", "shuffle_key")
    val e0again = Sampling.epochShuffle(d.repartition(9), "doc_id", 0)
      .select("doc_id", "shuffle_key")
    assert(e0.exceptAll(e0again).isEmpty, "partition-independent keys")
    val o0 = e0.orderBy("shuffle_key", "doc_id")
      .select("doc_id").as[Long].collect()
    val o1 = Sampling.epochShuffle(d, "doc_id", 1)
      .orderBy("shuffle_key", "doc_id").select("doc_id").as[Long].collect()
    assert(o0.sorted.toSeq == o1.sorted.toSeq, "same row set")
    // not merely different: DECORRELATED. The first implementation
    // appended the epoch as a hashed suffix character — the polynomial
    // hash is affine in any one character, so every key shifted by the
    // same constant and the "new" permutation was bit-identical. The
    // Lehmer scramble must move most rows to genuinely new positions.
    val moved = o0.zip(o1).count { case (a, b) => a != b }
    assert(moved > o0.length / 2,
      s"epochs decorrelate: only $moved/${o0.length} positions changed")
  }

  test("dupSpans: interval union of cross-doc shared windows, hand-checked") {
    val docs = Seq(
      (1L, "a b c d e f g h"),            // shares "c d e f" with doc 2
      (2L, "x y c d e f z w"),
      (3L, "p q r p q r p q r"),          // fully self-repeating
      (4L, "totally unique words only here")
    ).toDF("doc_id", "text")
    val out = graft.core.TextAnalysis.dupSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    // docs 1/2: flagged windows at pos 2 ("c d e") and 3 ("d e f");
    // union covers exactly the 4 shared tokens
    Seq(0, 1).foreach { i =>
      assert(out(i).getAs[Long]("n_dup_windows") == 2L)
      assert(out(i).getAs[Long]("dup_tokens") == 4L)
      assert(out(i).getAs[Double]("dup_ratio") == 0.5)
    }
    // doc 3: every window repeats internally -> full coverage
    assert(out(2).getAs[Long]("dup_tokens") == 9L)
    assert(out(2).getAs[Double]("dup_ratio") == 1.0)
    // doc 4: clean
    assert(out(3).getAs[Long]("n_dup_windows") == 0L)
    assert(out(3).getAs[Long]("dup_tokens") == 0L)
    assert(out(3).getAs[Double]("dup_ratio") == 0.0)
    // window bookkeeping: len-n+1 full windows
    assert(out(0).getAs[Long]("n_windows") == 6L)
  }

  test("dupSpans: short docs clamp coverage to the doc length") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = graft.core.TextAnalysis.dupSpans(docs, "doc_id", "text", n = 5)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_windows") == 1L) // one truncated window
      assert(r.getAs[Long]("dup_tokens") == 2L) // clamped, not 5
      assert(r.getAs[Double]("dup_ratio") == 1.0)
    }
  }

  test("scrubDupSpans: first occurrence survives intact, later ones lose " +
      "the span, self-repeats keep only the leading copy") {
    val docs = Seq(
      (1L, "a b c d e f g h"),            // shares "c d e"/"d e f" with doc 2
      (2L, "x y c d e f z w"),
      (3L, "p q r p q r p q r"),          // fully self-repeating
      (4L, "totally unique words only here")
    ).toDF("doc_id", "text")
    val out = graft.core.TextAnalysis.scrubDupSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    // doc 1 holds the globally-first copy of both shared windows
    assert(out(0).getAs[Long]("n_removed") == 0L)
    assert(out(0).getAs[String]("text_scrubbed") == "a b c d e f g h")
    // doc 2 loses the union of the two non-first spans (tokens 2..5)
    assert(out(1).getAs[Long]("n_kept") == 4L)
    assert(out(1).getAs[String]("text_scrubbed") == "x y z w")
    // doc 3: windows at pos 3..6 are repeats of pos 0..2's — the
    // removal union covers tokens 3..8, one leading period survives
    assert(out(2).getAs[String]("text_scrubbed") == "p q r")
    assert(out(2).getAs[Long]("n_removed") == 6L)
    // clean doc untouched
    assert(out(3).getAs[Long]("n_removed") == 0L)
    assert(out(3).getAs[String]("text_scrubbed") ==
      "totally unique words only here")
  }

  test("scrubDupSpans: a doc fully covered by a non-first truncated window " +
      "survives as an empty row, not a dropped one") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = graft.core.TextAnalysis.scrubDupSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_scrubbed") == "tiny doc")
    assert(out(1).getAs[String]("text_scrubbed") == "")
    assert(out(1).getAs[Long]("n_kept") == 0L)
    assert(out(1).getAs[Long]("n_removed") == 2L)
  }

  test("topVocab + oovRate: deterministic head vocabulary, exact " +
      "fixed-point OOV share per group") {
    val docs = Seq(
      ("web", "the cat sat on the mat"),
      ("web", "the dog sat"),
      ("code", "zz yy xx the")
    ).toDF("source", "text")
    // counts: the=4, sat=2, rest 1 each; top-3 tie among the 1-count
    // tokens breaks asc -> "cat"
    val vocab = graft.core.TextAnalysis.topVocab(docs, "text", size = 3)
      .as[String].collect().toSet
    assert(vocab == Set("the", "sat", "cat"))
    val out = graft.core.TextAnalysis
      .oovRate(docs, "source", "text",
        graft.core.TextAnalysis.topVocab(docs, "text", size = 3))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
         r.getAs[Long]("oov_micro"))).toMap
    // web: 9 tokens, oov = {on, mat, dog} = 3 -> 333333
    assert(out("web") == ((9L, 3L, 333333L)))
    // code: 4 tokens, oov = {zz, yy, xx} = 3 -> 750000
    assert(out("code") == ((4L, 3L, 750000L)))
  }

  test("chunkByTokens: overlap windows with provenance, tail clamps, " +
      "empty text is one empty chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(docs, "doc_id", "text",
        size = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens",
        "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // step 3: starts 0,3,6,9 — last chunk clamps to one token
    assert(got == Seq(
      (1L, 0L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 3L, 4L, "w4 w5 w6 w7"),
      (1L, 2L, 6L, 4L, "w7 w8 w9 w10"),
      (1L, 3L, 9L, 1L, "w10"),
      (2L, 0L, 0L, 1L, "")))
    // consecutive chunks share exactly `overlap` tokens
    got.filter(_._1 == 1L).sliding(2).foreach {
      case Seq(a, b) =>
        val at = a._5.split(" ").toSeq; val bt = b._5.split(" ").toSeq
        assert(at.takeRight(1) == bt.take(1), s"overlap broken: $a $b")
      case _ => ()
    }
  }

  test("spanCorrupt: pure function of the data (partition-invariant), " +
      "sentinel/count arithmetic holds, zero rate is the identity") {
    val docs = (0L until 40L).map(i =>
      (i, (1 to 60).map(j => s"t${(i * 7 + j) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TextAnalysis.spanCorrupt(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "n_masked", "n_spans", "corrupted_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val b = TextAnalysis.spanCorrupt(docs.repartition(7), "doc_id", "text")
      .select("doc_id", "n_tokens", "n_masked", "n_spans", "corrupted_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b, "corruption must not depend on partitioning")
    a.foreach { case (id, n, m, s, txt) =>
      assert(n == 60L)
      val sentinels = "<X\\d+>".r.findAllIn(txt).toSeq
      assert(sentinels.size.toLong == s, s"doc $id sentinel count")
      assert(sentinels == (0 until s.toInt).map(k => s"<X$k>"),
        s"doc $id sentinels in order")
      // surviving tokens + one sentinel per run
      val outToks = if (txt.isEmpty) 0L else txt.split(" ").length.toLong
      assert(outToks == n - m + s, s"doc $id length arithmetic")
      assert(m >= s, "a run has at least one token")
    }
    // some masking must actually happen at the default 5% seed rate
    assert(a.map(_._3).sum > 0L)
    // zero start rate: nothing masked, text passes through re-joined
    val id0 = TextAnalysis.spanCorrupt(docs, "doc_id", "text",
        startPermille = 0)
      .select("doc_id", "n_masked", "n_spans", "corrupted_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val orig = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
    id0.zip(orig).foreach { case ((i, m, s, txt), (oi, otxt)) =>
      assert(i == oi && m == 0L && s == 0L && txt == otxt)
    }
  }

  test("PMI collocation score (q144 shape): exclusive rare pair " +
      "outranks a frequent pair of frequent words") {
    // "x y" co-occur exclusively (c_xy=c_x=c_y=5); "a b" is twice as
    // frequent but a/b are individually common. N = 30 tokens.
    // score(x,y) = 5*30e6/25 = 6,000,000 > score(a,b) = 10*30e6/100
    val docs = ((1 to 10).map(i => (i.toLong, "a b")) ++
      (11 to 15).map(i => (i.toLong, "x y"))).toDF("doc_id", "text")
    val toks = docs.select(TextAnalysis.tokens(col("text")).as("a"))
    val uni = toks.select(explode(col("a")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").as("n_total"))
    val bi = toks.filter(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 5)
    val scored = bi
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y"), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("score_micro",
        expr("c_xy * n_total * 1000000 DIV (c_x * c_y)"))
      .select("w1", "w2", "c_xy", "score_micro")
      .as[(String, String, Long, Long)].collect().sortBy(-_._4).toSeq
    assert(scored == Seq(
      ("x", "y", 5L, 6000000L),
      ("a", "b", 10L, 3000000L)))
  }

  test("column profile (q148 shape): null counting, distinct over " +
      "non-nulls, top-value tie resolves to the lexicographically " +
      "smallest") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(Some("b"), Some("b"), Some("a"), Some("a"), None)
      .toDF("v")
    val stats = df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(col("v")).as("n_distinct"))
    val w = Window.orderBy(desc("cnt"), asc("v"))
    val top = df.filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("v").as("top_value"), col("cnt").as("top_count"))
    val got = stats.crossJoin(top)
      .as[(Long, Long, Long, String, Long)].head()
    // "a" and "b" both appear twice: the tie picks "a"
    assert(got == ((5L, 1L, 2L, "a", 2L)))
  }

  test("greedy decode (q149 shape): argmax chain cycles to 10 steps, " +
      "dead end stays put, count tie picks the lex-smallest successor") {
    import org.apache.spark.sql.expressions.Window
    val docs = Seq("a b", "a b", "a c", "b c", "c a", "x y", "t u", "t s")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val toks = docs.select(TextAnalysis.tokens(col("text")).as("a"))
    val bi = toks.filter(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val wN = Window.partitionBy("w1").orderBy(desc("c_xy"), asc("w2"))
    val nextTok = bi.withColumn("r", row_number().over(wN))
      .filter(col("r") === 1)
      .select(col("w1").as("cur"), col("w2").as("nw"))
    val starts = toks.select(explode(col("a")).as("w")).distinct()
    var walk = starts.select(col("w").as("start_token"),
      col("w").as("cur"), col("w").as("gen_path"))
    for (_ <- 1 to 10) {
      walk = walk.join(broadcast(nextTok), Seq("cur"), "left")
        .withColumn("gen_path", when(col("nw").isNotNull,
          concat(col("gen_path"), lit(">"), col("nw")))
          .otherwise(col("gen_path")))
        .withColumn("cur", coalesce(col("nw"), col("cur")))
        .drop("nw")
    }
    val got = walk.select("start_token", "gen_path")
      .as[(String, String)].collect().toMap
    // a->b (count 2 beats a->c), b->c, c->a: the 3-cycle runs all 10
    assert(got("a") == "a>b>c>a>b>c>a>b>c>a>b")
    // y has no successor: the walk never leaves the start
    assert(got("y") == "y")
    assert(got("x") == "x>y")
    // t->s and t->u both count 1: lex-smallest successor s wins
    assert(got("t") == "t>s")
  }

  test("corpus card (q150 shape): keep-first dup count, token sums, " +
      "majority language with lex tie-break") {
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      (1L, "same text", "en", "s1"),
      (2L, "same text", "de", "s1"),   // exact dup of doc 1
      (3L, "one two three", "en", "s1"),
      (4L, "hello", "fr", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val wDup = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    val flagged = docs
      .withColumn("n_toks", size(TextAnalysis.tokens(col("text"))).cast("long"))
      .withColumn("dup", row_number().over(wDup) > 1)
    val stats = flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
      sum(when(col("dup"), 1L).otherwise(0L)).as("n_exact_dup"),
      countDistinct(col("lang")).as("n_langs"))
    val wTop = Window.partitionBy("source").orderBy(desc("c"), asc("lang"))
    val topLang = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(wTop)).filter(col("r") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    val got = stats.join(topLang, "source")
      .as[(String, Long, Long, Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    // s1: 3 docs, 2+2+3 tokens, doc 2 is the dup, langs {en, de},
    // en (2 docs) is the majority; s2: singleton fr
    assert(got == Seq(
      ("s1", 3L, 7L, 1L, 2L, "en"),
      ("s2", 1L, 1L, 0L, 1L, "fr")))
  }

  test("zipf spectrum: frequency-of-frequencies with deterministic examples") {
    // corpus: a a a b b c d -> c=3:{a}, c=2:{b}, c=1:{c,d}
    val docs = Seq("a a a b", "b c d").toDF("text")
    val uni = docs
      .select(explode(graft.core.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val got = uni.groupBy("c")
      .agg(count(lit(1)).as("n_types"), min("w").as("example_token"))
      .select(col("c"), col("n_types"), expr("c * n_types").as("n_tokens"),
        col("example_token"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 2L, "c"), (2L, 1L, 2L, "b"),
      (3L, 1L, 3L, "a")))
    assert(got.map(_._3).sum == 7L) // spectrum conserves token mass
  }

  test("token entropy: uniform = ln k, degenerate = 0, ordered fold") {
    val docs = Seq(("u", "x y"), ("d", "z z z z")).toDF("source", "text")
    val uni = docs
      .select(col("source"),
        explode(graft.core.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val got = uni.groupBy("source")
      .agg(sum("c").as("n_tokens"),
        expr("transform(sort_array(collect_list(struct(w, c))), e -> e.c)")
          .as("cs"))
      .select(col("source"), expr(
        """aggregate(cs, 0D, (a, c) ->
          |  a - (CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE))
          |      * ln(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE)))"""
          .stripMargin).as("h"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("u") - math.log(2.0)) < 1e-12)
    assert(got("d") == 0.0)
  }

  test("source KL: identical source = minimal, skewed source larger") {
    // s_same dominates the corpus (so the mix ~= s_same); s_skew
    // speaks a different token entirely -> far from the mix. (With
    // two EQUAL sources the corpus average sits closer to the skewed
    // one - the first fixture draft got that backwards.)
    val docs = Seq(("s_same", "x y x y x y"), ("s_skew", "z z"))
      .toDF("source", "text")
    val toks = docs.select(col("source"),
      explode(graft.core.TextAnalysis.tokens(col("text"))).as("w"))
    val corpus = toks.groupBy("w").agg(count(lit(1)).as("cc"))
    val bySrc = toks.groupBy("source", "w").agg(count(lit(1)).as("sc"))
    val grid = corpus.crossJoin(toks.select("source").distinct())
      .join(bySrc, Seq("source", "w"), "left")
      .withColumn("sc", coalesce(col("sc"), lit(0L)))
    val kl = grid.groupBy("source")
      .agg(sum("sc").as("n_src"), sum("cc").as("n_corpus"),
        count(lit(1)).as("v"),
        expr("transform(sort_array(collect_list(struct(w, sc, cc))), " +
          "e -> struct(e.sc AS sc, e.cc AS cc))").as("cs"))
      .select(col("source"), expr(
        """aggregate(cs, 0D, (a, e) ->
          |  a + (CAST(e.sc + 1 AS DOUBLE) / CAST(n_src + v AS DOUBLE))
          |      * ln((CAST(e.sc + 1 AS DOUBLE) / CAST(n_src + v AS DOUBLE))
          |          / (CAST(e.cc + 1 AS DOUBLE)
          |             / CAST(n_corpus + v AS DOUBLE))))""".stripMargin)
        .as("kl"))
      .as[(String, Double)].collect().toMap
    assert(kl("s_skew") > kl("s_same"))
    assert(kl("s_same") >= 0.0 && kl("s_skew") > 0.0)
  }

  test("gopher battery: each rule trips on its designed violation") {
    def counts(text: String): (Long, Long, Long, Long, Long) = {
      val t = text.trim.split("\\s+")
      (t.length.toLong, text.replaceAll("\\s+", "").length.toLong,
        t.count(graft.core.TextAnalysis.StopWords.contains).toLong,
        t.distinct.length.toLong, t.count(_.length == 1).toLong)
    }
    // 40 in-vocab words with stopwords -> passes every rule
    val good = (Seq.fill(20)("the table") :+ "scan").mkString(" ")
    val (nw, nc, ns, nu, nsh) = counts(good)
    assert(nw >= 30 && nc >= 3 * nw && nc <= 10 * nw && ns >= 2)
    // designed violations
    val short = "too few words here"                      // r_len
    assert(counts(short)._1 < 30)
    val repeats = Seq.fill(40)("spark").mkString(" ")      // r_uniq
    val (rw, _, _, ru, _) = counts(repeats)
    assert(ru * 1000000 / rw < 300000)
    val singles = Seq.fill(40)("a").mkString(" ")          // r_short+r_mwl
    val (sw, sc, _, _, ssh) = counts(singles)
    assert(ssh * 10 > sw && sc < 3 * sw)
  }

  test("vocab coverage: rank order, running mass, closes at 1e6") {
    import org.apache.spark.sql.expressions.Window
    // a a a b b c -> ranks a(3), b(2), c(1); cum 3,5,6 of 6
    val docs = Seq("a a a b", "b c").toDF("text")
    val uni = docs
      .select(explode(graft.core.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val wRank = Window.orderBy(desc("c"), asc("w"))
    val got = uni.withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("cum",
        sum("c").over(wRank.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(uni.agg(sum("c").as("total"))))
      .select(col("rank"), col("w"), col("cum"),
        expr("cum * 1000000 DIV total").as("share"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 3L, 500000L), (2L, "b", 5L, 833333L),
      (3L, "c", 6L, 1000000L)))
  }

  test("contextWindows: hits with provenance, edge clamps, multi-hit") {
    import graft.core.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta hit gamma delta"),
      (2L, "hit one two three four five hit"),
      (3L, "no occurrences here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.contextWindows(docs, "text", "hit", radius = 2)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 3L, "alpha beta hit gamma delta"),  // interior: full ±2
      (2L, 1L, "hit one two"),                 // left edge clamps
      (2L, 7L, "four five hit")),              // right edge clamps
      s"$got")
  }

  test("skeletonDupGroups: homoglyphs, invisibles and case collide; " +
    "byte-exact dedup would miss all three") {
    val docs = Seq(
      1L -> "free crypto bonus",
      2L -> "frее crypto bonus",          // Cyrillic е twice
      3L -> "free cry\u200Bpto bonus", // zero-width space
      4L -> "FREE Crypto Bonus",                    // case only
      5L -> "совершенно другой текст",              // unrelated
      6L -> "free crypto bonus offer")              // NOT a dup (longer)
      .toDF("doc_id", "text")
    val got = TextAnalysis.skeletonDupGroups(docs, "doc_id", "text")
      .select("survivor_id", "n_members", "n_variants")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 4L)))
    // all four raws differ byte-wise, so n_variants == n_members
    // and q17-style exact dedup sees four singletons
  }

  test("confusableSkeleton: Greek lookalikes and soft hyphen") {
    val got = Seq(("\u03B1lph\u03B1 s\u00ADoft", 0))
      .toDF("t", "x")
      .select(TextAnalysis.confusableSkeleton($"t"))
      .as[String].head()
    assert(got == "alpha soft")
  }

  test("distinctN: hand-checked diversity ratios; templated source " +
      "scores low; short docs contribute nothing") {
    import graft.core.TextAnalysis
    val docs = Seq(
      // diverse source: every bigram unique across docs
      ("div", "alpha beta gamma delta"),
      ("div", "epsilon zeta eta theta"),
      // templated source: one doc repeated 3x
      ("tpl", "the same old template text"),
      ("tpl", "the same old template text"),
      ("tpl", "the same old template text"),
      // short/blank docs: no bigrams
      ("tpl", "one"),
      ("empty", ""),
      ("empty", "solo")).toDF("source", "text")
    val got = TextAnalysis.distinctN(docs, col("source"), col("text"), n = 2)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // div: 2 docs x 3 bigrams, all distinct
    assert(got("div") == (("div", 6L, 6L, 1000000L)))
    // tpl: 3 x 4 = 12 occurrences of 4 distinct bigrams
    assert(got("tpl") == (("tpl", 12L, 4L, 333333L)))
    // empty source has zero grams -> absent
    assert(!got.contains("empty"))
    // partition invariance
    val re = TextAnalysis.distinctN(docs.repartition(5), col("source"),
        col("text"), n = 2)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(re == got)
  }

  test("scrubCards: Luhn separates valid cards from random digit runs; " +
      "separator-tolerant; redaction replaces only valid candidates") {
    import graft.core.TextAnalysis
    val docs = Seq(
      (1L, "pay with 4111111111111111 now"),
      (2L, "ref 4111111111111112 is not a card"),
      (3L, "amex 378282246310005 and spaced 5500 0055 5555 5559"),
      (4L, "dashed 5500-0055-5555-5559 works"),
      (5L, "short 123456 and phone 555-123-4567 untouched"),
      (6L, "no digits at all")).toDF("doc_id", "text")
    val got = TextAnalysis.scrubCards(docs, "text")
      .select("doc_id", "n_card_candidates", "n_cards_valid", "scrubbed")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1L && got(1L)._3 == 1L)
    assert(got(1L)._4 == "pay with <CARD> now")
    assert(got(2L)._2 == 1L && got(2L)._3 == 0L)
    assert(got(2L)._4.contains("4111111111111112")) // invalid left intact
    assert(got(3L)._3 == 2L)
    assert(got(3L)._4 == "amex <CARD> and spaced <CARD>")
    assert(got(4L)._3 == 1L && got(4L)._4 == "dashed <CARD> works")
    assert(got(5L)._2 == 0L &&
      got(5L)._4 == "short 123456 and phone 555-123-4567 untouched")
    assert(got(6L) == ((6L, 0L, 0L, "no digits at all")))
  }

  test("scrubCards: redaction is anchored to non-digit boundaries — a " +
      "valid card's digits inside a longer unmatched run stay intact; " +
      "adjacent occurrences all redact") {
    import graft.core.TextAnalysis
    val docs = Seq(
      // the valid card ALSO occurs embedded in a 20-digit account id:
      // the id's run was extracted as a different (invalid, 19-digit)
      // candidate, so only the standalone occurrence may be redacted
      (1L, "acct 94111111111111111123 card 4111111111111111 end"),
      // three adjacent occurrences separated by single commas (a
      // space would be eaten by the separator-tolerant candidate
      // regex) — the first replace pass consumes each comma; the
      // second pass must still catch the survivors
      (2L, "4111111111111111,4111111111111111,4111111111111111"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.scrubCards(docs, "text")
      .select("doc_id", "n_card_candidates", "n_cards_valid", "scrubbed")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 2L && got(1L)._3 == 1L)
    assert(got(1L)._4 == "acct 94111111111111111123 card <CARD> end")
    assert(got(2L)._3 == 3L && got(2L)._4 == "<CARD>,<CARD>,<CARD>")
  }

  test("loopDetect: trailing cycles found at their fundamental period; " +
      "clean prose and blank docs stay unflagged") {
    import graft.core.TextAnalysis
    val docs = Seq(
      (1L, "normal start then end end end end"),          // p=1 x4
      (2L, "prefix is a good idea is a good idea is a good idea"), // p=4 x3
      (3L, "perfectly ordinary text with no repetition at all"),
      (4L, "ab ab ab ab ab ab"),                           // p=1 x6 ("ab" token)
      (5L, ""),
      (6L, "one two one two one two"))                     // p=2 x3
      .toDF("doc_id", "text")
    val got = TextAnalysis.loopDetect(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._3 == 1L && got(1L)._4 == 4L && got(1L)._5)
    assert(got(2L)._3 == 4L && got(2L)._4 == 3L && got(2L)._5)
    assert(!got(3L)._5 && got(3L)._4 <= 2L)
    assert(got(4L)._3 == 1L && got(4L)._4 == 6L && got(4L)._5)
    assert(!got(5L)._5)
    assert(got(6L)._3 == 2L && got(6L)._4 == 3L && got(6L)._5)
  }
}
