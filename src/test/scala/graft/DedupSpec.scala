package graft

import graft.core.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different text with other words here entirely")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per distinct text") {
    val kept = Dedup.dropExactDups(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .filter($"n_copies" > 1).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("keep_id") == 1L)
  }

  test("ngram jaccard: identical docs = 1.0, near dups high, distinct absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0.3 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keys.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minhash LSH: exact dups collide on every band with est_jaccard 1.0") {
    val cand = Dedup.lshCandidates(docs, "doc_id", "text", k = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(cand((1L, 2L)) == 1.0)
  }

  test("simhash: identical texts identical hash; near dups close in hamming") {
    val hashed = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(hashed(1L) == hashed(2L))
    val nearDist = java.lang.Long.bitCount(hashed(1L) ^ hashed(3L))
    val farDist = java.lang.Long.bitCount(hashed(1L) ^ hashed(4L))
    assert(nearDist < farDist)
  }

  test("duplicate clusters: chains collapse to min-id components") {
    // components: {1,2,3,4} (chain), {10,11}, isolated pair graph node 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("duplicate clusters: distributed star-contraction path agrees with union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // chain of 6
      (10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val viaDriver = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val viaDistributed = Dedup.duplicateClusters(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDistributed == viaDriver)
    assert(viaDistributed(6L) == 1L) // 5-hop chain fully collapsed
  }

  test("star contraction: 100-hop chain converges in O(log n) rounds") {
    // diameter 100 >> maxIter 12: min-label propagation (one hop per
    // round) would fail; large-star/small-star halves heights per round
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponentsStar(chain, maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 101)
    assert(labels.values.forall(_ == 0L))
  }

  test("star contraction: random graph parity with union-find, reversed ids") {
    val rng = new scala.util.Random(7)
    // ids descending/shuffled so min-id roots aren't positional artifacts
    val raw = (1 to 300).map { _ =>
      (rng.nextInt(120).toLong * 7 + 3, rng.nextInt(120).toLong * 7 + 3)
    }
    val pairs = raw.toDF("doc_a", "doc_b")
    val viaStar = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    val viaDriver = Dedup.duplicateClusters(pairs) // driver union-find path
      .as[(Long, Long)].collect().toMap
    // union-find path skips pure self-loop nodes; star keeps them as
    // their own singleton labels — compare on the union-find domain and
    // check the extras are self-labeled
    viaDriver.foreach { case (doc, lbl) => assert(viaStar(doc) == lbl, s"doc $doc") }
    (viaStar.keySet -- viaDriver.keySet).foreach(d => assert(viaStar(d) == d))
  }

  test("resolveSurvivors: clustered docs keep one survivor, others self-survive") {
    val all = (1L to 6L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("doc_a", "doc_b")
    val r = Dedup.resolveSurvivors(all, "doc_id", pairs)
      .select("doc_id", "survivor_id", "is_survivor")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(r == Set((1L, 1L, true), (2L, 1L, false), (5L, 1L, false),
      (3L, 3L, true), (4L, 4L, true), (6L, 6L, true)))
  }

  test("resolveSurvivorsBy: the longest cluster member survives; " +
      "preference -id reproduces min-id resolution") {
    val all = Seq((1L, "short"), (2L, "the longest text"), (5L, "medium!"),
      (3L, "solo"), (4L, "solo too"), (6L, "x"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("doc_a", "doc_b")
    val byLen = Dedup.resolveSurvivorsBy(all, "doc_id", pairs,
        struct(col("n_chars"), (-col("doc_id")).as("neg")))
      .select("doc_id", "survivor_id", "is_survivor")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(byLen == Set((1L, 2L, false), (2L, 2L, true), (5L, 2L, false),
      (3L, 3L, true), (4L, 4L, true), (6L, 6L, true)))
    // with preference = -id, the policy degenerates to min-id and must
    // agree with resolveSurvivors exactly
    val minId = Dedup.resolveSurvivorsBy(all, "doc_id", pairs, -col("doc_id"))
      .select("doc_id", "survivor_id", "is_survivor")
      .as[(Long, Long, Boolean)].collect().toSet
    val classic = Dedup.resolveSurvivors(all, "doc_id", pairs)
      .select("doc_id", "survivor_id", "is_survivor")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(minId == classic)
  }

  test("resolveSurvivorsBy: length ties break to the LOWEST id") {
    val all = Seq((7L, "same"), (8L, "same"), (9L, "same"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val pairs = Seq((7L, 8L), (8L, 9L)).toDF("doc_a", "doc_b")
    val r = Dedup.resolveSurvivorsBy(all, "doc_id", pairs,
        struct(col("n_chars"), (-col("doc_id")).as("neg")))
      .select("doc_id", "survivor_id").as[(Long, Long)].collect().toSet
    assert(r == Set((7L, 7L), (8L, 7L), (9L, 7L)))
  }

  test("rolling hash is order-sensitive and stable") {
    val h = Seq("ab", "ba", "ab").toDF("s")
      .select(TextAnalysis.rollingHash(col("s")).as("h")).as[Long].collect()
    assert(h(0) != h(1))
    assert(h(0) == h(2))
  }

  // a pathological shared-band corpus: 6 identical "template" docs
  // (every band bucket they occupy has size 6 — the boilerplate
  // pattern that survives exact dedup at web scale when payloads
  // differ, here made exact for determinism) plus one small near-dup
  // pair whose buckets have size 2
  private def templateCorpus = (
    (1L to 6L).map(i =>
      (i, "aaa bbb ccc ddd eee fff ggg hhh iii jjj")) ++ Seq(
      (20L, "the quick brown fox jumps over the lazy dog tonight"),
      (21L, "the quick brown fox jumps over the lazy dog today"))
    ).toDF("doc_id", "text")

  test("lsh maxBandSize: oversized buckets emit no pairs; small buckets unaffected") {
    val uncapped = Dedup.lshCandidates(templateCorpus, "doc_id", "text",
        k = 8, rowsPerBand = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the template cluster fans out all 6*5/2 pairs uncapped
    assert(uncapped.count { case (a, b) => a <= 6 && b <= 6 } == 15)
    val capped = Dedup.lshCandidates(templateCorpus, "doc_id", "text",
        k = 8, rowsPerBand = 2, maxBandSize = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // lower-bound contract: exactly the uncapped pairs minus those
    // that only arise from buckets above the cap
    assert(capped == uncapped.filterNot { case (a, b) => a <= 6 && b <= 6 },
      s"capped $capped vs uncapped $uncapped")
  }

  test("property: capped LSH is a lower bound with unchanged estimates, " +
      "and cap=MaxValue is exact") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      // dup-heavy corpus: a few template clusters + singletons
      val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta", "iota", "kappa")
      var id = 0L
      val docs = (1 to 4).flatMap { c =>
        val base = Seq.fill(8 + rnd.nextInt(6))(words(rnd.nextInt(words.length)))
        val copies = 1 + rnd.nextInt(5)
        (1 to copies).map { _ =>
          id += 1
          // occasional one-word mutation keeps some pairs near- not exact-dup
          val t = if (rnd.nextBoolean()) base
            else base.updated(rnd.nextInt(base.length), words(rnd.nextInt(words.length)))
          (id, t.mkString(" "))
        }
      }.toDF("doc_id", "text")
      def pairs(cap: Int) =
        Dedup.lshCandidates(docs, "doc_id", "text", k = 8, rowsPerBand = 2,
            maxBandSize = cap)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_jaccard"))
          .toMap
      val exact = pairs(Int.MaxValue)
      val uncappedViaWindow = pairs(1000000) // cap present but never binding
      assert(uncappedViaWindow == exact,
        "a non-binding cap must not change the result")
      for (cap <- Seq(2, 3)) {
        val capped = pairs(cap)
        assert(capped.keySet.subsetOf(exact.keySet),
          s"cap=$cap produced pairs absent from the exact result")
        capped.foreach { case (k, v) =>
          assert(v == exact(k), s"cap=$cap changed est_jaccard for $k")
        }
      }
    }
  }

  test("dedupAgainstIndex maxBandSize caps hot index buckets; hint preserves results") {
    val dir = java.nio.file.Files.createTempDirectory("bandidx_cap")
      .toString + "/idx"
    Dedup.writeBandIndex(templateCorpus.filter($"doc_id" <= 6),
      "doc_id", "text", dir)
    val newDocs = Seq(
      (100L, "aaa bbb ccc ddd eee fff ggg hhh iii jjj"), // hits the hot bucket
      (101L, "totally unrelated fresh content never indexed before at all")
    ).toDF("doc_id", "text")
    val uncapped = Dedup.dedupAgainstIndex(spark, newDocs, dir,
      "doc_id", "text")
    assert(uncapped.filter(col("is_dup")).select("doc_id")
      .as[Long].collect().toSet == Set(100L))
    // the 6-doc template bucket exceeds the cap -> dropped from
    // candidate generation; 100 reads clean (documented lower bound)
    val capped = Dedup.dedupAgainstIndex(spark, newDocs, dir,
      "doc_id", "text", maxBandSize = 2)
    assert(capped.filter(col("is_dup")).count() == 0)
    // the size hint changes the join strategy decision input, never
    // the result
    val hinted = Dedup.dedupAgainstIndex(spark, newDocs, dir,
      "doc_id", "text", batchDocsHint = Some(2L))
    assert(hinted.filter(col("is_dup")).select("doc_id")
      .as[Long].collect().toSet == Set(100L))
  }

  test("clusterWeights: chain cluster shares 1e6 by size, singleton " +
      "keeps full weight, partition-invariant") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val w = Dedup.clusterWeights(docs, "doc_id", pairs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(w == Seq(
      (1L, 1L, 3L, 333333L), (2L, 1L, 3L, 333333L),
      (3L, 1L, 3L, 333333L), (4L, 4L, 1L, 1000000L)))
    // expected copies per cluster: sum of weights within 1 ulp-of-DIV
    // of 1e6 (size * (1e6 DIV size) <= 1e6 < that + size)
    w.groupBy(_._2).foreach { case (_, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.size)
    }
    val w7 = Dedup.clusterWeights(docs.repartition(7), "doc_id",
        pairs.repartition(3))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(w7 == w)
  }

  test("containmentPairs: quote detection where Jaccard stays low") {
    // doc 2 = doc 1 (4 tokens) embedded in 12 extra tokens: A's
    // shingles all appear in B -> containment(A in B) = 1e6, while
    // Jaccard is small; doc 3 shares nothing
    val small = "alpha beta gamma delta"
    val big = small + " eins zwei drei vier funf sechs sieben acht " +
      "neun zehn elf zwolf"
    val docs = Seq((1L, small), (2L, big), (3L, "x y z w v u t s r q"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
        thresholdMicro = 900000L)
      .select("doc_a", "doc_b", "n_a", "n_common", "contain_a_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 2L, 1000000L)))
    // the same pair fails a symmetric-Jaccard gate at 0.5
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5).count()
    assert(jac == 0L)
    // threshold respected: disjoint docs never pair
    assert(got.forall(r => r._1 != 3L && r._2 != 3L))
  }

  test("cluster histogram conserves corpus mass; leakage canonicalizes pairs") {
    // 5 docs: {1,2,3} one near-dup cluster, {4},{5} singletons
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "alpha beta gamma delta epsilon theta"),
      (4L, "one two three four five six"),
      (5L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
    val hist = Dedup.resolveSurvivors(docs, "doc_id", pairs)
      .groupBy($"survivor_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .as[(Long, Long)].collect().toMap
    assert(hist == Map(3L -> 1L, 1L -> 2L))
    assert(hist.map { case (sz, n) => sz * n }.sum == 5L) // mass conserved
    // canonical (least, greatest) pair grouping never emits a
    // reversed duplicate row
    val split = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "val"), (5L, "train")).toDF("doc_id", "split")
    val leaks = pairs
      .join(split.select($"doc_id".as("doc_a"), $"split".as("split_a")),
        "doc_a")
      .join(split.select($"doc_id".as("doc_b"), $"split".as("split_b")),
        "doc_b")
      .groupBy(least($"split_a", $"split_b").as("s1"),
        greatest($"split_a", $"split_b").as("s2"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    // cluster pairs: (1,2),(1,3),(2,3) -> splits (train,test) x2 and
    // (train,train) x1
    assert(leaks == Set(("test", "train", 2L), ("train", "train", 1L)))
  }

  test("source-level minhash: identical sources match on every component") {
    // s1 and s2 carry the same text set; s3 is disjoint
    val docs = Seq(
      ("s1", "alpha beta gamma delta epsilon"),
      ("s1", "one two three four five"),
      ("s2", "alpha beta gamma delta epsilon"),
      ("s2", "one two three four five"),
      ("s3", "completely different words entirely here"))
      .toDF("source", "text")
    val sigs = Dedup.minhashSignatures(docs, "source", "text", k = 8)
    val m = sigs.collect().map(r => r.getString(0) ->
      (1 to 8).map(r.getLong)).toMap
    assert(m("s1") == m("s2"), "same shingle set, same signature")
    assert(m("s1") != m("s3"))
  }

  test("prefix filtering is lossless: equals the exact inverted index") {
    // the AllPairs guarantee on real data at two thresholds — every
    // pair the exact plan finds must survive the prefix candidate cut
    val docs = Tables.documents(spark, Sf0001)
    for (t <- Seq(0.2, 0.5)) {
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val prefix = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefix == exact,
        s"t=$t: missing=${(exact -- prefix).take(3)} " +
          s"extra=${(prefix -- exact).take(3)}")
    }
  }

  test("prefixJaccardPairs maxDf: equal below the cap, clique-bounded above") {
    val docs = Tables.documents(spark, Sf0001)
    // (1) a generous cap never bites on ordinary data: capped == exact
    val exact = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDf = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == exact,
      s"missing=${(exact -- capped).take(3)} extra=${(capped -- exact).take(3)}")
    // (2) on a clone-heavy corpus the cap drops the hot template's
    // m²/2 clique pairs (the linear-scale contract) while pairs of
    // ordinary documents survive untouched
    val template = "the same boilerplate text repeated verbatim in " +
      "every cloned document of this synthetic clique"
    val clones = (1L to 40L).map(i => (100000L + i, template)) ++ Seq(
      (200001L, "rare alpha beta gamma delta epsilon zeta eta theta"),
      (200002L, "rare alpha beta gamma delta epsilon zeta eta iota"))
    val cliqueDocs = clones.toDF("doc_id", "text")
    val uncapped = Dedup.prefixJaccardPairs(cliqueDocs, "doc_id", "text",
        n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val tight = Dedup.prefixJaccardPairs(cliqueDocs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDf = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.count(p => p._1 > 100000L && p._1 < 200000L) == 40 * 39 / 2,
      "uncapped finds the full clique")
    assert(!tight.exists(p => p._1 > 100000L && p._1 < 200000L),
      "maxDf=8 drops the 40-doc clique's candidates")
    assert(tight.exists(p => p._1 == 200001L && p._2 == 200002L),
      "the ordinary rare-shingle pair survives the cap")
  }
}
