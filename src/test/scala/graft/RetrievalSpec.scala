package graft

import org.apache.spark.sql.functions._

import graft.core.Retrieval

/** BM25 retrieval against an independently-written in-test scorer
  * (plain Scala maps/loops — no shared code with the engine path
  * beyond the formula in the Scaladoc).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BM25 (k1=1.2, b=0.75), 1e-6 fixed-point floor per term. */
  private def referenceBm25(corpus: Seq[(Long, String)],
                            queries: Seq[(Long, String)],
                            k: Int): Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.filter(_._2.trim.nonEmpty)
      .map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val n = toks.size.toLong
    val total = toks.values.map(_.size.toLong).sum
    val tf = toks.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (w, o) => w -> o.size.toLong } }
    val dfm = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    queries.filter(_._2.trim.nonEmpty).flatMap { case (qid, qt) =>
      val terms = qt.trim.split("\\s+").toSet
      val scored = tf.flatMap { case (d, c) =>
        val termScores = terms.toSeq.flatMap { w =>
          c.get(w).map { f =>
            val df = dfm(w); val dl = toks(d).size.toDouble
            val idf = math.log(1.0 + ((n - df).toDouble + 0.5) / (df + 0.5))
            val frac = f * 2.2 / (f + 0.3 + 0.9 * (dl * n) / total)
            math.floor(1e6 * (idf * frac)).toLong
          }
        }
        // docs that matched at least one term keep their row even if
        // the floored sum is 0 — mirroring the engine/oracle, where
        // presence is decided by the join, not the score
        if (termScores.nonEmpty) Some(d -> termScores.sum) else None
      }.toSeq
      scored.sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
        .map { case ((d, s), i) => (qid, (i + 1).toLong, d, s) }
    }
  }

  private def run(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
                  k: Int, partitions: Int = 4): Seq[(Long, Long, Long, Long)] =
    Retrieval.bm25TopK(
        corpus.toDF("doc_id", "text").repartition(partitions),
        queries.toDF("doc_id", "text"), k = k)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("hand-checkable micro corpus") {
    val corpus = Seq(1L -> "a b a", 2L -> "b c")
    val got = run(corpus, Seq(10L -> "a c"), k = 5)
    assert(got == referenceBm25(corpus, Seq(10L -> "a c"), 5))
    // a-doc outranks c-doc: equal idf (df=1 each) but tf=2 beats tf=1
    assert(got.map(_._3) == Seq(1L, 2L))
  }

  test("matches the independent scorer on a seeded random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val corpus = (0L until 60L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val queries = Seq(100L -> "alpha zeta", 101L -> "gamma gamma beta")
    val got = run(corpus, queries, k = 7)
    assert(got == referenceBm25(corpus, queries, 7))
  }

  test("snapshot-table postings index: two-commit == one-shot, pruned " +
      "probe reads, idempotent append") {
    val d = Tables.documents(spark, Sf0001)
    val train = d.filter(col("doc_id") % 100 =!= 0)
    val queries = d.filter(col("doc_id") % 100 === 0)
    val t = java.nio.file.Files
      .createTempDirectory("graft_bm25idx").toString + "/postings"
    Retrieval.writePostingsIndex(train.filter(col("doc_id") % 2 === 0), t,
      clusterPartitions = Some(4))
    Retrieval.appendToPostingsIndex(train.filter(col("doc_id") % 2 =!= 0), t,
      clusterPartitions = Some(4))
    val indexed = Retrieval.bm25TopKIndexedTable(spark, queries, t, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = Retrieval.bm25TopK(train, queries, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(indexed.nonEmpty && indexed == oneShot)
    // the bucket-clustered layout prunes: a single-bucket envelope
    // opens fewer files than the whole table
    import graft.sources.SnapshotTable
    val all = SnapshotTable.filesForRead(t).size
    val one = SnapshotTable.filesForRead(t, prune = Seq(
      SnapshotTable.ColRange("bucket", lower = Some(0L), upper = Some(0L))))
      .size
    assert(one < all, s"pruned $one of $all files")
    // idempotent append: replaying a (writer, version) is a no-op and
    // answers don't change
    val extra = d.filter(col("doc_id") % 100 === 0) // any new ids
      .withColumn("doc_id", col("doc_id") + 1000000L)
    assert(Retrieval.appendToPostingsIndex(extra, t,
      writer = Some(("w1", 1L))).nonEmpty)
    val afterFirst = Retrieval.bm25TopKIndexedTable(spark, queries, t, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(Retrieval.appendToPostingsIndex(extra, t,
      writer = Some(("w1", 1L))).isEmpty)
    val afterReplay = Retrieval.bm25TopKIndexedTable(spark, queries, t, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(afterReplay == afterFirst)
  }

  test("foreachBatch postings ingest: stream-built index == batch build, " +
      "replayed batch is a no-op") {
    // the PackStream/IncrementalDedup discipline for retrieval: a
    // continuous doc stream appends postings with the batch id as the
    // idempotence version, so crash-replays can never double-count tf
    // or the corpus stats
    val d = Tables.documents(spark, Sf0001)
    val seed = d.filter(col("doc_id") % 3 === 0)
    val t = java.nio.file.Files
      .createTempDirectory("graft_bm25stream").toString + "/postings"
    Retrieval.writePostingsIndex(seed, t)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Retrieval.appendToPostingsIndex(batch, t,
          writer = Some(("bm25-stream", id)))
        ()
      }
      .start()
    val rest = d.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (b1, b2) = rest.splitAt(rest.length / 2)
    input.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    input.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val queries = d.filter(col("doc_id") % 100 === 0)
    val streamed = Retrieval.bm25TopKIndexedTable(spark, queries, t, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = Retrieval.bm25TopK(d, queries, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == oneShot)
    // a crash-replay of the last batch must not double-count
    assert(Retrieval.appendToPostingsIndex(
      spark.createDataFrame(b2.toIndexedSeq).toDF("doc_id", "text"), t,
      writer = Some(("bm25-stream", 1L))).isEmpty)
    val afterReplay = Retrieval.bm25TopKIndexedTable(spark, queries, t, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(afterReplay == streamed)
  }

  test("partition invariance and gate-query shape on real sf0.001 docs") {
    val d = Tables.documents(spark, Sf0001)
    val fn = SparkEntry.queries("q101_bm25_retrieval")
    val a = fn(spark, Sf0001).collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty)
    val corpus = d.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val queries = d.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val expect = referenceBm25(corpus, queries, 10)
    val one = run(corpus, queries, 10, partitions = 1)
    val many = run(corpus, queries, 10, partitions = 13)
    assert(one == expect)
    assert(many == expect)
  }

  private def rrfC(rank: Long): Long = 1000000000L / (60L + rank)

  test("RRF fusion: integer contributions, overlap outranks, id tie-break") {
    val s1 = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L)).toDF("query_id", "rank", "doc_id")
    val s2 = Seq((1L, 1L, 11L), (1L, 2L, 13L),
      (2L, 1L, 21L)).toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(Seq(s1, s2), k = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // query 1: doc 11 is in BOTH lists (rank 2 + rank 1) and must beat
    // doc 10 (a single rank-1); then 13 (rank 2) over 12 (rank 3)
    assert(got.filter(_._1 == 1L) == Seq(
      (1L, 1L, 11L, rrfC(2) + rrfC(1)),
      (1L, 2L, 10L, rrfC(1)),
      (1L, 3L, 13L, rrfC(2)),
      (1L, 4L, 12L, rrfC(3))))
    // query 2: equal contributions (rank 1 in one list each) break on
    // the lower doc id
    assert(got.filter(_._1 == 2L) == Seq(
      (2L, 1L, 20L, rrfC(1)), (2L, 2L, 21L, rrfC(1))))
  }

  test("RRF: single-list fusion preserves the input order, truncated to k") {
    val s1 = (1 to 8).map(r => (7L, r.toLong, (100 + r).toLong))
      .toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(Seq(s1), k = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == (1 to 5).map(r =>
      (7L, r.toLong, (100 + r).toLong, rrfC(r.toLong))))
  }

  test("hybrid gate query: fused list draws from both arms on sf0.001") {
    val fused = SparkEntry.queries("q103_hybrid_rrf")(spark, Sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(fused.nonEmpty)
    // every query returns at most 10, ranks are 1..n contiguous
    fused.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted == (1 to rs.size).map(_.toLong))
    }
    // a doc surfaced by both arms carries the sum of both integer
    // contributions — its rrf_nano exceeds any single-arm maximum
    val single = rrfC(1)
    assert(fused.exists(_._4 > single))
  }

  test("MRR harness: a distinctive phrase ranks its source first, " +
      "an unanswerable query scores 0") {
    // doc 1 holds unique terms -> its phrase query must rank it #1
    // (rr = 1e6); doc 3's query terms appear NOWHERE (the query text
    // is replaced) -> gold_rank 0, rr 0
    val corpus = Seq(
      (1L, "alpha beta zig unique tokens here now"),
      (2L, "common words common words common words common"),
      (3L, "common words again and again and again yes")).toDF("doc_id", "text")
    val queries = Seq((1L, "zig unique tokens"), (3L, "nonexistent phantom"))
      .toDF("doc_id", "text")
    val top = graft.core.Retrieval.bm25TopK(corpus, queries, k = 10)
    val gold = top.filter($"doc_id" === $"query_id")
      .select($"query_id", $"rank")
    val got = queries.select($"doc_id".as("query_id"))
      .join(gold, Seq("query_id"), "left")
      .select($"query_id", coalesce($"rank", lit(0L)).as("gold_rank"),
        expr("CASE WHEN rank IS NOT NULL THEN 1000000 DIV rank ELSE 0L END")
          .as("rr_micro"))
      .as[(Long, Long, Long)].collect()
      .map { case (q, r, rr) => (q, (r, rr)) }.toMap
    assert(got(1L) == ((1L, 1000000L)), s"unique phrase: ${got(1L)}")
    assert(got(3L) == ((0L, 0L)), s"unanswerable: ${got(3L)}")
  }

  test("ndcgAtK: ideal order scores 1.0, burying the best doc less") {
    import graft.core.Retrieval
    val rel = Seq((1L, 10L, 2L), (1L, 11L, 1L), (1L, 12L, 1L),
      (2L, 20L, 2L)).toDF("query_id", "doc_id", "rel")
    // q1 ranked in ideal order (rel 2,1,1) -> nDCG exactly 1e6
    val ideal = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
      .toDF("query_id", "rank", "doc_id")
    val gotIdeal = Retrieval.ndcgAtK(ideal, rel, k = 10)
      .select("query_id", "ndcg_micro").as[(Long, Long)].collect().toMap
    assert(gotIdeal(1L) == 1000000L, s"$gotIdeal")
    // the same docs with the best buried at rank 3 -> strictly lower
    val buried = Seq((1L, 1L, 11L), (1L, 2L, 12L), (1L, 3L, 10L))
      .toDF("query_id", "rank", "doc_id")
    val gotBuried = Retrieval.ndcgAtK(buried, rel, k = 10)
      .select("ndcg_micro").as[Long].head()
    assert(gotBuried < 1000000L && gotBuried > 0L, s"$gotBuried")
    // a query retrieving only irrelevant docs: dcg 0, ndcg 0
    val miss = Seq((2L, 1L, 99L)).toDF("query_id", "rank", "doc_id")
    val gotMiss = Retrieval.ndcgAtK(miss, rel, k = 10)
      .select("dcg_micro", "ndcg_micro").as[(Long, Long)].head()
    assert(gotMiss == ((0L, 0L)), s"$gotMiss")
  }

  test("tfidfCosinePairs: identical docs hit 1.0, disjoint docs absent, " +
      "maxDf drops stop-term-only pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // identical to 1 -> cos 1.0
      (3L, "epsilon zeta eta theta"),   // disjoint from 1/2
      (4L, "alpha beta iota kappa"))    // partial overlap with 1/2
      .toDF("doc_id", "text")
    val got = Retrieval.tfidfCosinePairs(docs, "doc_id", "text",
        threshold = 0.01)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 1.0, s"${got.get((1L, 2L))}")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
    assert(got((1L, 4L)) > 0.0 && got((1L, 4L)) < 1.0)
    // a stop term shared by EVERY doc: with maxDf below its df the
    // candidates it alone generates vanish, but pairs that also share
    // rare terms survive (norms stay full-vocabulary: lower bound)
    val stop = Seq(
      (1L, "the alpha beta"), (2L, "the alpha beta"),
      (3L, "the epsilon zeta"), (4L, "the eta iota"))
      .toDF("doc_id", "text")
    val capped = Retrieval.tfidfCosinePairs(stop, "doc_id", "text",
        threshold = 0.01, maxDf = 3)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(capped.contains((1L, 2L)), s"$capped")
    assert(!capped.contains((3L, 4L)), s"$capped") // 'the'-only pair
    // uncapped finds the stop-term pairs too (the exact baseline)
    val exact = Retrieval.tfidfCosinePairs(stop, "doc_id", "text",
        threshold = 0.01)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(exact.contains((3L, 4L)), s"$exact")
  }

  test("mapAtK: hand-checked AP, precision and recall; perfect " +
      "ranking scores exactly 1.0") {
    val ranked = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      (1L, 4L, 40L)).toDF("query_id", "rank", "doc_id")
    val rel = Seq((1L, 10L), (1L, 30L), (1L, 99L))
      .toDF("query_id", "doc_id")
    // hits at ranks 1 and 3: AP = (1 + 2/3)/min(3,10) in micro DIVs
    val got = Retrieval.mapAtK(ranked, rel, k = 10)
      .select("n_rel", "n_hits_k", "p_at_k_micro", "recall_at_k_micro",
        "ap_micro").as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((3L, 2L, 200000L, 666666L,
      (1000000L + 2000000L / 3L) / 3L)))
    val perfect = Seq.tabulate(5)(i => (7L, (i + 1).toLong, i.toLong))
      .toDF("query_id", "rank", "doc_id")
    val pRel = (0L until 5L).map(d => (7L, d)).toDF("query_id", "doc_id")
    assert(Retrieval.mapAtK(perfect, pRel, k = 5)
      .select("ap_micro").as[Long].head() == 1000000L)
  }

  test("mapAtK: empty relevance pool yields NULL ap, zero recall " +
      "denominator never divides") {
    val ranked = Seq((1L, 1L, 10L)).toDF("query_id", "rank", "doc_id")
    val rel = Seq((2L, 10L)).toDF("query_id", "doc_id") // other query
    val r = Retrieval.mapAtK(ranked, rel, k = 10)
      .filter(col("query_id") === 1L)
      .select("n_rel", "recall_at_k_micro", "ap_micro").head()
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }
}
