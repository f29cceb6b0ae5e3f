package graft

import graft.core.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical vectors rank first with cosine 1") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),  // same direction as 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs.filter($"vec_id" === 1), vecs, k = 3)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") == 2L)
    assert(top(0).getAs[Double]("cosine") == 1.0)
    assert(top.last.getAs[Long]("neighbor_id") == 4L)
    assert(top.last.getAs[Double]("cosine") == -1.0)
  }

  test("hardNegatives: same-label excluded, semi-hard ceiling drops the " +
      "nearest cross-label vector, degenerates to cosineTopK") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.141f, 0.0f), 0), // same label: never a negative
      (3L, Array(0.98f, 0.199f, 0.0f), 1), // nearest cross-label (~0.98)
      (4L, Array(0.5f, 0.866f, 0.0f), 1),  // cos 0.5
      (5L, Array(0.0f, 1.0f, 0.0f), 1))    // cos 0
      .toDF("vec_id", "embedding", "label")
    val anchors = vecs.filter($"vec_id" === 1)
    val all = Similarity.hardNegatives(anchors, vecs, k = 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(all == Set(3L, 4L, 5L), "same-label vec 2 must be excluded")
    // ceiling 0.9 drops vec 3 (cos ~0.98): the top negative becomes 4
    val semi = Similarity.hardNegatives(anchors, vecs, k = 5, maxSim = 0.9)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(semi.toSeq == Seq(4L, 5L))
    // all-distinct labels + maxSim 1.0 == plain cosineTopK
    val dl = Seq(
      (1L, Array(1.0f, 0.2f, 0.0f), 0), (2L, Array(0.9f, 0.1f, 0.3f), 1),
      (3L, Array(0.1f, 0.9f, 0.2f), 2), (4L, Array(0.3f, 0.3f, 0.9f), 3))
      .toDF("vec_id", "embedding", "label")
    val hn = Similarity.hardNegatives(dl.filter($"vec_id" === 1), dl, k = 3)
      .collect().map(_.toSeq)
    val ck = Similarity.cosineTopK(dl.filter($"vec_id" === 1), dl, k = 3)
      .collect().map(_.toSeq)
    assert(hn.toSeq == ck.toSeq)
  }

  test("matryoshka rerank: cands = corpus recovers brute force exactly; " +
      "gate config recall measured against exact top-k") {
    val emb = Tables.embeddings(spark, Sf0001)
    val queries = emb.filter($"vec_id" < 12)
    val n = emb.count().toInt
    val exact = Similarity.cosineTopK(queries, emb, k = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq)
    // surviving EVERY candidate makes stage 2 a plain exact re-rank
    val full = Similarity.matryoshkaTopK(queries, emb, k = 5,
        dTrunc = 16, cands = n)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq)
    assert(full.toSeq == exact.toSeq)
    // the gate's 16-dim/20-cand cascade: recall vs exact (untrained
    // random prefixes — the bound is loose by construction)
    val casc = Similarity.matryoshkaTopK(queries, emb, k = 5,
        dTrunc = 16, cands = 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactSet = exact.map(r =>
      (r(0).asInstanceOf[Long], r(2).asInstanceOf[Long])).toSet
    val recall = (exactSet intersect casc).size.toDouble / exactSet.size
    assert(recall >= 0.3, s"recall was $recall")
  }

  test("IVF ANN recall vs brute force on sf0.001 embeddings >= 0.6") {
    val emb = Tables.embeddings(spark, Sf0001)
    val queries = emb.filter($"vec_id" < 8)
    val exact = Similarity.cosineTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val centroids = emb.filter($"vec_id" % 97 === 3)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val approx = Similarity.ivfTopK(queries, emb, centroids, k = 5, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall was $recall")
    // probing every bucket must recover brute force exactly
    val nBuckets = centroids.count().toInt
    val full = Similarity.ivfTopK(queries, emb, centroids, k = 5, nProbe = nBuckets)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }

  test("native DotProduct == HOF fold on real embeddings, bit-identical") {
    val emb = Tables.embeddings(spark, Sf0001).limit(100)
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val mism = a.crossJoin(b)
      .withColumn("d1", Similarity.dot($"va", $"vb"))
      .withColumn("d2", Similarity.dotHof($"va", $"vb"))
      .filter($"d1" =!= $"d2") // exact double equality, not approximate
      .count()
    assert(mism == 0L)
  }

  test("DotProduct on mismatched lengths is NULL (matches HOF null-pad oracle)") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 1.0f)),       // mismatched
      (2L, Array(1.0f, 2.0f), Array(3.0f, 4.0f))              // matched
    ).toDF("id", "a", "b")
    val out = df.select($"id",
        Similarity.dot($"a", $"b").as("d1"),
        Similarity.dotHof($"a", $"b").as("d2"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1), "native must be NULL on length mismatch")
    assert(out(0).isNullAt(2), "HOF oracle is NULL on length mismatch")
    assert(out(1).getDouble(1) == 11.0 && out(1).getDouble(2) == 11.0)
  }

  test("LSH near-dup pairs: subset of exact with recall >= 0.5 at t=0.4") {
    val emb = Tables.embeddings(spark, Sf0001)
    val exact = Similarity.cosineNearDupPairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must never invent pairs")
    if (exact.nonEmpty) {
      val recall = (lsh intersect exact).size.toDouble / exact.size
      assert(recall >= 0.5, s"recall $recall over ${exact.size} pairs")
    }
  }

  test("persisted IVF index: partition-pruned probe read, results == in-memory IVF") {
    val emb = Tables.embeddings(spark, Sf0001)
    val centroids = emb.filter(col("vec_id") % 97 === 3)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    graft.core.Similarity.writeIvfIndex(emb, centroids, dir)
    // physical layout: one partition dir per bucket
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).count(_.startsWith("bucket="))
    assert(bucketDirs > 2, s"expected several bucket partitions, got $bucketDirs")

    val queries = emb.filter(col("vec_id") % 50 === 1).limit(5)
    val viaIndex = graft.core.Similarity.ivfTopKIndexed(
        spark, queries, dir, centroids, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val inMemory = graft.core.Similarity.ivfTopK(queries, emb, centroids, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaIndex == inMemory)

    // the probe read PRUNES partitions: only probed buckets reach the scan
    val probed = graft.core.Similarity.ivfTopKIndexed(
      spark, queries, dir, centroids, k = 5, nProbe = 2)
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    val idxScan = spark.read.parquet(dir)
      .filter(col("bucket").isin(0L))
    assert(idxScan.inputFiles.nonEmpty)
  }

  test("multi-probe LSH: 4 tables + 1 probe >= 8 single-probe tables' recall at half the index") {
    // Measured (deterministic decorrelated planes + data, t=0.4,
    // sf0.001):
    //   8 tables single-probe: recall 0.788, 51.6k candidates
    //   4 tables + 1 probe:    recall 0.864, 66.8k candidates
    // i.e. probing the lowest-|margin| bit buys MORE recall than
    // doubling the table count, with HALF the indexed/hashed rows
    // (the expensive side at scale) and bounded candidate overhead.
    // At the auto-sized bit widths of a real corpus (14+ bits at 1M
    // docs) the flipped bucket is far more targeted than at the
    // 4-bit floor used here, so the overhead bound is conservative.
    val emb = Tables.embeddings(spark, Sf0001)
    val exact = Similarity.cosineNearDupPairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    def recallOf(pairs: Set[(Long, Long)]) =
      (pairs intersect exact).size.toDouble / exact.size
    val single = Similarity.lshNearDupPairs(emb, 0.4, nTables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshNearDupPairs(emb, 0.4, nTables = 4, multiProbe = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(multi.subsetOf(exact), "multi-probe must never invent pairs")
    assert(recallOf(multi) >= recallOf(single),
      s"multi recall ${recallOf(multi)} < single ${recallOf(single)}")
    // threshold -1 keeps every scored candidate => candidate-set size
    val candSingle = Similarity.lshNearDupPairs(emb, -1.0, nTables = 8).count()
    val candMulti = Similarity.lshNearDupPairs(emb, -1.0, nTables = 4, multiProbe = 1).count()
    assert(candMulti <= (candSingle * 1.4).toLong,
      s"multi candidates $candMulti exceed 1.4x single $candSingle")
  }

  test("SemDeDup: within-cluster pairs are a subset of exact, cosines bit-match") {
    val emb = Tables.embeddings(spark, Sf0001)
    val model = graft.ml.KMeansTrainer.train(emb, k = 4, maxIter = 5)
    val exact = Similarity.cosineNearDupPairs(emb, 0.4)
      .select($"id_a", $"id_b", $"cosine").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val sem = Similarity.semDedupPairs(emb, model, 0.4)
      .select($"id_a", $"id_b", $"cosine").as[(Long, Long, Double)].collect()
    assert(sem.nonEmpty)
    sem.foreach { case (a, b, c) =>
      assert(exact.contains((a, b)), s"($a,$b) not in exact pair set")
      assert(exact((a, b)) == c, s"cosine mismatch on ($a,$b)")
    }
    // cluster-bucketing must retain most same-meaning pairs: the loss
    // is exactly the cross-cluster pairs (the paper's accepted trade)
    val recall = sem.length.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall over ${exact.size} exact pairs")
  }

  test("SemDeDup audit: one survivor per duplicate group, min id wins, partition-invariant") {
    val emb = Tables.embeddings(spark, Sf0001)
    val model = graft.ml.KMeansTrainer.train(emb, k = 4, maxIter = 5)
    val audit = Similarity.semDedup(emb, model, 0.4)
    assert(audit.count() == emb.count(), "audit covers every vector")
    val rows = audit.select($"vec_id", $"survivor_id", $"is_survivor")
      .as[(Long, Long, Boolean)].collect()
    rows.foreach { case (id, surv, isSurv) =>
      assert(surv <= id, "exemplar is the component min id")
      assert(isSurv == (surv == id))
    }
    // every named survivor actually survives
    val survives = rows.filter(_._3).map(_._1).toSet
    rows.foreach { case (_, surv, _) => assert(survives.contains(surv)) }
    // partitioning must not change the outcome
    val re = Similarity.semDedup(emb.repartition(13), model, 0.4)
      .select($"vec_id", $"survivor_id", $"is_survivor")
      .as[(Long, Long, Boolean)].collect()
    assert(re.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
  }

  test("snapshot-table IVF index: incremental == one-shot, probe reads " +
      "prune files, appends are idempotent under a writer id") {
    import graft.sources.SnapshotTable
    val emb = Tables.embeddings(spark, Sf0001)
    val centroids = emb.filter($"vec_id" % 11 === 3)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val t = java.nio.file.Files.createTempDirectory("ivf_table")
      .toString + "/ivf"
    // commits carry bucket-DISJOINT slices (arrivals that cluster — and
    // the shape that gives every file a tight bucket range even when
    // AQE folds a tiny commit to one file): group the buckets into 4
    // sets and commit each set's vectors separately
    val byBucket = Similarity.assignBuckets(emb, centroids)
      .select($"vec_id", $"bucket").as[(Long, Long)].collect().toMap
    val bucketIds = byBucket.values.toSeq.distinct.sorted
    val groups = bucketIds.zipWithIndex.groupMap(_._2 % 4)(_._1)
      .values.map(_.toSet).toSeq
    def slice(g: Set[Long]) = {
      val ids = byBucket.collect { case (v, b) if g(b) => v }.toSeq
      emb.filter($"vec_id".isin(ids.map(Long.box): _*))
    }
    Similarity.writeIvfIndexTable(slice(groups.head), centroids, t)
    groups.tail.zipWithIndex.foreach { case (g, i) =>
      Similarity.appendToIvfIndex(slice(g), centroids, t,
        writer = Some(("ivf-stream", i.toLong)))
    }
    val queries = emb.filter($"vec_id" < 5)
    val viaTable = Similarity.ivfTopKIndexedTable(spark, queries, t,
      centroids, k = 4, nProbe = 2).collect().map(_.toString).sorted
    val direct = Similarity.ivfTopK(queries, emb, centroids,
      k = 4, nProbe = 2).collect().map(_.toString).sorted
    assert(viaTable.toSeq == direct.toSeq,
      "two-commit index must answer exactly like the one-shot pipeline")
    // manifest stats prune: a single-bucket probe envelope opens fewer
    // files than the table holds (commits are bucket-disjoint, so
    // every file carries a tight range)
    val all = SnapshotTable.filesForRead(t).size
    val oneBucket = SnapshotTable.filesForRead(t, prune = Seq(
      SnapshotTable.ColRange("bucket",
        lower = Some(bucketIds.head), upper = Some(bucketIds.head)))).size
    assert(oneBucket < all, s"pruned $oneBucket of $all files")
    // replayed append (same writer id + txn) is a no-op
    val before = SnapshotTable.read(spark, t).count()
    val replay = Similarity.appendToIvfIndex(slice(groups.last), centroids, t,
      writer = Some(("ivf-stream", (groups.size - 2).toLong)))
    assert(replay.isEmpty, "replayed txn must be skipped")
    assert(SnapshotTable.read(spark, t).count() == before)
  }

  test("recall@k: identical lists give 1.0, zero-hit queries keep a row") {
    val exact = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 20L), (2L, 2L, 21L))
      .toDF("query_id", "rank", "neighbor_id")
    val sameR = Similarity.recallAtK(exact, exact, k = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(sameR == Seq((1L, 2L, 2L, 1000000L), (2L, 2L, 2L, 1000000L)))
    // approx misses query 2 entirely and hits 1-of-2 on query 1
    val approx = Seq((1L, 1L, 11L), (1L, 2L, 99L))
      .toDF("query_id", "rank", "neighbor_id")
    val r = Similarity.recallAtK(exact, approx, k = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 1L, 2L, 500000L), (2L, 0L, 2L, 0L)))
  }

  test("MMR: diversity term uses the TRUE max sim — negative, not clamped") {
    // three unit vectors 120° apart; the query sits 20° off v1. After
    // v1 is selected, every other candidate's max sim to the selection
    // is cos(120°) = −0.5 — the un-clamped semantics ADD 0.15 to the
    // step-2 score, which the assert pins as a positive mmr_micro.
    val c = math.cos(math.Pi * 2 / 3).toFloat // -0.5
    val s = math.sin(math.Pi * 2 / 3).toFloat
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(c, s)), (3L, Array(c, -s)))
      .toDF("vec_id", "embedding")
    val q = Seq((99L, Array(math.cos(0.349).toFloat, math.sin(0.349).toFloat)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(q, vecs, k = 3, poolSize = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got.map(_._3) == Seq(1L, 2L, 3L))
    val rel2 = {
      // the engine's double path: float-cast products, left fold
      val qv = Array(math.cos(0.349).toFloat, math.sin(0.349).toFloat)
      val v2 = Array(c, s)
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- 0 until 2) {
        ab += qv(i).toDouble * v2(i).toDouble
        aa += qv(i).toDouble * qv(i).toDouble
        bb += v2(i).toDouble * v2(i).toDouble
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val sim21 = {
      val v2 = Array(c, s); val v1 = Array(1.0f, 0.0f)
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- 0 until 2) {
        ab += v2(i).toDouble * v1(i).toDouble
        aa += v2(i).toDouble * v2(i).toDouble
        bb += v1(i).toDouble * v1(i).toDouble
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val expected2 = math.floor(1e6 * (0.7 * rel2 - 0.3 * sim21)).toLong
    assert(got(1)._4 == expected2)
    assert(got(1)._4 > 0, "un-clamped −0.5 sim must RAISE the score above 0")
  }

  test("MMR matches an independent greedy reference on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, Sf0001)
    val got = Similarity.mmrTopK(emb.filter($"vec_id" < 4), emb,
        k = 5, poolSize = 20)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // reference: recompute the max over the selected SET each step
    // (no incremental state), plain collections
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (i <- a.indices) {
        ab += a(i).toDouble * b(i).toDouble
        aa += a(i).toDouble * a(i).toDouble
        bb += b(i).toDouble * b(i).toDouble
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val expect = (0L until 4L).flatMap { qid =>
      val qv = vecs(qid)
      val pool = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, r) => (-r, id) }.take(20)
      var selected = List.empty[Long]
      (1 to 5).map { step =>
        val scoredLeft = pool.filterNot { case (id, _) => selected.contains(id) }
          .map { case (id, r) =>
            val ms = if (selected.isEmpty) 0.0
              else selected.map(s => cos(vecs(id), vecs(s))).max
            (id, 0.7 * r - 0.3 * ms)
          }
        val (bid, bsc) = scoredLeft.minBy { case (id, sc) => (-sc, id) }
        selected ::= bid
        (qid, step.toLong, bid, math.floor(1e6 * bsc).toLong)
      }
    }
    assert(got == expect)
  }

  test("kNN-LOO majority vote: clean clusters score 1.0, planted mislabel caught") {
    import org.apache.spark.sql.expressions.Window
    // cluster A along e1 (labels 0), cluster B along e2 (labels 1),
    // vec 99 sits in A but is labeled 1 -> its majority vote is 0
    def v(axis: Int, jitter: Double): Seq[Float] =
      (0 until 4).map(d => (if (d == axis) 1.0 + jitter else jitter).toFloat)
    val rows =
      (0L until 6L).map(i => (i, v(0, 0.01 * i), 0)) ++
      (10L until 16L).map(i => (i, v(1, 0.01 * (i - 10)), 1)) ++
      Seq((99L, v(0, 0.03), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val nn = Similarity.cosineTopK(emb, emb, k = 5)
    val labels = emb.select($"vec_id", $"label".cast("long").as("lbl"))
    val wv = Window.partitionBy("query_id")
      .orderBy(desc("votes"), asc("n_label"))
    val pred = nn
      .join(labels.select($"vec_id".as("neighbor_id"), $"lbl".as("n_label")),
        "neighbor_id")
      .groupBy("query_id", "n_label").agg(count(lit(1)).as("votes"))
      .withColumn("r", row_number().over(wv)).filter($"r" === 1)
      .select($"query_id", $"n_label".as("pred"))
    val acc = pred
      .join(labels.select($"vec_id".as("query_id"), $"lbl".as("gold")),
        "query_id")
      .groupBy($"gold")
      .agg(count(lit(1)).as("n"),
        sum(when($"pred" === $"gold", 1L).otherwise(0L)).as("n_correct"))
      .as[(Long, Long, Long)].collect()
      .map { case (g, n, c) => g -> ((n, c)) }.toMap
    assert(acc(0L) == ((6L, 6L)))  // all of A classified A
    assert(acc(1L) == ((7L, 6L)))  // the planted mislabel is the one miss
  }

  test("binaryQuantize: hand bits across the lo/hi word boundary") {
    // 34-dim vectors against zero thresholds: +1 at dims 0 and 33 ->
    // bq_lo = 2^0, bq_hi = 2^(33-32); all-negative -> (0, 0)
    val thr = (0L until 34L).map((_, 0L)).toDF("dim", "thr_micro")
    val vecs = Seq(
      (1L, (0 until 34).map(d =>
        if (d == 0 || d == 33) 1.0f else -1.0f).toSeq),
      (2L, Seq.fill(34)(-1.0f))).toDF("vec_id", "embedding")
    val codes = graft.core.Similarity.binaryQuantize(vecs, thr)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(codes == Seq((1L, 1L, 2L), (2L, 0L, 0L)))
  }

  test("bqTopK: cands = corpus degenerates to exact brute force; " +
      "gate-config recall is usable") {
    val emb = Tables.embeddings(spark, Sf0001)
    val queries = emb.filter($"vec_id" < 8)
    val n = emb.count().toInt
    val exact = Similarity.cosineTopK(queries, emb, k = 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val full = Similarity.bqTopK(queries, emb, k = 5, cands = n)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(full == exact,
      "with every candidate surviving, BQ re-rank must equal brute force")
    // 64 bits of 64 dims is a LOSSY coarse stage (faiss BQ re-ranks
    // hundreds of candidates in production): pin the measured floor
    // on this fixed corpus and the contract that more candidates
    // monotonically recover recall toward the exact limit
    def hits(cands: Int): Int = {
      val bq = Similarity.bqTopK(queries, emb, k = 5, cands = cands)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      exact.map { case (q, _, nb) => (q, nb) }.intersect(bq).size
    }
    val h20 = hits(20)
    assert(h20 >= 12, s"recall@5 over 8 queries at cands=20: $h20/40")
    assert(hits(40) >= h20, "recall must not drop as cands grows")
  }

  test("cosineNearDupPairs fails loudly above its O(n^2) row cap") {
    val emb = Tables.embeddings(spark, Sf0001)
    // the guard is IN the plan now: building is lazy (no job), the
    // failure fires at execution
    val plan = Similarity.cosineNearDupPairs(emb, 0.4, maxRows = 10L)
    val err = intercept[Throwable](plan.count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("lshNearDupPairs")),
      msgs(err).mkString(" | "))
    // a deliberate exact run raises the cap and still works
    assert(Similarity.cosineNearDupPairs(emb, 0.9, maxRows = 1000000L)
      .count() >= 0L)
  }
}
