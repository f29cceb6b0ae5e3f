package graft

import graft.core.{Packing, TextAnalysis}
import org.apache.spark.sql.functions._

/** Sequence packing (q74/q75) and corpus top-k n-grams (q76). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs4 = Seq(
    (1L, "a b c d e"),        // 5 tokens -> [0, 5)
    (2L, "f g h"),            // 3 tokens -> [5, 8)
    (3L, "i j k l m n o p"),  // 8 tokens -> [8, 16)
    (4L, "q r")               // 2 tokens -> [16, 18)
  ).toDF("doc_id", "text")

  test("tokenOffsets: contiguous intervals in id order from zero") {
    val off = Packing.tokenOffsets(docs4, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(off.toSeq == Seq(
      (1L, 5L, 0L, 5L), (2L, 3L, 5L, 8L),
      (3L, 8L, 8L, 16L), (4L, 2L, 16L, 18L)))
  }

  test("packCompositions: docs tile sequences exactly, boundary docs split") {
    // L=4: seq0=[a b c d], seq1=[e f g h], seq2=[i j k l],
    // seq3=[m n o p], seq4=[q r]
    val m = Packing.packCompositions(docs4, "doc_id", "text", 4)
      .orderBy("seq_id", "seq_off")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(m == Seq(
      (1L, 0L, 0L, 0L, 4L),   // doc1 tokens 0-3 fill seq0
      (1L, 1L, 0L, 4L, 1L),   // doc1 token 4 opens seq1
      (2L, 1L, 1L, 0L, 3L),   // doc2 completes seq1
      (3L, 2L, 0L, 0L, 4L),   // doc3 first half
      (3L, 3L, 0L, 4L, 4L),   // doc3 second half
      (4L, 4L, 0L, 0L, 2L)))  // doc4: short tail sequence
  }

  test("packSequences: reassembly reproduces the concatenated corpus") {
    for (l <- Seq(3, 4, 7, 100)) {
      val seqs = Packing.packSequences(docs4, "doc_id", "text", l)
        .orderBy("seq_id").as[(Long, Long, Long, String)].collect()
      val corpus = ("a b c d e f g h i j k l m n o p q r").split(" ")
      assert(seqs.map(_._4).mkString(" ") == corpus.mkString(" "),
        s"L=$l reassembly")
      assert(seqs.map(_._3).sum == corpus.length, s"L=$l token total")
      assert(seqs.dropRight(1).forall(_._3 == l), s"L=$l full windows")
    }
  }

  test("packing is partition-count invariant (the prefix sum is global)") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val a = Packing.packCompositions(d, "doc_id", "text", 512)
    val b = Packing.packCompositions(d.repartition(13), "doc_id", "text", 512)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("packCompositions: per-sequence slice lengths sum to seqLen") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val bySeq = Packing.packCompositions(d, "doc_id", "text", 512)
      .groupBy("seq_id").agg(sum("n_toks").as("filled"))
      .orderBy("seq_id").as[(Long, Long)].collect()
    assert(bySeq.dropRight(1).forall(_._2 == 512L), "every non-tail window full")
    assert(bySeq.last._2 <= 512L)
  }

  test("packCompositionsBy: cost-column path matches the text path when weights agree") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val counted = d.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val byCol = Packing.packCompositionsBy(counted, "doc_id", 512)
    val byText = Packing.packCompositions(d, "doc_id", "text", 512)
    assert(byCol.exceptAll(byText).isEmpty && byText.exceptAll(byCol).isEmpty)
  }

  test("property: random corpora match an independent sequential simulation") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val nDocs = 1 + rnd.nextInt(40)
      val corpus = (1 to nDocs).map { i =>
        val len = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)("w" + rnd.nextInt(9)).mkString(" "))
      }
      val seqLen = 1 + rnd.nextInt(17)
      // sequential reference: walk the corpus in id order, place every
      // doc, emit each (doc, window) intersection
      val expected = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
      var off = 0L
      for ((id, text) <- corpus) {
        val n = text.split("\\s+").length.toLong
        val s = off; val e = off + n; off = e
        var seq = s / seqLen
        while (seq * seqLen < e) {
          val a = math.max(s, seq * seqLen); val b = math.min(e, (seq + 1) * seqLen)
          if (b > a) expected += ((id, seq, a - seq * seqLen, a - s, b - a))
          seq += 1
        }
      }
      val got = Packing.packCompositions(
          corpus.toDF("doc_id", "text"), "doc_id", "text", seqLen)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"trial $trial (docs=$nDocs L=$seqLen)")
    }
  }

  test("packIdSequences: global id stream reassembles across boundaries") {
    import graft.core.Bpe
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val model = Bpe.train(d, "text", 40)
    val vocabIds = Bpe.vocab(d, "text", model)
      .as[(String, Long)].collect().toMap
    val enc = Bpe.encodeIds(d, "doc_id", "text", model, vocabIds).persist()
    val L = 256
    val seqs = Packing.packIdSequences(enc, "doc_id", L)
      .orderBy("seq_id")
      .as[(Long, Long, Long, Seq[Long])].collect()
    // the concatenated sequences equal the concatenated per-doc id
    // streams in id order — boundary splits lose and reorder nothing
    val expected = enc.orderBy("doc_id")
      .select("piece_ids").as[Seq[Long]].collect().flatten.toSeq
    assert(seqs.flatMap(_._4).toSeq == expected)
    assert(seqs.dropRight(1).forall(_._4.length == L), "full windows")
    assert(seqs.forall(s => s._3 == s._4.length), "n_tokens consistent")
    enc.unpersist()
  }

  test("packIdSequencesMaterialized: identical sequences via the written encode boundary") {
    import graft.core.Bpe
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val model = Bpe.train(d, "text", 40)
    val vocabIds = Bpe.vocab(d, "text", model)
      .as[(String, Long)].collect().toMap
    val enc = Bpe.encodeIds(d, "doc_id", "text", model, vocabIds)
    val table = java.nio.file.Files
      .createTempDirectory("graft_encmat").toString + "/enc"
    val inline = Packing.packIdSequences(enc, "doc_id", 256)
      .orderBy("seq_id").as[(Long, Long, Long, Seq[Long])].collect().toSeq
    val materialized = Packing
      .packIdSequencesMaterialized(enc, table, "doc_id", 256)
      .orderBy("seq_id").as[(Long, Long, Long, Seq[Long])].collect().toSeq
    assert(materialized == inline,
      "written-boundary form must reproduce the in-line form exactly")
    // and the boundary really is a readable table (not a side effect)
    assert(graft.sources.SnapshotTable.read(spark, table).count() == d.count())
  }

  test("writeShards: clustered commit, shard reads open only their files") {
    import graft.sources.SnapshotTable
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val seqs = Packing.packSequences(d, "doc_id", "text", 64)
    val table = java.nio.file.Files.createTempDirectory("graft_shards")
      .toString + "/seqs"
    val v = Packing.writeShards(seqs, table, shards = 8)
    val total = SnapshotTable.filesForRead(table).length
    assert(total >= 8, s"one file per range slice at least (got $total)")

    // a trainer fetching one shard = a seq_id range: pruned read must
    // open strictly fewer files and return exactly the direct filter
    val maxSeq = seqs.agg(max("seq_id")).as[Long].head()
    val lo = 0L; val hi = maxSeq / 8
    val range = Seq(SnapshotTable.ColRange("seq_id",
      lower = Some(lo), upper = Some(hi)))
    assert(SnapshotTable.filesForRead(table, prune = range).length < total,
      "shard read prunes at the manifest")
    val pruned = SnapshotTable.read(spark, table, prune = range)
      .filter(col("seq_id").between(lo, hi))
    val direct = seqs.filter(col("seq_id").between(lo, hi))
    assert(pruned.exceptAll(direct).isEmpty && direct.exceptAll(pruned).isEmpty)
    assert(v >= 0)
  }

  test("topNgrams: counts and deterministic tie order") {
    val d = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z")).toDF("doc_id", "text")
    // bigrams: doc1 [a b][b a][a b]; doc2 [a b][b c]; doc3 short -> [z]
    val top = TextAnalysis.topNgrams(d, "text", 2, 10)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L), ("z", 1L)))
  }

  test("packBoundaries: canonical string matches the hand-tiled map, " +
      "offsets contiguous, totals reconcile") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"))
      .toDF("doc_id", "text")
    val b = Packing.packBoundaries(docs, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id").collect()
    def parse(s: String): Seq[(Long, Long, Long)] =
      s.split(";").toSeq.map { seg =>
        val Array(o, d, t) = seg.split(":").map(_.toLong); (o, d, t) }
    // tokens: doc1=3, doc2=2, doc3=4, doc4=1 → seq0 [1:3][2:1],
    // seq1 [2:1][3:3], seq2 tail [3:1][4:1]
    assert(parse(b(0).getAs[String]("bounds")) ==
      Seq((0L, 1L, 3L), (3L, 2L, 1L)))
    assert(parse(b(1).getAs[String]("bounds")) ==
      Seq((0L, 2L, 1L), (1L, 3L, 3L)))
    assert(parse(b(2).getAs[String]("bounds")) ==
      Seq((0L, 3L, 1L), (1L, 4L, 1L)))
    b.foreach { r =>
      val segs = parse(r.getAs[String]("bounds"))
      segs.sliding(2).foreach {
        case Seq((o1, _, t1), (o2, _, _)) =>
          assert(o2 == o1 + t1, "packing is gap-free within a sequence")
        case _ => ()
      }
      assert(segs.map(_._3).sum == r.getAs[Long]("n_tokens"))
      assert(segs.length.toLong == r.getAs[Long]("n_docs"))
      assert(segs.head._1 == 0L, "every sequence starts at offset 0")
    }
  }

  test("lengthBatches: two-phase rank equals the per-bucket window " +
      "formulation, batches are contiguous rank slices") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 200).map(i => (i.toLong, ((i * 37) % 190 + 1).toLong))
    val counted = rows.toDF("doc_id", "n_tokens").repartition(7)
    val assign = Packing.lengthBatches(counted, "doc_id", "n_tokens",
      bucketWidth = 50L, batchSize = 8)
      .select("doc_id", "len", "bucket", "batch", "rank_in_bucket")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val w = Window.partitionBy("bucket")
      .orderBy(col("len").desc, col("doc_id"))
    val viaWindow = counted
      .select(col("doc_id"), col("n_tokens").as("len"),
        expr("n_tokens DIV 50L").as("bucket"))
      .withColumn("rank_in_bucket", row_number().over(w).cast("long") - 1L)
      .withColumn("batch", expr("rank_in_bucket DIV 8L"))
      .select("doc_id", "len", "bucket", "batch", "rank_in_bucket")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(assign == viaWindow)
    // batches are dense prefixes: every batch before the bucket's last
    // is exactly full
    val sizes = assign.groupBy(r => (r._3, r._4)).view.mapValues(_.size)
    val lastBatch = assign.groupBy(_._3).view.mapValues(_.map(_._4).max)
    sizes.foreach { case ((b, k), n) =>
      if (k < lastBatch(b)) assert(n == 8, s"bucket $b batch $k size $n")
    }
  }

  test("lengthBatches: grouping by length cuts pad waste vs arrival order") {
    // alternating short/long docs: arrival-order batches pad every
    // short doc to the long length; length-grouping pads ~nothing
    val rows = (0 until 128).map(i =>
      (i.toLong, if (i % 2 == 0) 10L else 500L))
    val counted = rows.toDF("doc_id", "n_tokens")
    val grouped = Packing.batchPadding(Packing.lengthBatches(
        counted, "doc_id", "n_tokens", bucketWidth = 64L, batchSize = 16))
      .agg(sum("pad_waste")).as[Long].head()
    // arrival-order baseline: batch = doc_id DIV 16, same padding rule
    val naive = counted
      .withColumn("bucket", lit(0L))
      .withColumn("batch", expr("doc_id DIV 16L"))
      .withColumn("len", col("n_tokens"))
      .groupBy("bucket", "batch")
      .agg((max("len") * count(lit(1)) - sum("len")).as("pad_waste"))
      .agg(sum("pad_waste")).as[Long].head()
    assert(grouped == 0L, s"homogeneous-length buckets pad nothing: $grouped")
    // 8 batches x 8 short docs each, padded 500-10
    assert(naive == 8L * 8L * 490L, s"naive pads every short doc: $naive")
  }
  test("packing sweep arithmetic: split-doc count and tail pad per L") {
    import graft.core.Packing
    // docs of 3,4,5 tokens, ids 1..3 -> offsets [0,3),[3,7),[7,12)
    val counted = Seq((1L, 3L), (2L, 4L), (3L, 5L)).toDF("doc_id", "n_tokens")
    val offsets = Packing.offsetsBy(counted, "doc_id")
    def sweep(l: Int) = offsets.agg(
        sum("n_tokens").as("total"),
        sum(when(expr(
          s"n_tokens > 0 AND tok_start DIV $l <> (tok_end - 1) DIV $l"),
          1L).otherwise(0L)).as("splits"))
      .select(col("total"), col("splits"),
        expr(s"(total + ${l - 1}) DIV $l").as("n_seqs"),
        expr(s"((total + ${l - 1}) DIV $l) * $l - total").as("pad"))
      .as[(Long, Long, Long, Long)].head()
    // L=4: boundaries at 4,8 -> doc2 [3,7) crosses 4, doc3 [7,12)
    // crosses 8 -> 2 split docs; 3 seqs, pad 0
    assert(sweep(4) == ((12L, 2L, 3L, 0L)))
    // L=12: everything fits one sequence, nothing splits
    assert(sweep(12) == ((12L, 0L, 1L, 0L)))
    // L=5: boundaries 5,10 -> doc2 [3,7) crosses 5, doc3 [7,12)
    // crosses 10 -> 2 splits; 3 seqs, pad 3
    assert(sweep(5) == ((12L, 2L, 3L, 3L)))
  }
}
