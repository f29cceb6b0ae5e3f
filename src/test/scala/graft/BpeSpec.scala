package graft

import graft.core.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer + distributed encoder (q78). The trainer is pinned to
  * the worked example of Sennrich et al. 2016 §3.2 and to an
  * INDEPENDENTLY written reference implementation (recomputes
  * everything from scratch each iteration, immutable collections —
  * deliberately nothing like the engine's incremental loop).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: naive, from-scratch-per-iteration. */
  private def refTrain(dict: Map[String, Long], k: Int,
                       minFreq: Long = 2L): List[(String, String)] = {
    def pairsOf(w: List[String]): List[(String, String)] =
      w.zip(w.drop(1))
    def applyMerge(w: List[String], p: (String, String)): List[String] =
      w match {
        case a :: b :: rest if (a, b) == p =>
          (a + b) :: applyMerge(rest, p)
        case a :: rest => a :: applyMerge(rest, p)
        case Nil => Nil
      }
    var words: Map[List[String], Long] = dict.map { case (w, c) =>
      (w.map(_.toString).toList :+ Bpe.EndOfWord) -> c
    }
    var merges = List.empty[(String, String)]
    var i = 0
    var stop = false
    while (i < k && !stop) {
      val counts = words.toList
        .flatMap { case (w, c) => pairsOf(w).map(_ -> c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toList.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < minFreq) stop = true
        else {
          merges = merges :+ best._1
          words = words.toList
            .map { case (w, c) => applyMerge(w, best._1) -> c }
            .groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
      i += 1
    }
    merges
  }

  test("trainer reproduces the Sennrich worked example") {
    val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.trainFromDict(dict, 5).merges
    assert(m == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
    // the canonical demonstration: an UNSEEN word segments into a
    // learned stem + suffix unit
    val model = Bpe.Model(m)
    assert(Bpe.encodeWord("lowest", model.ranks).toSeq ==
      Seq("low", "est</w>"))
    assert(Bpe.encodeWord("low", model.ranks).toSeq == Seq("low", "</w>"))
  }

  test("trainer matches the independent reference on the real corpus") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val dict = Bpe.wordCounts(d, "text").filter(col("cnt") >= 2)
      .as[(String, Long)].collect()
    val engine = Bpe.trainFromDict(dict, 60).merges
    val ref = refTrain(dict.toMap, 60)
    assert(engine == ref)
  }

  test("distributed encode: reconstruction, counts, partition invariance") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val model = Bpe.train(d, "text", numMerges = 80)
    assert(model.merges.length == 80)

    val enc = Bpe.encode(d, "doc_id", "text", model)
    val joined = enc.join(d.select("doc_id", "text"), Seq("doc_id"))
      .select(col("doc_id"), col("pieces"), col("n_pieces"),
        col("n_words"), col("text"))
      .as[(Long, Seq[String], Long, Long, String)].collect()
    assert(joined.nonEmpty)
    for ((_, pieces, nPieces, nWords, text) <- joined) {
      assert(pieces.length.toLong == nPieces)
      val words = text.trim.split("\\s+").filter(_.nonEmpty)
      assert(nWords == words.length.toLong)
      // dropping the end-of-word symbols and re-splitting on them
      // reconstructs the original words exactly
      val rebuilt = pieces.mkString("").split(java.util.regex.Pattern
        .quote(Bpe.EndOfWord)).filter(_.nonEmpty)
      assert(rebuilt.toSeq == words.toSeq, "lossless reconstruction")
      // merges learned with minFrequency=2 compress the corpus: fewer
      // pieces than characters
      assert(nPieces <= text.replaceAll("\\s+", "").length + nWords)
    }

    val again = Bpe.encode(d.repartition(7), "doc_id", "text", model)
      .select("doc_id", "n_pieces")
    assert(enc.select("doc_id", "n_pieces").exceptAll(again).isEmpty,
      "partition-count invariant")
  }

  test("property: random corpora — trainer==reference, encode reconstructs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      // tiny alphabet forces deep merge chains and repeated-symbol
      // runs (the 'a a a' edge where pairing order matters)
      val dict: Map[String, Long] = (1 to (5 + rnd.nextInt(20))).map { _ =>
        val w = Seq.fill(1 + rnd.nextInt(8))("ab" (rnd.nextInt(2))).mkString
        w -> (1L + rnd.nextInt(9))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val k = 1 + rnd.nextInt(12)
      val engine = Bpe.trainFromDict(dict.toSeq.sortBy(_._1).toArray, k).merges
      assert(engine == refTrain(dict, k), s"trial $trial k=$k dict=$dict")
      val ranks = Bpe.Model(engine).ranks
      for (w <- dict.keys) {
        val pieces = Bpe.encodeWord(w, ranks)
        assert(pieces.mkString("") == w + Bpe.EndOfWord, s"reconstruct $w")
      }
    }
  }

  test("vocab ids: bijective, append-only under merge growth, round-trip") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val m40 = Bpe.train(d, "text", 40)
    val m80 = Bpe.train(d, "text", 80)
    assert(m80.merges.take(40) == m40.merges, "merge list grows by appending")

    val v40 = Bpe.vocab(d, "text", m40).as[(String, Long)].collect().toMap
    val v80 = Bpe.vocab(d, "text", m80).as[(String, Long)].collect().toMap
    assert(v40.values.toSeq.sorted == (0L until v40.size).toSeq, "dense ids")
    assert(v40.forall { case (p, id) => v80.get(p).contains(id) },
      "growing merges never renumbers an existing piece")

    val enc = Bpe.encode(d, "doc_id", "text", m40)
      .select("doc_id", "pieces").as[(Long, Seq[String])].collect().toMap
    val ids = Bpe.encodeIds(d, "doc_id", "text", m40, v40)
      .select("doc_id", "piece_ids").as[(Long, Seq[Long])].collect()
    val inv = v40.map(_.swap)
    assert(ids.nonEmpty)
    for ((docId, ps) <- ids) {
      assert(!ps.contains(-1L), "same-corpus vocab has no unknowns")
      assert(ps.map(inv) == enc(docId), "id sequence decodes to the pieces")
    }
  }

  test("decodeIds: roundtrip on real text, unknowns surface visibly") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val m40 = Bpe.train(d, "text", 40)
    val v40 = Bpe.vocab(d, "text", m40).as[(String, Long)].collect().toMap
    val enc = Bpe.encodeIds(d, "doc_id", "text", m40, v40)
    val bad = Bpe.decodeIds(enc, "doc_id", "piece_ids", v40)
      .join(d.select($"doc_id", $"text"), "doc_id")
      .filter($"decoded" =!= regexp_replace(trim($"text"), "\\s+", " "))
      .count()
    assert(bad == 0L, "decode(encode(text)) == normalized text, every doc")
    // an id outside the vocab decodes to the visible replacement char
    val rogue = Seq((1L, Seq(-1L))).toDF("doc_id", "piece_ids")
    val got = Bpe.decodeIds(rogue, "doc_id", "piece_ids", v40)
      .select("decoded").as[String].head()
    assert(got == "�")
  }

  test("distributed merge loop matches the driver loop exactly") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val driver = Bpe.train(d, "text", numMerges = 20)
    val dist = Bpe.trainDistributed(d, "text", numMerges = 20)
    assert(dist.merges == driver.merges)
    // checkpoint cadence must not affect the result
    val dist3 = Bpe.trainDistributed(d, "text", numMerges = 20,
      checkpointEvery = 3)
    assert(dist3.merges == driver.merges)
  }

  test("training is deterministic and compression improves with merges") {
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
    val m1 = Bpe.train(d, "text", 40)
    val m2 = Bpe.train(d, "text", 40)
    assert(m1.merges == m2.merges)
    val p0 = Bpe.encode(d, "doc_id", "text", Bpe.Model(Nil))
      .agg(sum("n_pieces")).as[Long].head()
    val p40 = Bpe.encode(d, "doc_id", "text", m1)
      .agg(sum("n_pieces")).as[Long].head()
    val p80 = Bpe.encode(d, "doc_id", "text", Bpe.train(d, "text", 80))
      .agg(sum("n_pieces")).as[Long].head()
    assert(p40 < p0 && p80 < p40, s"monotone compression: $p0 > $p40 > $p80")
  }
}
