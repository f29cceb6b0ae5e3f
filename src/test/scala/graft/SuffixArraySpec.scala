package graft

import graft.core.SuffixArray

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: literal suffix sort + adjacent LCP —
    * the definition the distributed prefix-doubling path must equal.
    */
  private def bruteForce(docs: Seq[(Long, String)], minLen: Int,
                         topK: Int): Seq[(Long, Long, Long, String)] = {
    import scala.math.Ordering.Implicits._
    val sufs = docs.flatMap { case (id, t) =>
      val toks = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      toks.indices.map(p => (id, p, toks.drop(p)))
    }
    val sorted = sufs.sortBy { case (id, p, s) => (s, id, p) }
    val lcps = sorted.zip(sorted.drop(1)).map { case ((_, _, a), (_, _, b)) =>
      val l = a.zip(b).takeWhile { case (x, y) => x == y }.size
      (a.take(l).mkString(" "), l.toLong)
    }
    val winners = lcps.filter(_._2 >= minLen).distinct
      .sortBy { case (txt, len) => (-len, txt) }.take(topK)
    winners.map { case (txt, len) =>
      val rt = txt.split(" ").toSeq
      val occs = sufs.filter { case (_, _, s) => s.take(rt.size) == rt }
      (len, occs.map(_._1).distinct.size.toLong, occs.size.toLong, txt)
    }
  }

  private def run(docs: Seq[(Long, String)], minLen: Int, topK: Int,
                  directLcpMaxDocLen: Int = 4096)
      : Seq[(Long, Long, Long, String)] =
    SuffixArray.longestRepeats(
      docs.toDF("doc_id", "text"), "doc_id", "text", minLen, topK,
      directLcpMaxDocLen)
      .select("repeat_len", "n_docs", "n_occurrences", "repeat_text")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("longestRepeats: shared boilerplate + whole-doc clone, " +
    "hand-checked against the literal suffix sort") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "intro text the quick brown fox jumps over the lazy dog outro",
      3L -> "the quick brown fox jumps over the lazy dog",
      4L -> "completely unrelated words live here instead")
    val got = run(docs, minLen = 3, topK = 10)
    val want = bruteForce(docs, minLen = 3, topK = 10)
    assert(got == want)
    // the 9-token boilerplate surfaces at FULL length (> any fixed
    // window), in all three docs that carry it
    assert(got.head._1 == 9L)
    assert(got.head._4 == "the quick brown fox jumps over the lazy dog")
    assert(got.head._2 == 3L && got.head._3 == 3L)
  }

  test("longestRepeats: equals the literal suffix sort on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 3) {
      val docs = (1L to 8L).map { id =>
        val n = 3 + rnd.nextInt(10)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = run(docs, minLen = 2, topK = 50)
      val want = bruteForce(docs, minLen = 2, topK = 50)
      assert(got == want, s"trial $trial: $docs")
      // the rank-level DESCENT path (the long-doc scale path) must
      // produce the identical table
      val descent = run(docs, minLen = 2, topK = 50,
        directLcpMaxDocLen = 0)
      assert(descent == want, s"descent trial $trial: $docs")
    }
  }

  test("longestRepeats: no repeat >= minLen -> empty; empty corpus -> empty") {
    val distinctDocs = Seq(1L -> "a b c", 2L -> "d e f", 3L -> "g h i")
    assert(run(distinctDocs, minLen = 2, topK = 5).isEmpty)
    val empty = Seq.empty[(Long, String)]
    assert(run(empty, minLen = 2, topK = 5).isEmpty)
    // blank text rows are dropped, not crashed on
    assert(run(Seq(1L -> "  ", 2L -> "x y x y"), minLen = 2, topK = 5)
      .nonEmpty)
  }

  test("longestRepeats: partition invariant") {
    val docs = (1L to 20L).map { id =>
      id -> (if (id % 3 == 0) "shared block of tokens here plus " + id
             else s"doc $id words ${id * 7} and shared block of tokens")
    }
    val a = run(docs, minLen = 3, topK = 20)
    val df = docs.toDF("doc_id", "text").repartition(13)
    val b = SuffixArray.longestRepeats(df, "doc_id", "text", 3, 20)
      .select("repeat_len", "n_docs", "n_occurrences", "repeat_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(a == b)
  }

  /** Reference ExactSubstr rewrite: mark every token covered by a
    * duplicated minLen-gram window, drop marked tokens everywhere.
    */
  private def bruteDedup(docs: Seq[(Long, String)], minLen: Int)
      : Map[Long, (String, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Seq.empty[String]
             else t.trim.split("\\s+").toSeq)
    }.toMap
    val gramCount = toks.values.flatMap(ts =>
      ts.sliding(minLen).filter(_.size == minLen).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size).toMap
    docs.map { case (id, _) =>
      val ts = toks(id)
      val dupStart = ts.indices.filter(s => s + minLen <= ts.size &&
        gramCount(ts.slice(s, s + minLen).mkString(" ")) >= 2).toSet
      val covered = ts.indices.filter(p =>
        (math.max(0, p - minLen + 1) to p).exists(dupStart)).toSet
      val kept = ts.indices.filterNot(covered).map(ts)
      id -> (kept.mkString(" "), ts.size.toLong, covered.size.toLong)
    }.toMap
  }

  private def runDedup(docs: Seq[(Long, String)], minLen: Int,
                       parts: Int = 1, hashGrams: Boolean = false)
      : Map[Long, (String, Long, Long)] =
    SuffixArray.exactSubstrDedup(
        docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", minLen, hashGrams = hashGrams)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("exactSubstrDedup: a shared >= minLen span vanishes from ALL " +
      "docs; unique text and short repeats survive") {
    val span = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      1L -> s"intro one two $span tail first",
      2L -> s"other opening $span closing words here",
      3L -> "totally unique document alpha beta nothing shared")
    val got = runDedup(docs, minLen = 6)
    // the 6-token span is duplicated; every covering token drops
    assert(!got(1L)._1.contains("gamma") && !got(2L)._1.contains("gamma"))
    assert(got(1L)._3 == 6L && got(2L)._3 == 6L)
    // surrounding unique tokens survive in order
    assert(got(1L)._1 == "intro one two tail first")
    assert(got(2L)._1 == "other opening closing words here")
    // doc 3 shares only a 2-token run ("alpha beta") — below minLen
    assert(got(3L) == (("totally unique document alpha beta nothing shared",
      7L, 0L)))
    assert(got == bruteDedup(docs, 6))
  }

  test("exactSubstrDedup: whole-doc clones empty out; blank docs pass " +
      "through with zero counts") {
    val clone = "one two three four five six seven eight"
    val docs = Seq(1L -> clone, 2L -> clone, 3L -> "  ", 4L -> "tiny doc")
    val got = runDedup(docs, minLen = 8)
    assert(got(1L) == (("", 8L, 8L)) && got(2L) == (("", 8L, 8L)))
    assert(got(3L) == (("", 0L, 0L)))
    assert(got(4L) == (("tiny doc", 2L, 0L)))
    assert(got == bruteDedup(docs, 8))
  }

  test("exactSubstrDedup: brute-force parity and partition invariance " +
      "on an overlapping-repeat corpus") {
    // overlapping duplicated windows inside one doc, self-repeat
    // within a doc, and cross-doc repeats all at once
    val docs = (1L to 24L).map { id =>
      val base = s"doc $id filler ${id * 31 % 17} noise ${id * 13 % 11}"
      val rep = "the quick brown fox jumps over the lazy dog again"
      id -> (if (id % 4 == 0) s"$rep $base $rep"
             else if (id % 4 == 1) s"$base $rep trailing bits"
             else base)
    }
    val exp = bruteDedup(docs, 5)
    assert(runDedup(docs, 5) == exp)
    assert(runDedup(docs, 5, parts = 13) == exp)
  }

  test("exactSubstrDedup: hashGrams (128-bit shuffle key) == exact " +
      "gram strings on every spec corpus") {
    // the 100 TB narrow-shuffle path: two-seed xxhash64 struct keys;
    // identical rewrite on corpora with overlapping/self/cross-doc
    // repeats, whole-doc clones, blanks, and sub-minLen near-misses
    val corpora = Seq(
      (Seq(
        1L -> "intro one two alpha beta gamma delta epsilon zeta tail",
        2L -> "other opening alpha beta gamma delta epsilon zeta close",
        3L -> "totally unique document alpha beta nothing shared"), 6),
      (Seq(1L -> "one two three four five six seven eight",
        2L -> "one two three four five six seven eight",
        3L -> "  ", 4L -> "tiny doc"), 8),
      ((1L to 24L).map { id =>
        val base = s"doc $id filler ${id * 31 % 17} noise ${id * 13 % 11}"
        val rep = "the quick brown fox jumps over the lazy dog again"
        id -> (if (id % 4 == 0) s"$rep $base $rep"
               else if (id % 4 == 1) s"$base $rep trailing bits"
               else base)
      }, 5))
    corpora.foreach { case (docs, minLen) =>
      assert(runDedup(docs, minLen, hashGrams = true)
        == runDedup(docs, minLen))
    }
  }

  test("exactSubstrDedupIncremental: hashGrams (16-byte persisted " +
      "index keys) folds to the exact batch rewrite") {
    val span = "lorem ipsum dolor sit amet consectetur"
    val batch1 = Seq(1L -> s"first doc body $span more words",
      2L -> "second doc totally unrelated content here")
    val batch2 = Seq(10L -> s"late arrival copies $span exactly",
      11L -> "fresh unique late document text")
    val dir = java.nio.file.Files
      .createTempDirectory("sa_inc_h").toString + "/idx"
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val d1 = asMap(SuffixArray.exactSubstrDedupIncremental(spark,
      batch1.toDF("doc_id", "text"), batch1.toDF("doc_id", "text"),
      dir, "doc_id", "text", minLen = 6, hashGrams = true))
    val full = batch1 ++ batch2
    val d2 = asMap(SuffixArray.exactSubstrDedupIncremental(spark,
      batch2.toDF("doc_id", "text"), full.toDF("doc_id", "text"),
      dir, "doc_id", "text", minLen = 6, hashGrams = true))
    assert((d1 ++ d2) == asMap(SuffixArray.exactSubstrDedup(
      full.toDF("doc_id", "text"), "doc_id", "text", 6)))
    assert(d2(1L)._3 == 6L && d2(10L)._3 == 6L) // span gone BOTH sides
  }

  test("exactSubstrDedupIncremental: streamed deltas folded over " +
      "previous output == batch rewrite of the full corpus; untouched " +
      "docs are NOT in the delta") {
    val span = "lorem ipsum dolor sit amet consectetur"
    val batch1 = Seq(
      1L -> s"first doc body $span more words",      // unique span so far
      2L -> "second doc totally unrelated content here",
      3L -> "third doc other words nothing shared")
    val batch2 = Seq(
      10L -> s"late arrival copies $span exactly",   // duplicates doc 1's
      11L -> "fresh unique late document text")
    val dir = java.nio.file.Files
      .createTempDirectory("sa_inc").toString + "/idx"
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val d1 = asMap(SuffixArray.exactSubstrDedupIncremental(spark,
      batch1.toDF("doc_id", "text"), batch1.toDF("doc_id", "text"),
      dir, "doc_id", "text", minLen = 6))
    // first batch: delta covers exactly the batch, equals the batch run
    assert(d1.keySet == Set(1L, 2L, 3L))
    assert(d1 == asMap(SuffixArray.exactSubstrDedup(
      batch1.toDF("doc_id", "text"), "doc_id", "text", 6)))
    assert(d1(1L)._3 == 0L) // span still unique — nothing removed
    val full = batch1 ++ batch2
    val d2 = asMap(SuffixArray.exactSubstrDedupIncremental(spark,
      batch2.toDF("doc_id", "text"), full.toDF("doc_id", "text"),
      dir, "doc_id", "text", minLen = 6))
    // delta 2: both new docs, PLUS doc 1 (its span just became
    // duplicated) — docs 2 and 3 are untouched and absent
    assert(d2.keySet == Set(1L, 10L, 11L))
    val folded = d1 ++ d2
    assert(folded == asMap(SuffixArray.exactSubstrDedup(
      full.toDF("doc_id", "text"), "doc_id", "text", 6)))
    assert(folded(1L)._3 == 6L && folded(10L)._3 == 6L) // span gone BOTH
  }
}
