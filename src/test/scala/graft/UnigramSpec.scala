package graft

import graft.core.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM Viterbi tokenizer: the DP must equal brute-force path
  * enumeration under the exact (score DESC, n ASC, path ASC) order,
  * and the global optimum must be allowed to DISAGREE with greedy
  * longest-match — that divergence is the family's defining property.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations of `word`, best-first under the tie-break. */
  private def brute(word: String, scores: Map[String, Long],
                    maxPiece: Int): Option[(Long, Int, String)] = {
    def rec(pos: Int, path: List[String], s: Long): List[(Long, Int, String)] =
      if (pos == word.length) List((s, path.length, path.reverse.mkString(" ")))
      else (1 to math.min(maxPiece, word.length - pos)).toList.flatMap { l =>
        val p = word.substring(pos, pos + l)
        scores.get(p).toList.flatMap(sc => rec(pos + l, p :: path, s + sc))
      }
    rec(0, Nil, 0L)
      .sortBy { case (s, n, p) => (-s, n, p) }.headOption
  }

  test("encodeWord == brute-force enumeration on every corpus head word") {
    val words = Seq("join", "hash", "row", "batch", "scan", "column",
      "customer", "filter", "small", "slow", "merge", "order", "vector",
      "line", "data", "table", "agg", "value", "key", "stream", "window",
      "a", "spark", "group", "part", "big", "sort", "query", "fast",
      "the", "dup")
    words.foreach { w =>
      val (pieces, score) = Unigram.encodeWord(w, Unigram.FixedScores)
      val Some((bs, bn, bp)) = brute(w, Unigram.FixedScores, Unigram.MaxPiece)
      assert(score == bs && pieces.length == bn && pieces.mkString(" ") == bp,
        s"$w: DP (${pieces.mkString(" ")}, $score) vs brute ($bp, $bs)")
    }
  }

  test("global optimum disagrees with greedy longest-match where scores " +
      "say so; UNK and empty-word conventions hold") {
    // greedy longest-match would take custom(70)+er(20)=90; the global
    // optimum is cust(50)+omer(50)=100
    assert(Unigram.encodeWord("customer", Unigram.FixedScores)._1.toSeq ==
      Seq("cust", "omer"))
    val (tp, ts) = Unigram.encodeWord("table", Unigram.FixedScores)
    assert(tp.toSeq == Seq("ta", "ble") && ts == 75L)
    // a word with a character outside the vocab collapses to [UNK]
    val (up, us) = Unigram.encodeWord("naïve", Unigram.FixedScores)
    assert(up.toSeq == Seq(Unigram.Unk) && us == 0L)
    // empty word: zero pieces at score 0
    val (ep, es) = Unigram.encodeWord("", Unigram.FixedScores)
    assert(ep.isEmpty && es == 0L)
  }

  test("tie-break: equal score prefers fewer pieces, then lex-smallest") {
    // "abab": ab+ab = 20, abab = 20 -> fewer pieces wins (abab)
    val t1 = Map("ab" -> 10L, "abab" -> 20L, "a" -> 1L, "b" -> 1L)
    assert(Unigram.encodeWord("abab", t1)._1.toSeq == Seq("abab"))
    // "ab": a+b (2 pieces, "a b") vs ab (1 piece) at equal score ->
    // fewer pieces wins; then force the lex case with equal counts:
    // "ax"/"xb" both score 5 covering "axb" with single x? construct:
    // "ab" via ("a","b")=10 vs ("ab")=10 -> "ab"
    val t2 = Map("a" -> 5L, "b" -> 5L, "ab" -> 10L)
    assert(Unigram.encodeWord("ab", t2)._1.toSeq == Seq("ab"))
    // equal score AND equal count: "aa" as a+a only; craft 2-way:
    // word "abc": ab+c = 11, a+bc = 11, both 2 pieces -> "a bc" < "ab c"
    val t3 = Map("a" -> 1L, "c" -> 1L, "ab" -> 10L, "bc" -> 10L)
    assert(Unigram.encodeWord("abc", t3)._1.toSeq == Seq("a", "bc"))
  }

  test("encode: doc-level reassembly, score totals, partition invariance") {
    val df = Seq(
      (1L, "customer table"),
      (2L, ""),
      (3L, "the the dup"))
      .toDF("doc_id", "text")
    val out = Unigram.encode(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 4L, 175L, "cust omer ta ble")))
    assert(out(1) == ((2L, 1L, 0L, 0L, "")))
    assert(out(2) == ((3L, 3L, 3L, 95L, "the the dup")))
    val out7 = Unigram.encode(df.repartition(7), "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out7.toSeq == out.toSeq)
  }
}
