package graft

import graft.core.Wordpiece
import org.apache.spark.sql.functions._

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private val vset = Wordpiece.FixedVocab.toSet

  test("encodeWord: greedy longest-match picks the longest piece at " +
      "every position, hand-checked segmentations") {
    assert(Wordpiece.encodeWord("table", vset).toSeq == Seq("ta", "##ble"))
    assert(Wordpiece.encodeWord("customer", vset).toSeq ==
      Seq("cust", "##omer"))
    assert(Wordpiece.encodeWord("join", vset).toSeq == Seq("jo", "##in"))
    // greedy, not optimal: "scan" takes "sc" (longest at 0) then
    // "##an" — and never reconsiders
    assert(Wordpiece.encodeWord("scan", vset).toSeq == Seq("sc", "##an"))
    // a word no multi-piece covers falls through to singles
    assert(Wordpiece.encodeWord("xyz", vset).toSeq ==
      Seq("x", "##y", "##z"))
  }

  test("encodeWord: any unmatched position collapses the WHOLE word " +
      "to [UNK]; the empty word is zero pieces") {
    // 'ï' has no piece: even though 'na' + ... matched so far, the
    // word is [UNK] (the BERT serving rule — no partial emissions)
    assert(Wordpiece.encodeWord("naïve", vset).toSeq == Seq(Wordpiece.Unk))
    assert(Wordpiece.encodeWord("", vset).toSeq == Seq.empty)
  }

  test("encode: per-doc counts and full segmentation, partition-" +
      "invariant, empty text is one empty word with zero pieces") {
    val docs = Seq(
      (1L, "table join"),
      (2L, "naïve scan"),
      (3L, "")).toDF("doc_id", "text")
    val got = Wordpiece.encode(docs, "doc_id", "text")
      .select("doc_id", "n_words", "n_pieces", "n_unk", "text_pieces")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 4L, 0L, "ta ##ble jo ##in"),
      (2L, 2L, 3L, 1L, "[UNK] sc ##an"),
      (3L, 1L, 0L, 0L, "")))
    val re = Wordpiece.encode(docs.repartition(5), "doc_id", "text")
      .select("doc_id", "n_words", "n_pieces", "n_unk", "text_pieces")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(re == got)
  }
}
