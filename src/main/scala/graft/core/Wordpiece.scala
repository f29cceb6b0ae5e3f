package graft.core

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WordPiece-style tokenization: greedy LONGEST-MATCH-FIRST subword
  * segmentation against a fixed vocabulary, continuation pieces
  * prefixed "##", and a whole word collapsing to `[UNK]` the moment
  * any position fails to match (the BERT tokenizer's serving-side
  * semantics) — the second tokenizer family next to [[Bpe]]: BPE
  * REPLAYS learned merges bottom-up, WordPiece SEGMENTS top-down
  * against the finished vocab, which is why WordPiece inference is a
  * pure lookup structure and needs no rank table.
  *
  * Encoding is fully distributed: the vocabulary rides the closure
  * (bounded model state — a vocab is a property of the tokenizer, not
  * the corpus), one `mapPartitions` pass, per-partition word→pieces
  * memo so Zipf-repeated words cost one segmentation each. The same
  * argument as [[Bpe.encode]]: the inner loop is a data-dependent
  * walk over string positions with early exit — no Catalyst
  * formulation expresses it without materializing every (pos, len)
  * candidate, which is exactly what the DuckDB oracle does (and what
  * makes the semantics relationally checkable).
  */
object Wordpiece {

  val Unk = "[UNK]"

  /** Longest raw piece length the encoder will try (continuation
    * pieces measure WITHOUT the "##"). Bounded tries keep the oracle's
    * candidate space (word × pos × ≤MaxPiece) small and the walk
    * O(len/1) worst case.
    */
  val MaxPiece = 8

  /** Fixed, library-constant vocabulary for the oracle-checkable gate
    * (the q85 fixed-BPE-model pattern): full a–z alphabet as both
    * word-initial and continuation singles — so pure-alpha words never
    * hit `[UNK]` and the interesting behavior is WHICH longest pieces
    * win — plus multi-char pieces tuned to the synthetic corpus's
    * head so real words segment through real merges
    * ("table" → ta + ##ble, "customer" → cust + ##omer).
    */
  val FixedVocab: Seq[String] = {
    val singles = ('a' to 'z').map(_.toString)
    val contSingles = ('a' to 'z').map(c => s"##$c")
    val multis = Seq(
      "ta", "##ble", "jo", "##in", "win", "##dow", "cust", "##omer",
      "sc", "##an", "qu", "##ery", "st", "##ream", "fil", "##ter",
      "ba", "##tch", "sp", "##ark", "va", "##lue", "me", "##rge",
      "gr", "##oup", "co", "##lumn", "or", "##der", "so", "##rt",
      "sm", "##all", "da", "##ta", "ve", "##ctor", "ha", "##sh",
      "li", "##ne", "ro", "##w", "ke", "##y", "sl", "##ow",
      "fa", "##st", "ag", "##g", "bi", "##g", "##ert", "##ate")
    singles ++ contSingles ++ multis
  }

  /** Greedy longest-match segmentation of one word. Returns
    * `Array(Unk)` when any position has no matching piece; the empty
    * word segments to zero pieces.
    */
  def encodeWord(word: String, vocab: Set[String],
                 maxPiece: Int = MaxPiece): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var l = math.min(maxPiece, word.length - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val raw = word.substring(pos, pos + l)
        val cand = if (pos == 0) raw else s"##$raw"
        if (vocab.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) return Array(Unk)
      out += hit
      pos += l
    }
    out.toArray
  }

  /** Distributed encode over `textCol`'s whitespace words:
    * (idCol, n_words, n_pieces, n_unk, text_pieces). `text_pieces`
    * joins every word's pieces in word order — the q113 full-rewrite
    * convention, so the oracle pins the exact segmentation, not just
    * its counts. Empty text is ONE empty word (the q22 convention)
    * contributing zero pieces.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             vocab: Seq[String] = FixedVocab,
             maxPiece: Int = MaxPiece): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vset = vocab.toSet
    val src: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol).cast("string"))
        .as[(Long, String)]
    src.mapPartitions { rows =>
      val memo = mutable.HashMap.empty[String, Array[String]]
      rows.map { case (id, text) =>
        val words = Option(text).getOrElse("").trim.split("\\s+", -1)
        val enc = words.map(w =>
          memo.getOrElseUpdate(w, encodeWord(w, vset, maxPiece)))
        val nPieces = enc.iterator.map(_.length.toLong).sum
        val nUnk = enc.count(p => p.length == 1 && p(0) == Unk).toLong
        (id, words.length.toLong, nPieces, nUnk,
          enc.iterator.map(_.mkString(" ")).mkString(" "))
      }
    }.toDF(idCol, "n_words", "n_pieces", "n_unk", "text_pieces")
  }
}
