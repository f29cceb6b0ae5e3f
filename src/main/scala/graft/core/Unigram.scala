package graft.core

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenization: each word
  * segments to the GLOBALLY best-scoring piece sequence by Viterbi DP
  * — the third tokenizer family next to [[Bpe]] (replays learned
  * merges bottom-up) and [[Wordpiece]] (greedy longest-match
  * top-down). Unigram is neither: it optimizes the WHOLE segmentation,
  * so a locally longer piece loses when a shorter split scores better
  * ("customer" → `cust omer` (100) although greedy longest-match
  * would take `custom er` (90)).
  *
  * Scores are FIXED INTEGER piece weights (a library-constant model,
  * the q85/q124 fixed-model pattern) rather than float log-probs:
  * Viterbi then maximizes an exact BIGINT sum, so the optimal
  * segmentation is engine-exact — no `ln`, no fixed-point rounding,
  * no ulp risk at argmax boundaries. Ties resolve deterministically:
  * higher score, then FEWER pieces, then lexicographically smallest
  * piece string — a total order both engines compute identically
  * (candidates at one position cover the same prefix, so equal-count
  * tied paths are equal-length strings and the lex comparison is
  * decided before any appended suffix).
  *
  * Encoding is fully distributed: scores ride the closure (bounded
  * model state), one `mapPartitions` pass, per-partition word memo so
  * Zipf-repeated words cost one DP each. The DP is a data-dependent
  * position walk (no Catalyst formulation short of materializing
  * every path) — the DuckDB oracle does exactly that: enumerates all
  * segmentations by recursive CTE and takes the same
  * (score DESC, n ASC, path ASC) argmax, which is what makes the
  * semantics relationally checkable.
  */
object Unigram {

  val Unk = "[UNK]"

  /** Longest piece the encoder tries at each position. */
  val MaxPiece = 6

  /** Fixed piece scores: full a–z coverage at score 1 (so clean-alpha
    * words never hit [[Unk]]) plus multi-char pieces tuned to the
    * synthetic corpus head so every frequent word has competing
    * segmentations — including ones where the optimum disagrees with
    * greedy longest-match ("customer", "table").
    */
  val FixedScores: Map[String, Long] = {
    val singles = ('a' to 'z').map(c => c.toString -> 1L)
    val multis = Seq(
      "ta" -> 30L, "tab" -> 40L, "ble" -> 45L, "le" -> 25L,
      "cust" -> 50L, "omer" -> 50L, "custom" -> 70L, "er" -> 20L,
      "win" -> 35L, "dow" -> 35L, "wind" -> 45L, "ow" -> 30L,
      "st" -> 20L, "ream" -> 55L, "stre" -> 40L, "am" -> 25L,
      "jo" -> 25L, "oin" -> 40L, "in" -> 25L,
      "ha" -> 25L, "sh" -> 30L, "as" -> 20L,
      "sc" -> 20L, "an" -> 25L, "ca" -> 20L,
      "fil" -> 30L, "ter" -> 35L, "lter" -> 40L, "fi" -> 15L,
      "ba" -> 20L, "tch" -> 40L, "bat" -> 30L, "ch" -> 25L,
      "sp" -> 20L, "ark" -> 45L, "par" -> 30L,
      "va" -> 20L, "lue" -> 40L, "al" -> 20L, "ue" -> 15L,
      "me" -> 20L, "rge" -> 40L, "mer" -> 30L, "ge" -> 20L,
      "gr" -> 20L, "oup" -> 40L, "ro" -> 20L, "up" -> 25L,
      "or" -> 25L, "der" -> 35L, "ord" -> 30L,
      "co" -> 20L, "lumn" -> 45L, "col" -> 30L, "umn" -> 35L,
      "so" -> 20L, "rt" -> 25L, "sor" -> 30L,
      "sm" -> 20L, "all" -> 40L, "mall" -> 45L,
      "da" -> 20L, "at" -> 20L,
      "ve" -> 20L, "ctor" -> 50L, "vec" -> 30L, "tor" -> 30L,
      "li" -> 20L, "ne" -> 20L, "lin" -> 25L,
      "ke" -> 20L, "ey" -> 25L,
      "sl" -> 20L, "lo" -> 20L,
      "fa" -> 20L, "ast" -> 40L, "fas" -> 25L,
      "ag" -> 20L, "gg" -> 25L,
      "bi" -> 15L, "ig" -> 20L,
      "qu" -> 25L, "ery" -> 40L, "uery" -> 50L,
      "the" -> 30L, "th" -> 20L, "he" -> 20L,
      "dup" -> 35L, "du" -> 15L,
      "art" -> 35L, "pa" -> 20L)
    (singles ++ multis).toMap
  }

  /** Viterbi-optimal segmentation of one word: (pieces, total score).
    * Returns `(Array(Unk), 0)` when no segmentation covers the word
    * (some position matches no piece); the empty word segments to
    * zero pieces at score 0.
    */
  def encodeWord(word: String, scores: Map[String, Long],
                 maxPiece: Int = MaxPiece): (Array[String], Long) = {
    if (word.isEmpty) return (Array.empty[String], 0L)
    // best(i) = optimal (score, nPieces, path) covering word[0, i)
    val best = new Array[(Long, Int, String)](word.length + 1)
    best(0) = (0L, 0, "")
    var i = 1
    while (i <= word.length) {
      var l = 1
      val lMax = math.min(maxPiece, i)
      while (l <= lMax) {
        if (best(i - l) != null) {
          val piece = word.substring(i - l, i)
          scores.get(piece).foreach { s =>
            val (s0, n0, p0) = best(i - l)
            val cand =
              (s0 + s, n0 + 1, if (p0.isEmpty) piece else p0 + " " + piece)
            if (best(i) == null || better(cand, best(i))) best(i) = cand
          }
        }
        l += 1
      }
      i += 1
    }
    best(word.length) match {
      case null => (Array(Unk), 0L)
      case (s, _, path) => (path.split(" "), s)
    }
  }

  /** `a` strictly better than `b` under (score DESC, n ASC, path ASC). */
  private def better(a: (Long, Int, String), b: (Long, Int, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 &&
      (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))

  /** Distributed encode over `textCol`'s whitespace words:
    * (idCol, n_words, n_pieces, score_total, text_pieces).
    * `text_pieces` joins every word's pieces in word order (the q113
    * full-rewrite convention — the oracle pins the exact segmentation)
    * and `score_total` is the exact BIGINT sum of per-word optima.
    * Empty text is ONE empty word (the q22 convention) contributing
    * zero pieces and zero score.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             scores: Map[String, Long] = FixedScores,
             maxPiece: Int = MaxPiece): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol).cast("string"))
        .as[(Long, String)]
    src.mapPartitions { rows =>
      val memo = mutable.HashMap.empty[String, (Array[String], Long)]
      rows.map { case (id, text) =>
        val words = Option(text).getOrElse("").trim.split("\\s+", -1)
        val enc = words.map(w =>
          memo.getOrElseUpdate(w, encodeWord(w, scores, maxPiece)))
        val nPieces = enc.iterator.map(_._1.length.toLong).sum
        val total = enc.iterator.map(_._2).sum
        (id, words.length.toLong, nPieces, total,
          enc.iterator.map(_._1.mkString(" ")).mkString(" "))
      }
    }.toDF(idCol, "n_words", "n_pieces", "score_total", "text_pieces")
  }
}
