package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` expressions (no
  * UDFs) so whole-stage codegen keeps the scan -> score pipeline in one
  * pass; all hashes are engine-portable (polynomial char hash / md5),
  * never Spark's murmur3, so an external oracle can reproduce them.
  */
object TextAnalysis {

  /** Whitespace tokenization of already-lowercased synthetic text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Portable polynomial rolling hash over a string's characters:
    * fold(acc = (acc * 31 + codepoint) mod 1e9+7). Deterministic and
    * reproducible in any engine with ascii() + a list fold. Used for
    * token hashes, document fingerprints and SimHash bit sources.
    * Backed by a native codegen Expression
    * ([[graft.expressions.RollingHash]]); [[rollingHashHof]] is the
    * built-ins-only formulation kept as its semantic oracle.
    */
  def rollingHash(s: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.expressions.RollingHash(org.apache.spark.sql.GraftShim.expression(s)))

  /** Higher-order-function formulation of [[rollingHash]] — identical
    * semantics, interpreted execution (ArrayAggregate is
    * CodegenFallback). Used in tests to pin the native expression.
    */
  def rollingHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c)),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)

  /** BPE-ish tokenization regex: letter runs, digit runs, single
    * punctuation marks — the cheap approximation of subword tokenizer
    * piece counts (letters dominate; digits and punctuation split
    * off, as GPT-style pre-tokenizers do). Plain character classes so
    * Java regex and RE2 engines agree.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Per-document token/char statistics (quality features):
    * whitespace token count, BPE-ish regex token count, char count,
    * mean token length.
    */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.withColumn("n_tokens", size(t))
      .withColumn("n_tokens_bpeish", regexp_count(col(textCol), lit(BpeishPattern)))
      .withColumn("n_chars", length(col(textCol)))
      .withColumn("mean_token_len",
        (length(regexp_replace(col(textCol), "\\s+", "")).cast("double") / size(t)))
  }

  /** Quality scoring: stopword ratio, punctuation ratio, alpha ratio.
    * A low-stopword or punctuation-heavy doc is low quality — the
    * standard cheap pre-filter before expensive dedup/embedding stages.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val stopArr = array(StopWords.map(lit): _*)
    df.withColumn("n_tokens", size(t))
      .withColumn("stopword_ratio",
        size(filter(t, tok => array_contains(stopArr, tok))).cast("double") / size(t))
      .withColumn("punct_ratio",
        length(regexp_replace(col(textCol), "[^.,;:!?]", "")).cast("double")
          / length(col(textCol)))
      .withColumn("alpha_ratio",
        length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double")
          / length(col(textCol)))
      .withColumn("quality_score",
        round(col("stopword_ratio") * 0.4 + col("alpha_ratio") * 0.6
          - col("punct_ratio") * 0.5, 6))
  }

  /** Language-ID heuristic (n-gram profile + marker words): score per
    * language = marker-word hits + occurrence count of that language's
    * characteristic char trigrams (the classic Cavnar-Trenkle n-gram
    * profile, reduced to a fixed top-profile set); argmax wins, ties
    * broken by language code order. Fully declarative, one pass;
    * trigram occurrences are counted with length arithmetic
    * ((len − len(remove(text, g))) / len(g)), portable to any engine.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"))

  /** Characteristic char trigram profiles per language. */
  val LangTrigrams: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "ing", "he "),
    "es" -> Seq("ión", "os ", "que"),
    "de" -> Seq("sch", "ein", "und"),
    "fr" -> Seq("eau", "oux", "ent"))

  private def occurrences(text: Column, g: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(g), "")))
      / g.length).cast("long")

  def langId(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val scored = LangMarkers.toSeq.sortBy(_._1).foldLeft(df) { case (d, (lang, markers)) =>
      val arr = array(markers.map(lit): _*)
      val markerScore = size(filter(t, tok => array_contains(arr, tok))).cast("long")
      val trigramScore = LangTrigrams(lang)
        .map(g => occurrences(col(textCol), g))
        .reduce(_ + _)
      d.withColumn(s"score_$lang", markerScore + trigramScore)
    }
    val langs = LangMarkers.keys.toSeq.sorted
    val best = langs.tail.foldLeft(
      struct(col(s"score_${langs.head}").as("s"), lit(langs.head).as("l"))) { (acc, lang) =>
      when(col(s"score_$lang") > acc.getField("s"),
        struct(col(s"score_$lang").as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    scored.withColumn("lang_pred", best.getField("l"))
  }

  /** TF-IDF per (doc, term): tf = in-doc term count, idf =
    * ln((1+N)/(1+df)) + 1 (smooth). Two grouped aggregations plus a
    * broadcast of the tiny df table; the corpus size N is a scalar
    * cross join, not a collect.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Document fingerprint: rolling hash over the full text — a compact
    * order-sensitive signature (exact-dup detection without storing
    * text; the reference has no equivalent, this is the training-data
    * pipeline extension).
    */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", rollingHash(col(textCol)))
}
