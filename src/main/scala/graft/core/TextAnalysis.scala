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

  /** Unicode NFC normalization (canonical composition) — the ingest
    * hygiene step that makes precomposed and decomposed spellings of
    * the same text identical BEFORE any hash, dedup key or equality
    * join sees them. Native codegen expression
    * ([[graft.expressions.NfcNormalize]]) over the JDK normalizer —
    * the same Unicode-standard algorithm as DuckDB's `nfc_normalize`,
    * which is what lets the gate oracle the transform exactly.
    */
  def nfcNormalize(s: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.expressions.NfcNormalize(
        org.apache.spark.sql.GraftShim.expression(s)))

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

  /** Keyword-in-context extraction — the targeted-data-selection
    * operator: every occurrence of `term` becomes a ±`radius`-token
    * window with provenance (doc, token position). One scan: tokenize,
    * posexplode to positions, filter on the term (dies inside the scan
    * stage), slice the window from the row's own token array — no
    * join, no shuffle; windows of a 100 TB corpus stream to the sink.
    * Positions are 1-based; windows clamp at document edges.
    */
  def contextWindows(df: DataFrame, textCol: String, term: String,
                     radius: Int, idCol: String = "doc_id"): DataFrame = {
    require(radius >= 0, "radius must be non-negative")
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        posexplode(col("__t")).as(Seq("__p0", "__tok")))
      .filter(col("__tok") === term)
      .select(col(idCol), (col("__p0") + 1).cast("long").as("pos"),
        concat_ws(" ", slice(col("__t"),
          greatest(col("__p0") + 1 - radius, lit(1)),
          least(col("__p0") + 1 + radius, size(col("__t")))
            - greatest(col("__p0") + 1 - radius, lit(1)) + 1))
          .as("window"))
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

  /** ALL word n-grams of a text, one per window position (duplicates
    * kept — [[Dedup.shingles]] is the distinct variant). Same edge
    * semantics: a doc shorter than n words yields its single partial
    * gram. Native single-pass expression; [[ngramsAllHof]] is the
    * built-ins-only semantic oracle (its lambda re-splits the text per
    * window position — measured 2x+ slower end-to-end).
    */
  def ngramsAll(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.expressions.ShingleArray(
        org.apache.spark.sql.GraftShim.expression(text), n, distinct = false))

  /** HOF formulation of [[ngramsAll]], kept as its test oracle. */
  def ngramsAllHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** 1 − distinct/total tokens as a composable Column — the Gopher
    * duplicate-token gate signal. Exposed so compositions (Curation's
    * stage 1) can fuse it into an existing projection instead of
    * joining [[repetitionStats]]' output back on the doc key.
    */
  def dupTokenRatio(text: Column): Column =
    round(lit(1.0) - size(array_distinct(tokens(text))).cast("double")
      / size(tokens(text)), 6)

  /** Repetition statistics (Gopher-style quality rules, Rae et al.
    * 2021 §A1.1): natural text repeats itself far less than
    * boilerplate/spam, so the fraction of the doc covered by its most
    * frequent n-gram and the duplicate-token fraction are strong cheap
    * quality signals.
    *
    * `dup_token_ratio` is pure array math (one codegen'd pass, no
    * shuffle). The top-n-gram count needs a per-(doc, gram) frequency:
    * explode -> two key-partitioned aggregations — the same shape as
    * [[Dedup.simhashTable]], scales as total gram instances.
    *
    * Output per doc: `n_tokens`, `dup_token_ratio` (1 − distinct/total
    * tokens), `top_ngram_count` (occurrences of the most frequent
    * n-gram), `top_ngram_ratio` (token share covered by it, ≈ n ×
    * count / n_tokens, capped at 1.0 for the short-doc edge).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame =
    // Every output is per-row arithmetic over the row's own text — the
    // top-gram count via the native single-pass expression — so the
    // whole gate is ONE projection fused into the scan: no Generate,
    // no exchanges, no join. (The relational form below kept two key
    // exchanges busy carrying every gram instance of the corpus.)
    df.select(col(idCol),
        size(tokens(col(textCol))).as("n_tokens"),
        dupTokenRatio(col(textCol)).as("dup_token_ratio"),
        org.apache.spark.sql.GraftShim.column(
          graft.expressions.TopGramCount(
            org.apache.spark.sql.GraftShim.expression(col(textCol)), n))
          .as("top_ngram_count"))
      .withColumn("top_ngram_ratio",
        round(least(lit(1.0),
          col("top_ngram_count") * n / col("n_tokens")), 6))

  /** The exploded relational formulation of [[repetitionStats]] — kept
    * as the semantic oracle for the native [[graft.expressions.TopGramCount]]
    * path (the q53 DuckDB oracle is this same shape in SQL).
    */
  def repetitionStatsRelational(df: DataFrame, idCol: String, textCol: String,
                                n: Int = 2): DataFrame = {
    // Two independent branches joined on the doc key. Do NOT select the
    // scalar stats next to the explode: Spark projects non-generator
    // expressions ABOVE the Generate, so split/array_distinct would
    // re-run once per emitted gram row — measured 12x slower on the
    // composed form (same CollapseProject re-inlining class of failure
    // as the simhash/shingle incidents in ROUND_NOTES).
    val stats = df.select(col(idCol),
      size(tokens(col(textCol))).as("n_tokens"),
      round(lit(1.0) - size(array_distinct(tokens(col(textCol)))).cast("double")
        / size(tokens(col(textCol))), 6).as("dup_token_ratio"))
    val grams = df.select(col(idCol), explode(ngramsAll(col(textCol), n)).as("__gram"))
    val top = grams
      .groupBy(col(idCol), col("__gram")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("top_ngram_count"))
    // every doc emits >= 1 gram (short docs yield their partial gram),
    // so the join is total; inner join keeps the null-free schema
    stats.join(top, Seq(idCol))
      .withColumn("top_ngram_ratio",
        round(least(lit(1.0),
          col("top_ngram_count") * n / col("n_tokens")), 6))
  }

  /** PII scrubbing: redact emails, dashed US-style phone numbers and
    * long digit runs (ids / account numbers), and count each class.
    * Patterns use only plain character classes so the Java regex
    * engine (Spark) and RE2 (oracle engines) agree exactly. Counts are
    * taken on the ORIGINAL text; replacements apply email → phone →
    * id so a redaction never creates a new match for a later pattern.
    * One codegen'd projection — at 100 TB this runs inside the scan's
    * WholeStageCodegen span, no shuffle.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val IdPattern = "[0-9]{9,}"

  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhonePattern)))
      .withColumn("n_ids", regexp_count(col(textCol), lit(IdPattern)))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
            PhonePattern, "<PHONE>"),
          IdPattern, "<ID>"))

  /** Degenerate-generation LOOP detector — the model-output QA
    * signal (and a synthetic-data gate): a decoder stuck in a cycle
    * emits a document whose TAIL is one token cycle repeated ("the
    * the the", "is a good idea. is a good idea."). For each period
    * p ∈ 1..maxPeriod the trailing match length s_p = the longest
    * suffix where every token equals the token p positions earlier;
    * the final p-cycle then appears ⌊s_p/p⌋ + 1 times consecutively.
    * A doc flags when any period reaches `minRepeats` (ties to the
    * SMALLEST period — the fundamental cycle, not its multiples).
    *
    * Pure per-row projection (no UDF, no shuffle): the tokens array
    * materializes once in its own projection (multi-use keeps
    * CollapseProject from re-inlining the split per lambda element —
    * the bigramsOf lesson), each period is one
    * transform→filter→array_min fold (first mismatch from the end),
    * and the best period is an `array_max` over (repeats, −p)
    * structs. O(maxPeriod · tokens) per row, row-bounded state.
    *
    * Output: (idCol, n_tokens, best_period, best_repeats, loop_flag).
    */
  def loopDetect(df: DataFrame, idCol: String, textCol: String,
                 maxPeriod: Int = 8, minRepeats: Int = 3): DataFrame = {
    require(maxPeriod >= 1 && maxPeriod <= 64,
      "maxPeriod must be in [1, 64]")
    require(minRepeats >= 2, "minRepeats must be >= 2")
    val base = df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .withColumn("L", size(col("tk")).cast("long"))
    val cands = (1 to maxPeriod).map { p =>
      s"""struct(
          CASE WHEN L >= ${2 * p} THEN
            (coalesce(array_min(filter(
              transform(sequence(1, CAST(L - $p AS INT)),
                i -> CASE WHEN element_at(tk, CAST(L - i + 1 AS INT))
                       != element_at(tk, CAST(L - i + 1 - $p AS INT))
                     THEN CAST(i AS BIGINT) END),
              x -> x IS NOT NULL)) - 1L, L - $p) DIV $p) + 1L
          ELSE 1L END AS r,
          ${-p}L AS np)"""
    }.mkString("array(", ", ", ")")
    base.select(col(idCol), col("L").as("n_tokens"),
        expr(s"array_max($cands)").as("b"))
      .select(col(idCol), col("n_tokens"),
        (-col("b.np")).cast("long").as("best_period"),
        col("b.r").cast("long").as("best_repeats"),
        (col("b.r") >= minRepeats).as("loop_flag"))
  }

  /** Separator-tolerant payment-card candidate: 13–19 digits with
    * optional single space/dash joints. Non-capturing group only —
    * Java regex (Spark) and RE2 (oracle) take the same maximal
    * match.
    */
  val CardPattern = "[0-9](?:[ -]?[0-9]){12,18}"

  /** Luhn-validated payment-card detection/redaction — the PII class
    * [[scrubPii]]'s plain digit-run heuristic cannot separate from
    * benign ids: a 13–19-digit run is only a CANDIDATE; the Luhn
    * mod-10 checksum (ISO/IEC 7812 — the card industry's own check
    * digit) rejects 90% of random digit runs per candidate, so the
    * audit counts distinguish "long numbers" from "payment cards".
    *
    * Everything is expression-level (no UDF): candidates via
    * `regexp_extract_all`, normalization via `translate`, the
    * checksum as one `aggregate` fold over reversed digit positions
    * (double every second digit, subtract 9 on overflow), redaction
    * as one fold replacing each VALID candidate's matched text with
    * `<CARD>` — longest candidates first so a shorter valid
    * candidate that is a substring of a longer match cannot corrupt
    * it, and each replace ANCHORED to non-digit boundaries so a
    * candidate's digits occurring inside a longer (unmatched or
    * invalid) digit run are never touched (capture-group anchors,
    * not lookaround — Java regex and the oracle's RE2 agree).
    * Counts are on the original text. One codegen'd projection;
    * at 100 TB this runs inside the scan's WholeStageCodegen span,
    * no shuffle.
    *
    * Output: input row + (n_card_candidates, n_cards_valid,
    * scrubbed).
    */
  def scrubCards(df: DataFrame, textCol: String): DataFrame = {
    // Luhn sum over d = reverse(digits): position i (0-based) odd →
    // doubled. The candidate string is ≤ 23 chars, so re-deriving d
    // inside the lambda is nanoseconds; codegen CSE shares it.
    val luhnOk =
      """(c -> pmod(aggregate(
        |  sequence(0, length(translate(c, '- ', '')) - 1), 0L,
        |  (acc, i) -> acc + CASE WHEN i % 2 = 1 THEN
        |      CASE WHEN (ascii(substr(reverse(translate(c, '- ', '')),
        |          CAST(i + 1 AS INT), 1)) - 48) * 2 > 9
        |        THEN (ascii(substr(reverse(translate(c, '- ', '')),
        |          CAST(i + 1 AS INT), 1)) - 48) * 2 - 9
        |        ELSE (ascii(substr(reverse(translate(c, '- ', '')),
        |          CAST(i + 1 AS INT), 1)) - 48) * 2 END
        |    ELSE ascii(substr(reverse(translate(c, '- ', '')),
        |      CAST(i + 1 AS INT), 1)) - 48 END), 10) = 0)"""
        .stripMargin.replaceAll("\n", " ")
    df.withColumn("__cands",
        regexp_extract_all(col(textCol), lit(CardPattern), lit(0)))
      .withColumn("__valid", expr(s"filter(__cands, $luhnOk)"))
      .withColumn("n_card_candidates", size(col("__cands")).cast("long"))
      .withColumn("n_cards_valid", size(col("__valid")).cast("long"))
      .withColumn("scrubbed", expr(
        // replacement is ANCHORED to non-digit (or string) boundaries,
        // so a valid candidate's digit string occurring INSIDE a longer
        // digit run (one regexp_extract_all matched as a different,
        // invalid candidate) is left intact — a plain substring replace
        // would mangle it. Two passes because a lone separator between
        // adjacent occurrences is consumed by the first match; after
        // pass 1 every survivor borders replaced (non-digit) text.
        // Digits/space/hyphen only, so c embeds literally in the regex.
        s"""aggregate(
            array_sort(__valid, (a, b) -> CASE
              WHEN length(a) > length(b) THEN -1
              WHEN length(a) < length(b) THEN 1
              WHEN a < b THEN -1 WHEN a > b THEN 1 ELSE 0 END),
            $textCol, (acc, c) -> regexp_replace(regexp_replace(acc,
              concat('(^|[^0-9])', c, '([^0-9]|$$)'), '$$1<CARD>$$2'),
              concat('(^|[^0-9])', c, '([^0-9]|$$)'), '$$1<CARD>$$2'))"""))
      .drop("__cands", "__valid")
  }

  /** Markup stripping (web-corpus cleaning): drop `<script>`/`<style>`
    * elements WITH their contents, drop remaining tags, decode the
    * five core HTML entities, collapse runs of whitespace. Plain
    * regexes (no backreferences, no lookahead) so Java regex and RE2
    * agree; one codegen'd projection, no shuffle. A real boilerplate
    * extractor (readability scoring, DOM segmentation) would slot in
    * at the same operator position.
    */
  def stripMarkup(df: DataFrame, textCol: String,
                  outCol: String = "clean_text"): DataFrame = {
    val noScript = regexp_replace(col(textCol),
      "<script[^>]*>[^<]*</script>|<style[^>]*>[^<]*</style>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    // &amp; decodes LAST so "&amp;lt;" becomes "&lt;" (one level), not "<"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    df.withColumn(outCol, trim(regexp_replace(decoded, "\\s+", " ")))
  }

  /** Hash-seeded span corruption (the T5/UL2 denoising objective's
    * data side): ~`startPermille`/1000 of positions seed a span of
    * `minSpan + (h DIV 1000) mod spanChoices` tokens, a token is
    * masked when ANY span covers it (union coverage — overlapping
    * seeds merge, which is also what makes the semantics fully
    * declarative: no greedy walk), and each contiguous masked run is
    * replaced by one per-document sentinel `<X0>, <X1>, …` in order.
    * "Randomness" is the portable rolling hash of `"id:pos"` — the
    * corruption is a pure function of the data, reproducible across
    * engines/runs/partitionings (a training pipeline wants exactly
    * this: re-materializing an epoch yields the same masks).
    *
    * Shapes: one posexplode (ints + token), span coverage via
    * sequence-explode + distinct (span fan-out ≤ minSpan+spanChoices
    * rows per seed), run detection with per-DOCUMENT windows (bounded
    * by doc length, never a global window), one aggregation back to
    * doc rows.
    *
    * @return (idCol, n_tokens, n_masked, n_spans, corrupted_text)
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  startPermille: Int = 50, minSpan: Int = 2,
                  spanChoices: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(startPermille >= 0 && startPermille <= 1000 &&
      minSpan >= 1 && spanChoices >= 1, "bad corruption parameters")
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val seeded = toks.withColumn("__h",
      rollingHash(concat_ws(":", col(idCol).cast("string"),
        col("pos").cast("string"))))
    val covered = seeded
      .filter(col("__h") % 1000 < startPermille)
      .withColumn("__len",
        lit(minSpan) + expr(s"(__h DIV 1000L) % ${spanChoices}L"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + col("__len") - 1))
          .as("pos"))
      .distinct()
    val flagged = toks
      .join(covered.withColumn("__m", lit(true)), Seq(idCol, "pos"), "left")
      .withColumn("masked", coalesce(col("__m"), lit(false)))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val runs = flagged
      .withColumn("__rs", col("masked") &&
        !coalesce(lag(col("masked"), 1).over(w), lit(false)))
      .withColumn("__rid",
        sum(when(col("__rs"), 1L).otherwise(0L)).over(w))
    val pieces = runs.withColumn("__piece",
      when(!col("masked"), col("tok"))
        .when(col("__rs"),
          concat(lit("<X"), (col("__rid") - 1).cast("string"), lit(">"))))
    pieces.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
        max(col("__rid")).as("n_spans"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__piece").isNotNull,
            struct(col("pos"), col("__piece").as("p"))))),
          s => s.getField("p"))).as("corrupted_text"))
  }

  /** Sliding token-window chunking (the RAG/embedding-prep shape):
    * each document yields windows of `size` tokens advancing by
    * `size − overlap`, so consecutive chunks share `overlap` tokens —
    * boundary-spanning sentences appear whole in at least one chunk.
    * Fully declarative (sequence → explode → slice — chunk fan-out is
    * ceil(n/step) rows per doc, no custom code), embarrassingly
    * parallel, and the chunk keeps its provenance (`chunk_start`
    * token offset) so retrieval hits map back into the source.
    * Empty text is ONE empty token (the q22 convention) → one empty
    * chunk at offset 0.
    *
    * @return (idCol, chunk_idx, chunk_start, n_chunk_tokens, chunk_text)
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    size: Int, overlap: Int): DataFrame = {
    require(size >= 1 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val t = tokens(col(textCol))
    df.select(col(idCol), t.as("__t"))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0),
          greatest(org.apache.spark.sql.functions.size(col("__t")) - 1, lit(0)),
          lit(step))).as("chunk_start"))
      .select(col(idCol),
        expr(s"chunk_start DIV $step").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        slice(col("__t"), col("chunk_start") + 1, lit(size)).as("__c"))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        org.apache.spark.sql.functions.size(col("__c")).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  /** Corpus-wide chunk-level dedup (the C4/RefinedWeb paragraph-dedup
    * shape): documents split into fixed `chunkWords`-word windows, a
    * chunk's FIRST occurrence in (doc, position) order survives, every
    * later repeat — within the same doc or any other — is dropped, and
    * the surviving chunks reassemble per document in original order.
    * Sub-document granularity catches boilerplate (headers, footers,
    * license blocks) that whole-document dedup can't: the containing
    * docs differ, the paragraph repeats.
    *
    * Windows stand in for paragraphs here because the synthetic corpus
    * has no newline structure; with real text, pass the split column
    * directly (same pipeline from `posexplode` down).
    *
    * Shapes: one exchange keyed on the chunk STRING for the
    * first-occurrence window (string keys keep the DuckDB oracle
    * exact; at 100 TB shuffle (hash, doc, pos) and re-join the
    * winning text instead), one exchange on the doc id for
    * reassembly. Output: (id, n_kept, text_dedup) — a document whose
    * every chunk was seen earlier drops out entirely.
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(chunkWords >= 1, "chunkWords must be >= 1")
    val words = tokens(col(textCol))
    val chunks = transform(
      sequence(lit(0), ((size(words) - 1) / chunkWords).cast("int")),
      i => concat_ws(" ", slice(words, i * chunkWords + 1, lit(chunkWords))))
    val exploded = df
      .select(col(idCol), posexplode(chunks).as(Seq("pos", "chunk")))
    val firstWins = Window.partitionBy(col("chunk"))
      .orderBy(col(idCol), col("pos"))
    val kept = exploded
      .withColumn("rn", row_number().over(firstWins))
      .filter(col("rn") === 1)
    kept.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s.getField("chunk"))).as("text_dedup"))
  }

  /** Exact-substring duplication signal (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" use
    * suffix arrays for unbounded-length exact substrings; this is the
    * bounded-width Spark-native equivalent): every n-token sliding
    * window (stride 1 — the native ShingleArray generator), hashed
    * portably; a window occurring anywhere else in the corpus (≥ 2
    * occurrences globally) marks its token span as duplicated, and
    * per-doc coverage is the interval UNION of flagged spans.
    *
    * Plan shape: one Generate → ONE exchange on the window hash (a
    * count-over-window, not an agg-plus-self-join — flagging reuses
    * the same exchange) → one exchange on the doc for the
    * interval-union lead() and the rollup. Shuffles carry (id, pos,
    * hash) — never window text. Output per doc: token/window counts,
    * duplicated-window count, covered-token count and ratio; docs with
    * no duplicated span report zeros.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, "window width must be >= 1")
    val wins = df.select(col(idCol),
        posexplode(ngramsAll(col(textCol), n)).as(Seq("pos", "win")))
      .select(col(idCol), col("pos"), rollingHash(col("win")).as("h"))
    val byH = Window.partitionBy(col("h"))
    val flagged = wins
      .withColumn("cnt", count(lit(1)).over(byH))
      .filter(col("cnt") >= 2)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // interval union of [pos, pos+n): each span contributes up to the
    // next flagged start; the last runs its full width (clamped to the
    // doc below, for the one truncated window of a short doc)
    val cov = flagged
      .withColumn("nxt", lead(col("pos"), 1).over(byDoc))
      .withColumn("covered",
        when(col("nxt").isNull, lit(n.toLong))
          .otherwise(least(lit(n.toLong), (col("nxt") - col("pos")).cast("long"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_windows"), sum("covered").as("dup_raw"))
    val t = tokens(col(textCol))
    df.select(col(idCol), size(t).cast("long").as("n_tokens"),
        size(ngramsAll(col(textCol), n)).cast("long").as("n_windows"))
      .join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        least(coalesce(col("dup_raw"), lit(0L)), col("n_tokens")).as("dup_tokens"))
      .withColumn("dup_ratio",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
  }

  /** The REMOVAL form of [[dupSpans]] — the transform Lee et al. 2022
    * actually apply to the training corpus: every n-token window that
    * occurs elsewhere in the corpus keeps its globally-FIRST
    * occurrence (ordered by (id, pos)) and has every other
    * occurrence's token span deleted; the doc is rebuilt from the
    * surviving tokens in order.
    *
    * Plan shape: windows hash-flagged on ONE exchange keyed by the
    * window hash (the occurrence count and the first-occurrence
    * row_number share it); flagged non-first spans explode to at most
    * n (id, tokpos) int pairs AFTER the window text is dropped; the
    * kept-token anti-join and ordered reassembly key on the doc.
    * Nothing wider than (id, pos, token) ever shuffles, and the
    * per-doc collect is bounded by document length — the q66
    * reassembly contract.
    *
    * @return (idCol, n_tokens, n_kept, n_removed, text_scrubbed) one
    *         row per input doc; a fully-duplicated doc survives with
    *         empty text and n_kept = 0.
    */
  def scrubDupSpans(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, "window width must be >= 1")
    val wins = df.select(col(idCol),
        posexplode(ngramsAll(col(textCol), n)).as(Seq("pos", "win")))
      .select(col(idCol), col("pos"), rollingHash(col("win")).as("h"))
    val byH = Window.partitionBy(col("h"))
    val byHOrd = byH.orderBy(col(idCol), col("pos"))
    val toRemove = wins
      .withColumn("cnt", count(lit(1)).over(byH))
      .withColumn("rn", row_number().over(byHOrd))
      .filter(col("cnt") >= 2 && col("rn") > 1)
    val removedPos = toRemove
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tp"))
      .distinct()
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("tp", "tok")))
    val rebuilt = toks.join(removedPos, Seq(idCol, "tp"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok"))).as("text_scrubbed"))
    df.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"))
  }

  /** Out-of-vocabulary drift: each group's share of tokens that fall
    * outside a reference vocabulary — the tokenizer-health stat a
    * rollout dashboard tracks next to PSI/KS (a source whose OOV rate
    * climbs is drifting away from the vocabulary the tokenizer was
    * trained on, which shows up downstream as fertility blow-up,
    * q92's metric).
    *
    * `vocab` is a one-column (`tok`) reference table — typically the
    * persisted head of the training corpus ([[topVocab]]) or a BPE
    * vocab (model-as-table, the q68/q70 discipline). It is broadcast;
    * the corpus side is one Generate → broadcast left join → one
    * grouped aggregation. Tokens shuffle only as (group, BIGINT)
    * partial counts; the rate is an exact integer fixed-point
    * (`n_oov·1e6 DIV n_tokens`), so the oracle hash-matches with no
    * float surface.
    *
    * @return (groupCol, n_tokens, n_oov, oov_micro) one row per group
    */
  def oovRate(df: DataFrame, groupCol: String, textCol: String,
              vocab: DataFrame): DataFrame = {
    val toks = df.select(col(groupCol), explode(tokens(col(textCol))).as("tok"))
    toks.join(broadcast(vocab.select(col("tok"), lit(1).as("__in"))),
        Seq("tok"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in").isNull, 1)).as("n_oov"))
      .withColumn("oov_micro",
        expr("n_oov * 1000000 DIV n_tokens"))
  }

  /** Reference vocabulary: the corpus's `size` most frequent tokens,
    * deterministic under the (count desc, token asc) total order —
    * one Generate → map-side-combined count → TakeOrderedAndProject.
    * Bounded output (`size` rows) by construction; persist it as a
    * table and [[oovRate]] never recomputes it.
    */
  def topVocab(df: DataFrame, textCol: String, size: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("tok")).limit(size)
      .select("tok")

  /** Document fingerprint: rolling hash over the full text — a compact
    * order-sensitive signature (exact-dup detection without storing
    * text; the reference has no equivalent, this is the training-data
    * pipeline extension).
    */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", rollingHash(col(textCol)))

  /** Distinct-n corpus diversity per source (Li et al., NAACL 2016's
    * distinct-1/2, lifted from generation eval to the corpus audit):
    * the share of a source's word n-gram OCCURRENCES that are
    * distinct — 1.0 = every n-gram unique (maximal diversity), → 0
    * under heavy cross-document templating. The CORPUS-level
    * repetition companion to the per-doc [[repetitionStats]] gates:
    * a source can pass every per-doc gate and still be 99% one
    * template ACROSS documents — this catches it, and is the linear
    * proxy for self-BLEU (which costs a quadratic pair sweep).
    *
    * Plan: one gram explode → one (source, gram) grouped count → one
    * per-source aggregation — all map-side-combinable; post-agg
    * state is the source's distinct-gram table, never raw rows.
    * Exact integers, floored micro ratio (SQL-replayable). Docs with
    * fewer than n tokens contribute nothing; a source with zero
    * grams does not appear.
    *
    * Output per source: (source, n_grams, n_distinct, distinct_micro).
    */
  def distinctN(df: DataFrame, sourceCol: Column, textCol: Column,
                n: Int = 2): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val base = df.select(sourceCol.as("source"), tokens(textCol).as("tk"))
    val g = base.select(col("source"), explode(expr(
      s"""CASE WHEN size(tk) >= $n AND NOT (size(tk) = 1 AND tk[0] = '')
          THEN transform(sequence(0, size(tk) - $n),
            s -> concat_ws(' ', slice(tk, s + 1, $n)))
          ELSE CAST(array() AS ARRAY<STRING>) END""")).as("g"))
    g.groupBy("source", "g").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_grams"), count(lit(1)).as("n_distinct"))
      .select(col("source"), col("n_grams"), col("n_distinct"),
        expr("n_distinct * 1000000L DIV n_grams").as("distinct_micro"))
  }

  /** Corpus-wide top-k n-grams by occurrence count (ties broken by the
    * gram itself, so the result is total-order deterministic). The
    * frequency head of a corpus is the working set for boilerplate
    * discovery, stop-gram (`maxDf`-style) cap tuning, and contamination
    * triage.
    *
    * Plan: one Generate (native ShingleArray, duplicates kept) →
    * partial hash aggregate BEFORE the exchange (map-side combine does
    * the heavy lifting — Zipfian gram counts collapse hardest exactly
    * where volume is worst) → final aggregate →
    * TakeOrderedAndProject(k). Nothing but (gram, count) ever
    * shuffles, and only k rows reach the driver.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be >= 1")
    df.select(explode(ngramsAll(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }

  /** UTS#39-lite confusable SKELETON — the homoglyph-hardened dedup
    * key exact dedup misses: web spam re-publishes the same text with
    * Cyrillic/Greek lookalike letters and zero-width joiners so every
    * byte-level hash differs while every READER sees the same string.
    * Skeleton = NFC → strip invisible codepoints (ZWSP/ZWNJ/ZWJ/BOM/
    * soft hyphen) → casefold → map the high-frequency Cyrillic+Greek
    * lookalikes onto their ASCII targets (a deliberately small,
    * documented table — UTS#39's full data file is overkill for a
    * dedup KEY, where false merges only cost a manual review). One
    * codegen'd projection; exactly replayable (DuckDB: nfc_normalize
    * + regexp_replace + lower + translate).
    */
  val ConfusablesFrom: String =
    "аеорсхуіѕј" + // Cyrillic a e o p c x y i s j
      "οαν"                                           // Greek o a v
  val ConfusablesTo: String = "aeopcxyisjoav"
  val InvisiblesRe: String =
    "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}\\x{00AD}]"

  def confusableSkeleton(text: Column): Column =
    translate(
      lower(regexp_replace(nfcNormalize(text), InvisiblesRe, "")),
      ConfusablesFrom, ConfusablesTo)

  /** Skeleton-keyed duplicate groups: documents whose confusable
    * skeletons collide (>= 2 members). `n_variants` counts DISTINCT
    * raw texts inside a group — > 1 is the homoglyph/invisible-char
    * signal byte-exact dedup ([[graft.core.Dedup]] q17) cannot see.
    * One hash aggregate on the skeleton; survivors by min id.
    */
  def skeletonDupGroups(df: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    df.select(col(idCol), col(textCol).as("raw"),
        confusableSkeleton(col(textCol)).as("sk"))
      .groupBy("sk")
      .agg(min(col(idCol)).as("survivor_id"),
        count(lit(1)).as("n_members"),
        countDistinct(col("raw")).as("n_variants"))
      .filter(col("n_members") >= 2)
      .select(col("survivor_id"), col("n_members"), col("n_variants"),
        rollingHash(col("sk")).as("skeleton_hash"))
}
