package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — BM25 (Robertson et al., the
  * Okapi weighting), the standard sparse complement to the dense
  * ANN stack in [[Similarity]]. In a training-data pipeline this is
  * the mining/inspection tool: "which training documents match this
  * eval item's vocabulary" (decontamination triage, quality-classifier
  * seed mining, targeted corpus audits).
  *
  * Scale shape (the asymmetric-corpus discipline of
  * [[Decontaminate]]): the query side is small by contract, so query
  * terms reach the postings by broadcast; corpus postings/lengths are
  * one explode + two grouped aggregations, pruned to MATCHED terms
  * before any scoring work; N/avgdl are a one-row aggregate
  * cross-joined in-plan (never a driver collect). Shuffled rows carry
  * (query, doc, BIGINT) — never text. The per-query rank window
  * partitions by query id, so top-k never funnels the corpus through
  * one task.
  *
  * Determinism: per-(query,doc,term) scores are floored to 1e-6
  * fixed-point BIGINT and summed exactly — the [[LanguageModel]]
  * discipline — so aggregation order cannot move a result across
  * engines; `ln` ulp is the only cross-engine surface (the accepted
  * q68/q88 class). k1 = 1.2 and b = 0.75 enter as the exact decimal
  * doubles 2.2 / 0.3 / 0.9 in a fixed parenthesization shared with
  * the oracle:
  *
  *   idf  = ln(1 + (N − df + 0.5) / (df + 0.5))
  *   frac = tf·2.2 / (tf + 0.3 + 0.9·(dl·N)/T)
  *   score(q,d) = Σ_terms floor(1e6 · idf · frac)
  */
object Retrieval {

  /** Top-`k` corpus docs per query doc by BM25 over whitespace tokens.
    *
    * @param corpus    (idCol, textCol) training-side documents
    * @param queryDocs (idCol, textCol) query documents (small side —
    *                  term set is broadcast); query terms are the
    *                  DISTINCT tokens of each query doc
    * @return (query_id, rank, doc_id, bm25_micro) — rank 1..k by
    *         (score desc, doc_id), BIGINT fixed-point score
    */
  def bm25TopK(corpus: DataFrame, queryDocs: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               k: Int = 10): DataFrame = {
    val live = corpus.filter(length(trim(col(textCol))) > 0)
    // doc lengths and the corpus-wide stats are pure projections — no
    // explode, no shuffle beyond the one-row stats aggregate
    val dl = live.select(col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_len"))
    val qterms = queryDocs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("query_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .distinct()
    // prune the exploded corpus to query-matched terms BEFORE any
    // aggregation: the tf/df counts only ever aggregate matched
    // occurrences (df over matched tf rows equals the true document
    // frequency of those terms), so non-matching corpus tokens die
    // inside the scan stage against the broadcast term set
    val matchedTok = live
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"),
        "leftsemi")
    val tf = matchedTok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val matched = tf
      .join(broadcast(qterms), Seq("term"))
      .join(df, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    val frac = col("tf").cast("double") * lit(2.2) /
      (col("tf").cast("double") + lit(0.3) +
        lit(0.9) * (col("dl").cast("double") * col("n_docs"))
          / col("total_len"))
    val termScore = floor(lit(1000000.0) * (idf * frac)).cast("long")
    val scores = matched
      .select(col("query_id"), col("doc_id"), termScore.as("sm"))
      .groupBy("query_id", "doc_id")
      .agg(sum("sm").as("bm25_micro"))
    scores
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("bm25_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("bm25_micro"))
  }
}
