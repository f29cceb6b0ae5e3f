package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.TextAnalysis

/** Multinomial Naive Bayes over whitespace tokens — the classic
  * count-based text classifier (source attribution, language ID,
  * spam/quality gating) that, unlike the logistic
  * [[QualityClassifier]], trains in ONE exact counting pass: both
  * training and inference are count tables + integer log-sum
  * arithmetic, so the WHOLE train→score→predict loop is
  * oracle-checkable — no float reduction anywhere.
  *
  *   log p(l | d) ∝ ln(n_l / N) + Σ_t tf(d,t) · ln( (c(l,t) + 1)
  *                                                / (T_l + V) )
  *
  * Determinism discipline (the [[graft.core.LanguageModel]] add-one
  * convention): every log term is ONE `ln` of a ratio of exact
  * integers, floored to micro fixed point at the MODEL-SIZE tables
  * (per (label, term) and per label — never per row), so per-doc
  * scores are exact BIGINT sums (order-free) and the argmax is an
  * integer comparison with a deterministic label tie-break.
  *
  * Scale posture: the model is a TABLE (labels × vocabulary), never a
  * driver structure — training is two grouped aggregations over the
  * corpus; scoring explodes docs to (doc, term, tf), joins the model
  * on term (Zipf-skewed — map-side combined aggs + AQE skew split,
  * the LM scoring shape), and completes unseen (term, label) cells
  * with the per-label default ln(1/(T_l+V)) via the label table
  * (bounded alphabet) rather than a dense cross product.
  */
object NaiveBayes {

  /** A trained model: `termLogProb` = (label, term, lp_micro),
    * `labels` = (label, prior_micro, default_micro) with
    * default = ln(1/(T_l+V)) for unseen terms. Both model-size.
    */
  final case class Model(termLogProb: DataFrame, labels: DataFrame)

  /** One exact counting pass: per-(label, term) add-one-smoothed
    * log-likelihoods and per-label priors, micro-floored once at the
    * model tables. V = distinct terms across the WHOLE training
    * corpus (the standard multinomial smoothing denominator).
    */
  def train(docs: DataFrame, labelCol: Column, textCol: Column): Model = {
    val tokens = docs
      .select(labelCol.as("label"), explode(TextAnalysis.tokens(textCol))
        .as("term"))
      .filter(length(col("term")) > 0)
    val counts = tokens.groupBy("label", "term")
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("label").agg(sum("c").as("t_l"))
    val vocab = counts.select("term").distinct()
      .agg(count(lit(1)).as("v"))
    val nDocs = docs.select(labelCol.as("label"))
      .groupBy("label").agg(count(lit(1)).as("n_l"))
      .withColumn("n", sum("n_l").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val termLogProb = counts
      .join(totals, "label")
      .crossJoin(broadcast(vocab))
      .select(col("label"), col("term"),
        expr("""CAST(floor(ln((CAST(c AS DOUBLE) + 1.0)
                / (CAST(t_l AS DOUBLE) + v)) * 1000000.0) AS BIGINT)""")
          .as("lp_micro"))
    val labels = nDocs
      .join(totals, "label")
      .crossJoin(broadcast(vocab))
      .select(col("label"),
        expr("""CAST(floor(ln(CAST(n_l AS DOUBLE) / n) * 1000000.0)
                AS BIGINT)""").as("prior_micro"),
        expr("""CAST(floor(ln(1.0 / (CAST(t_l AS DOUBLE) + v))
                * 1000000.0) AS BIGINT)""").as("default_micro"))
    Model(termLogProb, labels)
  }

  /** Score + predict: per (doc, label) the exact integer posterior
    * score, and per doc the argmax label (ties break to the smallest
    * label — deterministic). Unseen terms contribute tf·default_l via
    * the bounded label table; terms absent from a doc contribute
    * nothing (correct multinomial semantics).
    *
    * @return (id, predicted, score_micro) one row per scored doc
    */
  def predict(model: Model, docs: DataFrame, idCol: String,
              textCol: Column): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(TextAnalysis.tokens(textCol))
        .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // (doc-term) × label alphabet: bounded fan-out, completes the
    // unseen cells without a dense vocab × label cross product
    val perLabel = tf
      .crossJoin(broadcast(model.labels.select("label", "default_micro")))
      .join(model.termLogProb, Seq("label", "term"), "left")
      .select(col("id"), col("label"),
        (col("tf") * coalesce(col("lp_micro"), col("default_micro")))
          .as("contrib"))
      .groupBy("id", "label")
      .agg(sum("contrib").as("ll_micro"))
    val scored = perLabel
      .join(broadcast(model.labels.select("label", "prior_micro")), "label")
      .select(col("id"), col("label"),
        (col("ll_micro") + col("prior_micro")).as("score_micro"))
    // integer argmax, smallest label on ties: max over a struct orders
    // by score then REVERSED label bytes — instead, one bounded
    // per-doc sort: the label alphabet caps rows per doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score_micro").desc, col("label").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("label").as("predicted"), col("score_micro"))
  }
}
