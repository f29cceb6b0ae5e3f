package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Dedup, LanguageModel, TextAnalysis}

/** Stage-by-stage timing of the q73 five-gate curation composition —
  * local tool for budget attribution (mirrors `Curation
  * .curateFullStages` with the same persisted boundaries, so the
  * per-stage numbers decompose the gate query's time).
  */
object ProfileQ73 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    time("scan")(docs.count())
    // stage 1: per-doc gates (fused single projection, r8)
    val scored = TextAnalysis.langId(
        TextAnalysis.qualityScore(docs, "text"), "text")
      .withColumn("quality_ok", col("quality_score") >= 0.51)
      .withColumn("dup_token_ratio", TextAnalysis.dupTokenRatio(col("text")))
      .withColumn("rep_ok", col("dup_token_ratio") <= 0.6)
      .persist()
    time("s1 quality+langid+rep")(scored.count())
    val g1 = scored.filter(col("quality_ok") && col("rep_ok"))
      .select(col("doc_id"), col("text"))
    // stage 2: span gate
    val spans = TextAnalysis.dupSpans(g1, "doc_id", "text", 8)
      .select(col("doc_id"), col("dup_ratio").as("span_ratio"))
      .withColumn("span_ok", col("span_ratio") <= 0.8)
      .persist()
    time("s2 dup spans")(spans.count())
    val g2 = g1.join(spans.filter(col("span_ok")).select(col("doc_id")), Seq("doc_id"))
    // stage 3: exact dedup
    val kept = Dedup.dropExactDups(g2, "doc_id", "text").persist()
    time("s3 exact dedup")(kept.count())
    // stage 4: self-trained LM gate
    val lm = LanguageModel.trainBigram(kept, "text")
    val lmScores = LanguageModel.scoreBigram(kept, lm, "doc_id", "text")
      .withColumn("lm_ok", col("ll_scaled") >= lit(-3450000L) * col("n_bigrams"))
      .persist()
    time("s4 LM train+score")(lmScores.count())
    val g3 = kept.join(lmScores.filter(col("lm_ok")).select(col("doc_id")), Seq("doc_id"))
    // stage 5: near-dup resolution
    val pairs = Dedup.ngramJaccardPairs(g3, "doc_id", "text", 3, 0.2)
    time("s5 jaccard pairs")(pairs.count())
    time("s5 resolve")(Dedup.resolveSurvivors(g3, "doc_id", pairs).count())
    // the full gate query, twice (cold-ish then warm)
    time("full q73 #1")(SparkEntry.queries("q73_curation_full")(spark, dir).count())
    spark.sharedState.cacheManager.clearCache()
    time("full q73 #2")(SparkEntry.queries("q73_curation_full")(spark, dir).count())
    spark.stop()
  }
}
