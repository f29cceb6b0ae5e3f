package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Dedup
import graft.core.TextAnalysis

/** Stage-by-stage timing of the q51 three-gate curation composition —
  * local tool for budget attribution (mirrors `Curation
  * .curateReleasable` with the same persisted boundaries, so the
  * per-stage numbers decompose the gate query's time).
  */
object ProfileQ51 {
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
    // stage 1: quality + language ID
    val scored = TextAnalysis.langId(
        TextAnalysis.qualityScore(docs, "text"), "text")
      .withColumn("quality_ok", col("quality_score") >= 0.51)
      .persist()
    time("s1 quality+langid")(scored.count())
    // stage 2: exact dedup on the gate survivors
    val kept = Dedup.dropExactDups(
      scored.filter(col("quality_ok")), "doc_id", "text").persist()
    time("s2 exact dedup")(kept.count())
    // stage 3: near-dup candidates + resolution
    val pairs = Dedup.ngramJaccardPairs(kept, "doc_id", "text", 3, 0.2)
    time("s3 jaccard pairs")(pairs.count())
    val resolved = Dedup.resolveSurvivors(kept, "doc_id", pairs)
      .select(col("doc_id"), col("survivor_id"), col("is_survivor"),
        lit(true).as("kept_exact"))
    time("s3 resolve")(resolved.count())
    // stage 4: the all-docs audit join
    val audit = scored
      .select(col("doc_id"), col("lang_pred"), col("quality_score"),
        col("quality_ok"))
      .join(resolved, Seq("doc_id"), "left")
      .withColumn("kept_exact", coalesce(col("kept_exact"), lit(false)))
      .withColumn("is_survivor", coalesce(col("is_survivor"), lit(false)))
    time("s4 audit join")(audit.count())
    // the full gate query, cold then cold again (cache cleared)
    spark.sharedState.cacheManager.clearCache()
    time("full q51 #1")(SparkEntry.queries("q51_curation")(spark, dir).count())
    spark.sharedState.cacheManager.clearCache()
    time("full q51 #2")(SparkEntry.queries("q51_curation")(spark, dir).count())
    spark.stop()
  }
}
