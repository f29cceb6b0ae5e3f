package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the q296 greedy set-cover gate (ProfileQ274
  * pattern): splits the (source, trigram) pair-table build from the
  * k greedy driver passes so the 1.5x budget drift (VERDICT r12
  * "next round" #1) gets attributed to a measured stage.
  */
object ProfileQ296 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def pairs(d: String) = Tables.documents(spark, d).select(col("source"),
      explode(graft.core.Dedup.shingles(col("text"), 3)).as("tri"))
    // warm
    graft.core.Sampling.greedySetCover(
        pairs("/root/testdata/sf0.001"), "source", "tri", 5)
      .write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"full q296 #$i") {
        graft.core.Sampling.greedySetCover(pairs(dir), "source", "tri", 5)
          .write.format("noop").mode("overwrite").save()
      }
      // stage split: build the distinct pair table alone
      spark.sharedState.cacheManager.clearCache()
      time(s"pe distinct+count #$i") {
        pairs(dir).select(col("source").cast("string").as("s"),
          col("tri").cast("string").as("e")).distinct().count()
      }
    }
    spark.stop()
  }
}
