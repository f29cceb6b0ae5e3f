package graft

import org.apache.spark.sql.SparkSession

/** Stage timing for the q274 suffix-array gate query (ProfileQ73
  * pattern): separates prefix-doubling rank rounds from adjacency,
  * LCP descent and the occurrence rematch, so optimization targets
  * the measured stage, not a guess.
  */
object ProfileQ274 {
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
    // warm
    graft.core.SuffixArray.longestRepeats(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text",
      12, 20).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"full q274 #$i") {
        graft.core.SuffixArray.longestRepeats(
          Tables.documents(spark, dir), "doc_id", "text", 12, 20)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
