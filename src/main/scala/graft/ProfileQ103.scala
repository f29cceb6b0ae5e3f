package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for q103: times the sparse arm, the dense arm, and
  * the fused whole separately (cold lineage each, noop sink) to
  * attribute the hybrid query's cost to its parts.
  */
object ProfileQ103 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      f
      println(f"[q103prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val d = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    for (_ <- 1 to 2) {
      time("sparse k=20") {
        graft.core.Retrieval.bm25TopK(
          d.filter(col("doc_id") % 100 =!= 0),
          d.filter(col("doc_id") % 100 === 0), k = 20)
          .write.format("noop").mode("overwrite").save()
      }
      time("dense k=20") {
        graft.core.Similarity.cosineTopK(
          emb.filter(col("vec_id") % 100 === 0),
          emb.filter(col("vec_id") % 100 =!= 0), k = 20)
          .write.format("noop").mode("overwrite").save()
      }
      time("fused") {
        SparkEntry.queries("q103_hybrid_rrf")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      time("q101 k=10 for comparison") {
        SparkEntry.queries("q101_bm25_retrieval")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
