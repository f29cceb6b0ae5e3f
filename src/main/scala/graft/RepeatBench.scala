package graft

import org.apache.spark.sql.SparkSession

/** Local iteration tool: run ONE gate query N times in a single JVM
  * (cache cleared between runs, same methodology as Bench's pair) and
  * print every number — for A/B-ing a plan change against invocation
  * noise, which single-shot Bench runs cannot distinguish.
  */
object RepeatBench {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q80_corpus_to_sequences")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(q)
    // warm once at the smallest SF (Bench's methodology)
    try fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val times = (1 to n).map { i =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[repeat] $q run $i: $t%.2f s")
      t
    }
    println(f"[repeat] $q min=${times.min}%.2f median=${times.sorted.apply(n / 2)}%.2f")
    spark.stop()
  }
}
