package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR`, forcing FULL execution through the `noop`
  * sink (a bare `.count()` would let Catalyst prune projections and
  * under-measure), and prints exactly one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args = subset of query names (local iteration only;
    // the driver invokes with no args = all queries)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    // Warm the JVM/codegen once on the smallest SF so per-query numbers
    // measure the plan, not first-call classloading.
    selected.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // best-of-2 at the target SF: the first run pays page cache +
    // per-plan codegen; the min is the steady-state number.
    // Cache clears BEFORE each query's pair (never between the two
    // runs — intra-query persist reuse is part of a query's design):
    // persisted stage boundaries accumulated across 70+ queries
    // otherwise bloat the heap and taxed every later query's number
    // with GC/eviction noise (q23 measured 1.36s in-suite vs 0.72s
    // isolated before this).
    val results = selected.map { case (name, fn) =>
      spark.sharedState.cacheManager.clearCache()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
