package graft

import org.apache.spark.sql.SparkSession

/** Executor-side sampling profiler for ONE gate query in local mode:
  * samples every "Executor task launch worker" thread while the query
  * runs and aggregates the deepest interesting frame — the local-mode
  * stand-in for the Spark UI's executor thread dump (guide §7.3),
  * which the sandbox cannot attach to (no jstack/UI). Usage:
  * runMain graft.TaskSample <query> [sfDir] [topFrames]
  */
object TaskSample {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q129_audio_reverse")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val top = args.drop(2).headOption.map(_.toInt).getOrElse(30)
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(q)
    try fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val states = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch worker") &&
              st.nonEmpty) {
            states.merge(t.getState.toString, 1, (a, b) => a + b)
            // topmost frame plus the first graft/javax/spark frame below
            val head = st.head.getClassName + "." + st.head.getMethodName
            val ctx = st.find(e =>
                e.getClassName.startsWith("graft.") ||
                e.getClassName.startsWith("javax.") ||
                e.getClassName.startsWith("com.sun.media") ||
                e.getClassName.startsWith("com.sun.imageio"))
              .map(e => e.getClassName + "." + e.getMethodName)
              .getOrElse("-")
            samples.merge(head + "  <=  " + ctx, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    var i = 0
    while (i < 3) {
      spark.sharedState.cacheManager.clearCache()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      i += 1
    }
    sampling = false
    println(f"[tasksample] $q 3 runs ${(System.nanoTime() - t0) / 1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    states.asScala.toSeq.sortBy(-_._2).foreach { case (s, n) =>
      println(f"[state] $n%6d  $s")
    }
    samples.asScala.toSeq.sortBy(-_._2).take(top).foreach { case (fr, n) =>
      println(f"[frame] $n%6d  $fr")
    }
    spark.stop()
  }
}
