package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall-time breakdown of one gate query — finer than
  * ProfileQ80's stage mirror: listens to the ACTUAL query's jobs, so
  * re-computed lineage shows up as extra jobs instead of hiding inside
  * a stage boundary.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q80_corpus_to_sequences")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  $desc")
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    // sample the driver main thread: the job gaps are driver-side, and
    // the aggregated frames say whether they are Catalyst analysis,
    // codegen, commit I/O, or something else
    val main = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        // first frame under our own package boundary that is spark/graft
        val f = st.find(e =>
          e.getClassName.startsWith("org.apache.spark.sql.catalyst") ||
          e.getClassName.startsWith("org.apache.spark.sql.execution") ||
          e.getClassName.startsWith("graft.") ||
          e.getClassName.startsWith("org.apache.parquet"))
          .map(e => e.getClassName + "." + e.getMethodName)
          .getOrElse(st.headOption.map(e =>
            e.getClassName + "." + e.getMethodName).getOrElse("?"))
        samples.merge(f, 1, (a, b) => a + b)
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    org.apache.spark.sql.GraftShim.drainListenerBus(spark, 30000L)
    println(f"[job] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    sampling = false
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (fr, n) =>
      println(f"[stack] $n%5d  $fr")
    }
    spark.stop()
  }
}
