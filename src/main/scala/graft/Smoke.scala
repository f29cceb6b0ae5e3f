package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: a RAW SparkSession (none
  * of Tables.configure's settings — the driver owns its session), then
  * entry() and every `queries` entry at sf0.001, asserting rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional 2nd arg: smoke only the named queries (fast ANSI check
    // for a new query; the full run stays the pre-round default)
    val only = args.drop(1).toSet
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n ${if (n > 0) "OK" else "FAIL"}")
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
      .foreach { case (name, fn) =>
      try {
        val c = fn(spark, dir).count()
        println(s"[smoke] $name rows=$c ${if (c > 0) "OK" else "FAIL(empty)"}")
        if (c == 0) failed += 1
      } catch {
        case e: Throwable =>
          println(s"[smoke] $name FAIL: ${e.getMessage}")
          failed += 1
      }
    }
    println(s"[smoke] ${if (failed == 0) "ALL OK" else s"$failed FAILURES"}")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
