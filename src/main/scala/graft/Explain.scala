package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected queries — the
  * scale-review loop: check PushedFilters/ReadSchema on scans,
  * broadcast vs sort-merge joins, exchange reuse, WholeStageCodegen
  * spans. Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_region_revenue", "q04_topk_parts",
        "q16_anomaly_features", "q19_ngram_jaccard", "q25_cosine_topk",
        "q52_decontaminate", "q53_repetition", "q57_pq_adc",
        "q58_range_join", "q62_trend_anomalies")
    val spark = Tables.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
