package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical 100x scale probe (VERDICT r11 #5): synthesizes an sf~10
  * dataset (60M-row lineitem, 10M events, 500K docs) by replicating
  * sf0.1 a hundredfold with shifted keys, then times a battery of
  * linear-by-design gate queries at BOTH scales. The 10x ScaleProbe
  * interpolates the 100x claim; this measures one real point. The
  * battery is the relational headline set plus the CAPPED corpus
  * paths — the quadratic-by-design exact baselines (q19/q43/q80's
  * curation stage) are excluded BY DESIGN: on a 100x-replicated
  * corpus every doc gains 100 clones and their candidate pairs grow
  * ~100x on top of the data growth; their capped twins (q94/q95) ARE
  * the documented scale path and ride this battery instead.
  * Local tool; writes ~6 GB under /tmp.
  */
object Scale100Probe {
  def main(args: Array[String]): Unit = {
    val out = "/tmp/graft_sf10"
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      println("[scale100] generating 100x dataset at " + out)
      val copies = spark.range(100).select(col("id").as("copy"))
      def rep(table: String, keyShifts: Map[String, Long]): Unit = {
        val src = Tables.load(spark, "/root/testdata/sf0.1", table)
        val big = src.crossJoin(copies)
        val shifted = keyShifts.foldLeft(big) { case (d, (c, base)) =>
          d.withColumn(c, col(c) + col("copy") * base)
        }
        shifted.drop("copy").write.mode(SaveMode.Overwrite)
          .parquet(s"$out/$table.parquet")
      }
      rep("lineitem", Map("l_orderkey" -> 10000000L))
      rep("orders", Map("o_orderkey" -> 10000000L))
      rep("events", Map("event_id" -> 10000000L, "user_id" -> 10000L))
      rep("documents", Map("doc_id" -> 1000000L))
      rep("embeddings", Map("vec_id" -> 1000000L))
      Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
        Tables.load(spark, "/root/testdata/sf0.1", t)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      }
    }

    // linear-by-design battery: relational headline + capped corpus +
    // the round-12 suffix array (adjacency linear by construction)
    val battery = Seq(
      "q01_pricing_summary", "q03_region_revenue", "q06_user_daily",
      "q16_anomaly_features", "q42_asof_join", "q181_local_supplier_volume",
      "q213_shipping_priority",
      "q23_langid", "q54_pii_scrub", "q85_bpe_encode_fixed",
      "q95_jaccard_maxdf", "q107_token_budget",
      "q274_longest_repeats")
      .filter(n => args.isEmpty || args.contains(n))
    val qs = SparkEntry.queries
    battery.foreach { name =>
      val fn = qs(name)
      def run(dir: String): Double = {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        run("/root/testdata/sf0.1") // warm codegen/classload
        val s = run("/root/testdata/sf0.1")
        val b = run(out)
        println(f"[scale100] $name%-28s sf0.1=$s%7.2fs 100x=$b%8.2fs " +
          f"ratio=${b / s}%6.1f")
      } catch {
        case e: Throwable =>
          println(s"[scale100] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
