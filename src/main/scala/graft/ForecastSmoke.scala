package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.ForecastTrainer

/** Drives the trainable forecaster end-to-end: build a daily series
  * from the events table, fit in-engine, forecast 14 days. Local
  * verification tool.
  */
object ForecastSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val daily = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy(to_date(col("ts")).as("ds"))
      .agg(sum("value").as("y"))
    val m = ForecastTrainer.fit(daily, col("ds"), col("y"))
    println(f"[forecast-smoke] beta0=${m.beta(0)}%.2f trend=${m.beta(1)}%.2f sigma=${m.sigma}%.2f")
    val last = daily.agg(max("ds")).head().getDate(0).toLocalDate
    ForecastTrainer.forecast(spark, m, last, 14).show(14, false)

    // in-engine IsoForest training on per-user daily features
    // (reservoir-sampled single pass, no global sort)
    val feats = graft.core.TimeSeries.anomalyFeatures(
      Tables.events(spark, "/root/testdata/sf0.01"),
      "user_id", to_date(col("ts")), "value", "event_type")
    val iso = graft.ml.IsoForestTrainer.fit(feats,
      Seq("total_kwh", "unique_appliances", "rolling_7_mean", "dow"),
      nTrees = 50, maxSamples = 128)
    val bc = spark.sparkContext.broadcast(iso)
    val sUdf = udf((a: Double, b: Double, c: Double, d: Double) =>
      bc.value.decisionFunction(Array(a, b, c, d)))
    val flagged = feats.withColumn("s",
        sUdf(col("total_kwh"), col("unique_appliances").cast("double"),
          col("rolling_7_mean"), col("dow").cast("double")))
      .filter(col("s") < 0).count()
    println(f"[forecast-smoke] in-engine isoforest flagged=$flagged/${feats.count()}")
    spark.stop()
  }
}
