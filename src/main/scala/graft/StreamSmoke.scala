package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.streaming.IngestStream

/** Drives the E1 streaming-ingest surface end-to-end on temp dirs:
  * drops CSV "blobs" into a landing dir, runs the file-source stream,
  * prints the resulting table/reject counts, then replays to show
  * idempotency. Local verification tool — not part of the driver
  * contract.
  */
object StreamSmoke {
  private val header = "Home ID,Appliance Type,Energy Consumption (kWh),Time,Date,Outdoor Temperature (?C),Season,Household Size"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Files.createTempDirectory("graft_stream_smoke").toString
    val landing = s"$base/landing"
    Files.createDirectories(Paths.get(landing))
    def blob(name: String, rows: String*): Unit =
      Files.write(Paths.get(s"$landing/$name"), (header +: rows).mkString("\n").getBytes)

    blob("b1.csv",
      "430,Oven,0.83,19:48,02-04-2023,7.7,Spring,1",
      "363,Dishwasher,1.09,3:28,11-03-2023,23,Winter,5",
      ",Broken,1.0,1:00,01-01-2023,5,Winter,2")
    blob("b2.csv",
      "154,Heater,3.6,5:53,12-02-2023,0.6,Winter,4",
      "430,Oven,0.83,19:48,02-04-2023,7.7,Spring,1")

    IngestStream.start(spark, landing, s"$base/table", s"$base/ckpt",
      Some(s"$base/rejects"),
      onBatchMetrics = Some((id, g, b) =>
        println(s"[stream-smoke] batch=$id transformed_count=$g skipped_count=$b")))
      .awaitTermination()
    println(s"[stream-smoke] table rows=" + spark.read.parquet(s"$base/table").count())
    println(s"[stream-smoke] reject rows=" + spark.read.parquet(s"$base/rejects").count())

    // late blob arrives; resume from the SAME checkpoint — only the new file processes
    blob("b3.csv", "99,TV,1.5,2:00,05-05-2023,12,Spring,3")
    IngestStream.start(spark, landing, s"$base/table", s"$base/ckpt",
      Some(s"$base/rejects")).awaitTermination()
    println(s"[stream-smoke] after late blob rows=" + spark.read.parquet(s"$base/table").count())

    spark.read.parquet(s"$base/table").orderBy("HomeID").show(10, false)

    // stateful streaming sessionization over a live MemoryStream
    import spark.implicits._
    import java.sql.Timestamp
    import graft.streaming.SessionStream
    import graft.streaming.SessionStream.Event
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val sq = SessionStream.sessionize(input.toDS(), gapMinutes = 60)
      .writeStream.format("memory").queryName("smoke_sessions")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    input.addData(Event(1, t("2024-01-01 10:00:00"), 1.0),
      Event(1, t("2024-01-01 10:20:00"), 2.0))
    sq.processAllAvailable()
    input.addData(Event(1, t("2024-01-01 13:00:00"), 4.0)) // gap -> close
    sq.processAllAvailable()
    input.addData(Event(2, t("2024-01-01 18:00:00"), 1.0)) // watermark -> timeout
    sq.processAllAvailable()
    input.addData(Event(2, t("2024-01-01 18:00:30"), 1.0))
    sq.processAllAvailable()
    println("[stream-smoke] closed sessions:")
    spark.table("smoke_sessions").orderBy("user_id", "start").show(10, false)
    sq.stop()

    // continuous daily rollup: stream -> watermarked windows -> MERGE
    val rinput = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String, Double)]
    val revents = rinput.toDF().toDF("user_id", "ts", "event_type", "value")
    rinput.addData(
      (1L, t("2024-01-01 01:00:00"), "a", 1.0),
      (1L, t("2024-01-01 05:00:00"), "b", 2.0),
      (2L, t("2024-01-02 09:00:00"), "a", 7.0),
      (9L, t("2024-01-10 00:00:00"), "a", 0.5))
    graft.streaming.DailyRollupStream.start(spark, revents,
      s"$base/daily", s"$base/rckpt").awaitTermination()
    println("[stream-smoke] merged daily table:")
    spark.read.parquet(s"$base/daily").orderBy("user_id", "Date").show(10, false)
    spark.stop()
  }
}
