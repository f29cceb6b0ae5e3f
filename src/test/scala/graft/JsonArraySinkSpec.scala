package graft

import java.nio.file.{Files, Paths}

import graft.sources.JsonArraySink
import org.apache.spark.sql.functions._

/** S5 array-shape JSON sink: the reference ETL's indented-array output
  * (`process_etl.py:14-17`), round-tripped through the S4 multiLine
  * reader.
  */
class JsonArraySinkSpec extends SparkSpec {
  import spark.implicits._

  test("array export round-trips through the S4 multiLine JSON reader") {
    val df = Seq(
      ("430", "Oven", 0.83, 1),
      ("363", "Dishwasher", 1.09, 5),
      ("154", "Heater", 3.6, 4)
    ).toDF("HomeID", "ApplianceType", "EnergyConsumption", "HouseholdSize")
    val path = Files.createTempDirectory("jsonarray").resolve("out.json").toString
    val n = JsonArraySink.write(df, path)
    assert(n == 3)
    val text = new String(Files.readAllBytes(Paths.get(path)))
    assert(text.startsWith("["), "must be a JSON array, not JSON lines")
    assert(text.contains("\n    {"), "elements indented one level (indent=4)")
    assert(text.trim.endsWith("]"))
    // S4 reader consumes S5 output
    val back = spark.read.option("multiLine", "true").json(path)
    assert(back.count() == 3)
    val orig = df.orderBy("HomeID").collect().map(_.toSeq).toSeq
    val rt = back.select("HomeID", "ApplianceType", "EnergyConsumption", "HouseholdSize")
      .orderBy("HomeID").collect().map(_.toSeq).toSeq
    assert(rt == orig)
  }

  test("maxRows guard fails the export and removes the partial file") {
    val df = spark.range(100).select($"id".cast("string").as("s"))
    val path = Files.createTempDirectory("jsonarray").resolve("big.json")
    val e = intercept[IllegalStateException] {
      JsonArraySink.write(df.toDF(), path.toString, maxRows = 10)
    }
    assert(e.getMessage.contains("maxRows"))
    assert(!Files.exists(path), "partial file must be cleaned up")
  }
}
