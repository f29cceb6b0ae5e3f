package graft

import org.apache.spark.sql.functions._
import graft.core.EnergyIngest

/** Ingest parity vs the reference dataset + dirty-row semantics
  * (SURVEY §5.2 / FIXTURES.md §1 constants).
  */
class EnergyIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ingested = EnergyIngest.ingest(spark, RefCsv)

  test("header normalization matches blobToCosmos semantics") {
    assert(EnergyIngest.normalizeHeader("Home ID") == "homeid")
    assert(EnergyIngest.normalizeHeader("Energy Consumption (kWh)") == "energyconsumption")
    assert(EnergyIngest.normalizeHeader("Outdoor Temperature (?C)") == "outdoortemperature")
    assert(EnergyIngest.normalizeHeader("  Household Size ") == "householdsize")
  }

  test("reference CSV: all 49726 rows valid, parity constants hold") {
    val (good, bad) = ingested
    assert(good.count() == 49726L)
    assert(bad.count() == 0L)
    val row = good.agg(
      round(sum("EnergyConsumption"), 2).as("total"),
      round(avg("EnergyConsumption"), 3).as("mean"),
      countDistinct("HomeID").as("homes"),
      countDistinct("ApplianceType").as("apps"),
      countDistinct("Date").as("days")).head()
    assert(row.getDouble(0) == 74789.89)
    assert(row.getDouble(1) == 1.504)
    assert(row.getLong(2) == 500L)
    assert(row.getLong(3) == 10L)
    assert(row.getLong(4) == 181L)
  }

  test("schema matches the canonical readings shape") {
    val (good, _) = ingested
    assert(good.columns.toSeq ==
      Seq("HomeID", "ApplianceType", "EnergyConsumption", "Season", "Date", "HouseholdSize", "id"))
    assert(good.schema("EnergyConsumption").dataType.typeName == "double")
    assert(good.schema("HomeID").dataType.typeName == "string")
    assert(good.schema("HouseholdSize").dataType.typeName == "integer")
  }

  test("dirty rows: validation split matches blobToCosmos skip rules") {
    val dirty = Seq(
      ("430", "Oven", "0.83", "19:48", "02-04-2023", "7.7", "Spring", "1"),   // good
      ("", "Oven", "1.0", "1:00", "01-01-2023", "5", "Winter", "2"),          // empty HomeID
      ("12", "", "1.0", "1:00", "01-01-2023", "5", "Winter", "2"),            // empty appliance
      ("13", "TV", "not-a-number", "1:00", "01-01-2023", "5", "Winter", "2"), // bad kWh
      ("14", "TV", "2.5", "1:00", "01-01-2023", "5", "Winter", "x")           // bad size: STILL VALID
    ).toDF(EnergyIngest.rawSchema.fieldNames: _*)
    val (good, bad) = EnergyIngest.validate(EnergyIngest.transform(dirty))
    assert(good.count() == 2L) // row 1 and row 5 (HouseholdSize not validated)
    assert(bad.count() == 3L)
    val sizes = good.filter($"HomeID" === "14").select("HouseholdSize").head()
    assert(sizes.isNullAt(0)) // int("x") -> null, row kept
  }

  test("JSON array ingest (legacy path): multiLine array reads as rows") {
    // the process_etl.py output shape (FIXTURES.md §6): one file holding
    // a JSON ARRAY of records, all 8 CSV columns, fillna('')
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val json =
      """[{"Home ID": "430", "Appliance Type": "Oven", "Energy Consumption (kWh)": 0.83,
        |  "Time": "19:48", "Date": "02-04-2023", "Outdoor Temperature (?C)": 7.7,
        |  "Season": "Spring", "Household Size": 1},
        | {"Home ID": "363", "Appliance Type": "Dishwasher", "Energy Consumption (kWh)": 1.09,
        |  "Time": "3:28", "Date": "11-03-2023", "Outdoor Temperature (?C)": 23,
        |  "Season": "", "Household Size": 5}]""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/records.json"), json.getBytes)
    val df = EnergyIngest.readJsonArray(spark, s"$dir/records.json")
    assert(df.count() == 2L)
    assert(df.columns.contains("Home ID"))
    // JSON-lines sink (S5) round-trips through the normal reader
    df.write.mode("overwrite").json(s"$dir/out")
    assert(spark.read.json(s"$dir/out").count() == 2L)
  }

  test("deterministic ids: re-ingest produces identical ids (idempotency)") {
    val (good, _) = ingested
    val ids1 = good.select("id").limit(100).collect().map(_.getString(0)).toSet
    val (good2, _) = EnergyIngest.ingest(spark, RefCsv)
    val ids2 = good2.select("id").limit(100).collect().map(_.getString(0)).toSet
    assert(ids1 == ids2)
  }
}
