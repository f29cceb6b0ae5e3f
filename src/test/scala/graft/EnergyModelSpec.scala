package graft

import graft.core.EnergyModel.{typedReadings, EnergyReading}
import graft.core.EnergyIngest
import org.apache.spark.sql.functions._

/** Typed Dataset core: the case-class view round-trips the canonical
  * schema and typed aggregations agree with the untyped surface.
  */
class EnergyModelSpec extends SparkSpec {
  import spark.implicits._

  test("typed view: as[EnergyReading] round-trips and typed agg == untyped agg") {
    val (readings, _) = EnergyIngest.ingest(spark, RefCsv)
    val ds = typedReadings(readings)
    // compile-time field access in a typed filter + groupByKey
    val typedTotals = ds
      .filter((r: EnergyReading) => r.Season.contains("Spring"))
      .groupByKey(_.ApplianceType)
      .mapValues(_.EnergyConsumption)
      .reduceGroups(_ + _)
      .collect()
      .map { case (k, v) => k -> math.round(v * 100) / 100.0 }
      .toMap
    val untyped = readings
      .filter($"Season" === "Spring")
      .groupBy("ApplianceType")
      .agg(round(sum("EnergyConsumption"), 2).as("t"))
      .as[(String, Double)].collect().toMap
    assert(typedTotals == untyped)
    assert(typedTotals.size == 10)
  }
}
