package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed core (SURVEY §1.4): case-class views of the engine's tables
  * for the call sites where compile-time field checks pay —
  * transformation pipelines and tests. The SQL-ish surface stays
  * `DataFrame`; `.typed` / `.untyped` cross the boundary.
  */
object EnergyModel {

  /** Canonical readings row (FIXTURES.md §2). HomeID stays a STRING —
    * '430' equality/partitioning semantics (SURVEY §7.4 #2).
    */
  final case class EnergyReading(
      HomeID: String,
      ApplianceType: String,
      EnergyConsumption: Double,
      Season: Option[String],
      Date: Option[String], // dd-MM-yyyy at rest; parsed at analytics time
      HouseholdSize: Option[Int],
      id: String)

  /** Densified per-home daily features (FIXTURES.md §3). */
  final case class DailyHomeUsage(
      HomeID: String,
      Date: java.sql.Date,
      total_kwh: Double,
      unique_appliances: Long,
      rolling_7_mean: Double,
      dow: Int)

  /** Scored anomaly row (FIXTURES.md §4). */
  final case class AnomalyRow(
      HomeID: String,
      Date: java.sql.Date,
      total_kwh: Double,
      unique_appliances: Long,
      rolling_7_mean: Double,
      dow: Int,
      score: Double,
      anomaly: Boolean)

  /** Forecast row (FIXTURES.md §5). */
  final case class ForecastRow(
      ds: java.sql.Date,
      yhat: Double,
      yhat_lower: Double,
      yhat_upper: Double)

  implicit val energyReadingEnc: Encoder[EnergyReading] = Encoders.product[EnergyReading]
  implicit val dailyEnc: Encoder[DailyHomeUsage] = Encoders.product[DailyHomeUsage]
  implicit val anomalyEnc: Encoder[AnomalyRow] = Encoders.product[AnomalyRow]
  implicit val forecastEnc: Encoder[ForecastRow] = Encoders.product[ForecastRow]

  def typedReadings(readings: DataFrame): Dataset[EnergyReading] =
    readings.as[EnergyReading]
}
