package graft.ml

import java.time.LocalDate
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prophet forecast scoring (SURVEY §2.9 M1) — the reference's
  * `model.predict(make_future_dataframe(days))`
  * (`/root/reference/function-app/ml_forecast_anomaly.py:133-138`)
  * computed closed-form from the serialized model parameters
  * (`prophet_model.json`: linear growth, additive weekly seasonality
  * fourier_order 3, trained on 151 daily totals 2023-01-01→2023-05-31).
  *
  * Predictive mean (exact, matches prophet 1.1.7 in double precision):
  *   t        = (epoch_sec(ds) − start) / t_scale
  *   trend(t) = (k + Σ_{cp≤t} δ_cp)·t + (m + Σ_{cp≤t} −cp·δ_cp)
  *   X(ds)    = [sin(2πn·d/7), cos(2πn·d/7)]_{n=1..3},  d = days since epoch
  *   yhat     = y_scale · (trend(t) + X(ds)·β)
  * Validated in-repo against the artifact's own embedded fitted trend.
  *
  * Intervals: Prophet's MAP Monte-Carlo (1000 paths; future changepoints
  * ~ Poisson over the horizon, new deltas ~ Laplace(0, mean|δ|),
  * observation noise ~ N(0, σ_obs)), then the 10/90 percentiles for
  * interval_width 0.8. DOCUMENTED DIVERGENCE: Prophet draws from an
  * unseeded numpy RNG (its intervals differ run to run); we use a fixed
  * seed so results are reproducible. Same distribution, different RNG.
  *
  * Parity note L-1 (SURVEY §3 EP3b): the reference's forecast output is
  * independent of any HomeID filter — the pre-trained global model
  * forecasts from its own embedded history. `forecast(days, homeId)`
  * reproduces that: homeId is accepted and ignored.
  */
object ProphetScorer {

  final case class Model(k: Double, m: Double, delta: Array[Double],
                         beta: Array[Double], changepointsT: Array[Double],
                         sigmaObs: Double, yScale: Double, start: Double,
                         tScale: Double, intervalWidth: Double,
                         uncertaintySamples: Int, period: Double,
                         fourierOrder: Int, historyEnd: LocalDate) {

    def trendScaled(t: Double): Double = {
      var kT = k
      var mT = m
      var i = 0
      while (i < changepointsT.length && changepointsT(i) <= t) {
        kT += delta(i)
        mT -= changepointsT(i) * delta(i)
        i += 1
      }
      kT * t + mT
    }

    def seasonalScaled(daysSinceEpoch: Double): Double = {
      var s = 0.0
      var n = 1
      while (n <= fourierOrder) {
        val ang = 2.0 * math.Pi * n * daysSinceEpoch / period
        s += beta(2 * (n - 1)) * math.sin(ang) + beta(2 * (n - 1) + 1) * math.cos(ang)
        n += 1
      }
      s
    }

    def yhat(epochSec: Double): Double =
      yScale * (trendScaled((epochSec - start) / tScale) + seasonalScaled(epochSec / 86400.0))
  }

  lazy val bundled: Model = {
    val in = getClass.getResourceAsStream("/prophet_model.json")
    require(in != null, "prophet_model.json missing from resources")
    try parse(new ObjectMapper().readTree(in)) finally in.close()
  }

  def parse(root: JsonNode): Model = {
    def doubles(n: JsonNode): Array[Double] = {
      val a = new Array[Double](n.size); var i = 0
      while (i < a.length) { a(i) = n.get(i).asDouble; i += 1 }; a
    }
    val params = root.get("params")
    val seas = root.get("seasonalities").get(1).get("weekly")
    val histDates = new ObjectMapper().readTree(root.get("history_dates").asText)
    val lastDs = histDates.get("data").get(histDates.get("data").size - 1).asText
    Model(
      k = params.get("k").get(0).get(0).asDouble,
      m = params.get("m").get(0).get(0).asDouble,
      delta = doubles(params.get("delta").get(0)),
      beta = doubles(params.get("beta").get(0)),
      changepointsT = doubles(root.get("changepoints_t")),
      sigmaObs = params.get("sigma_obs").get(0).get(0).asDouble,
      yScale = root.get("y_scale").asDouble,
      start = root.get("start").asDouble,
      tScale = root.get("t_scale").asDouble,
      intervalWidth = root.get("interval_width").asDouble,
      uncertaintySamples = root.get("uncertainty_samples").asInt,
      period = seas.get("period").asDouble,
      fourierOrder = seas.get("fourier_order").asInt,
      historyEnd = LocalDate.parse(lastDs.take(10)))
  }

  /** Closed-form yhat as a pure `Column` expression built from the
    * model's LITERAL parameters — whole-stage-codegen'd, no UDF, no
    * broadcast. `d` = days since 1970-01-01 (integer-derived via
    * `datediff`, so timezone-free, unlike an epoch from a timestamp
    * cast). Every term reproduces `Model.yhat`'s sequential
    * accumulation order bit-for-bit (the fold adds 0.0 for skipped
    * changepoints, and `a - b` == `a + (-(b))` in IEEE), which
    * `MlScorerSpec` asserts exactly; `yhatSqlExpr` mirrors it
    * term-for-term for the DuckDB oracle (q88), where the only
    * cross-engine divergence is sin/cos ulp, absorbed by the final
    * round.
    */
  def yhatColumn(m: Model, d: Column): Column = {
    val t = (d * lit(86400.0) - lit(m.start)) / lit(m.tScale)
    val kT = m.changepointsT.zip(m.delta).foldLeft(lit(m.k)) {
      case (acc, (cp, dl)) => acc + when(lit(cp) <= t, lit(dl)).otherwise(lit(0.0))
    }
    val mT = m.changepointsT.zip(m.delta).foldLeft(lit(m.m)) {
      case (acc, (cp, dl)) => acc + when(lit(cp) <= t, lit(-(cp * dl))).otherwise(lit(0.0))
    }
    val seasonal = (1 to m.fourierOrder).map { n =>
      // ang = ((2π·n)·d)/period — the literal is (2π)·n exactly as the
      // scorer loop computes it, preserving its rounding order
      val twoPiN = 2.0 * math.Pi * n
      lit(m.beta(2 * (n - 1))) * sin(lit(twoPiN) * d / lit(m.period)) +
        lit(m.beta(2 * (n - 1) + 1)) * cos(lit(twoPiN) * d / lit(m.period))
    }.reduceLeft(_ + _)
    lit(m.yScale) * (kT * t + mT + seasonal)
  }

  /** A double as a DuckDB literal. `Double.toString` round-trips, so
    * the oracle parses back the identical bits.
    */
  def sqlLit(x: Double): String = {
    val s = x.toString
    if (s.contains(".") || s.contains("E") || s.contains("e")) s else s + ".0"
  }

  /** The DuckDB mirror of `yhatColumn`: same literals, same
    * association order (explicit parens reproduce the fold). `d` and
    * `t` are column names of days-since-epoch (DOUBLE) and the
    * pre-scaled time `(d*86400 - start)/t_scale`.
    */
  def yhatSqlExpr(m: Model, d: String, t: String): String = {
    val kT = m.changepointsT.zip(m.delta).foldLeft(sqlLit(m.k)) {
      case (acc, (cp, dl)) =>
        s"($acc + CASE WHEN ${sqlLit(cp)} <= $t THEN ${sqlLit(dl)} ELSE 0.0 END)"
    }
    val mT = m.changepointsT.zip(m.delta).foldLeft(sqlLit(m.m)) {
      case (acc, (cp, dl)) =>
        s"($acc + CASE WHEN ${sqlLit(cp)} <= $t THEN ${sqlLit(-(cp * dl))} ELSE 0.0 END)"
    }
    val seasonal = (1 to m.fourierOrder).map { n =>
      val twoPiN = 2.0 * math.Pi * n
      val ang = s"((${sqlLit(twoPiN)} * $d) / ${sqlLit(m.period)})"
      s"(${sqlLit(m.beta(2 * (n - 1)))} * sin($ang) + ${sqlLit(m.beta(2 * (n - 1) + 1))} * cos($ang))"
    }.reduceLeft((a, b) => s"($a + $b)")
    s"(${sqlLit(m.yScale)} * ((($kT * $t) + $mT) + $seasonal))"
  }

  /** Forecast the next `days` daily totals after the model's embedded
    * history (ds, yhat, yhat_lower, yhat_upper) — the reference returns
    * exactly the last `days` rows (`ml_forecast_anomaly.py:137`).
    *
    * The spine is generated distributed (`sequence`+`explode`); each
    * row's mean + interval is computed independently under a broadcast
    * model — the plan scales linearly in `days` with no shuffle.
    */
  def forecast(spark: SparkSession, days: Int, homeId: Option[String] = None,
               seed: Long = 42L): DataFrame = {
    val model = bundled
    val bc = spark.sparkContext.broadcast(model)
    // per-sample future-trend draws are sample-level, not row-level:
    // drawn once here (1000 tiny tuples), broadcast with the model
    val horizonT = ((model.historyEnd.plusDays(days).toEpochDay * 86400.0) - model.start) / model.tScale
    val sims = spark.sparkContext.broadcast(TrendSim.draw(model, horizonT, seed))

    val quantUdf = udf { (epochSec: Double) =>
      val m = bc.value
      val base = m.yhat(epochSec)
      val t = (epochSec - m.start) / m.tScale
      val draws = sims.value.map(s => base + s.trendDeviation(m, t) * m.yScale + s.noise(t) * m.yScale)
      java.util.Arrays.sort(draws)
      val lo = (1.0 - m.intervalWidth) / 2.0
      (TrendSim.percentile(draws, lo), TrendSim.percentile(draws, 1.0 - lo))
    }

    val first = model.historyEnd.plusDays(1).toString
    val last = model.historyEnd.plusDays(days).toString
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(first)), to_date(lit(last)), expr("interval 1 day"))).as("ds"))
      .withColumn("epoch", unix_timestamp(col("ds").cast("timestamp")).cast("double"))
      .withColumn("yhat", udf((e: Double) => bc.value.yhat(e)).apply(col("epoch")))
      .withColumn("q", quantUdf(col("epoch")))
      .select(col("ds"), col("yhat"),
        col("q._1").as("yhat_lower"), col("q._2").as("yhat_upper"))
  }
}

/** One simulated future-trend path (Prophet sample_predictive_trend). */
final case class TrendSim(newCps: Array[Double], newDeltas: Array[Double],
                          noiseDraw: Double) {
  /** Deviation of this path's trend from the MAP trend at time t —
    * only future changepoints (cp > 1, i.e. past training end) differ.
    */
  def trendDeviation(m: ProphetScorer.Model, t: Double): Double = {
    var dev = 0.0
    var i = 0
    while (i < newCps.length) {
      if (newCps(i) <= t) dev += newDeltas(i) * (t - newCps(i))
      i += 1
    }
    dev
  }
  def noise(t: Double): Double = noiseDraw
}

object TrendSim {
  /** Draw `uncertainty_samples` future-trend paths. Future changepoints
    * arrive Poisson-uniformly in (1, T]; their deltas are
    * Laplace(0, mean|delta|); observation noise N(0, sigma_obs).
    */
  def draw(m: ProphetScorer.Model, horizonT: Double, seed: Long): Array[TrendSim] = {
    val rng = new java.util.Random(seed)
    val lambda = {
      var s = 0.0; m.delta.foreach(d => s += math.abs(d))
      s / m.delta.length + 1e-8
    }
    val nCp = m.changepointsT.length
    Array.fill(m.uncertaintySamples) {
      val nNew =
        if (horizonT > 1.0) poisson(rng, nCp * (horizonT - 1.0)) else 0
      val cps = Array.fill(nNew)(1.0 + rng.nextDouble() * (horizonT - 1.0))
      val deltas = Array.fill(nNew)(laplace(rng, lambda))
      TrendSim(cps, deltas, rng.nextGaussian() * m.sigmaObs)
    }
  }

  private def poisson(rng: java.util.Random, lambda: Double): Int = {
    // Knuth for small lambda; normal approx for large
    if (lambda > 30) math.max(0, math.round(lambda + math.sqrt(lambda) * rng.nextGaussian()).toInt)
    else {
      val l = math.exp(-lambda)
      var k = 0; var p = 1.0
      while ({ p *= rng.nextDouble(); p > l }) k += 1
      k
    }
  }

  private def laplace(rng: java.util.Random, b: Double): Double = {
    val u = rng.nextDouble() - 0.5
    -b * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u))
  }

  /** Linear-interpolation percentile (numpy.percentile semantics). */
  def percentile(sorted: Array[Double], q: Double): Double = {
    val idx = q * (sorted.length - 1)
    val lo = idx.toInt
    if (lo >= sorted.length - 1) sorted.last
    else sorted(lo) + (idx - lo) * (sorted(lo + 1) - sorted(lo))
  }
}
