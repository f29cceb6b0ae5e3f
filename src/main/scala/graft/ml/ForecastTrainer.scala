package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable forecaster (SURVEY §7.3 stretch goal): linear trend +
  * Fourier seasonality fit by ridge regression — the same model family
  * Prophet's MAP estimate uses (linear growth, additive seasonal
  * harmonics), fit in-engine instead of loading a frozen artifact.
  *
  * Spark-first training: the normal-equation terms (Gram matrix X'X
  * and moment vector X'y over the feature map
  * x(d) = [1, t, sin(2πnd/P), cos(2πnd/P)]_{n≤order}) are ONE
  * distributed aggregation pass — p(p+3)/2 codegen'd sum-of-product
  * expressions, mergeable across partitions, no data collected. Only
  * the (p x p) system (p = 2+2·order) is solved on the driver.
  */
object ForecastTrainer {

  final case class Model(beta: Array[Double], tMin: Double, tSpan: Double,
                         period: Double, order: Int, sigma: Double) {
    def features(daysSinceEpoch: Double): Array[Double] = {
      val t = (daysSinceEpoch - tMin) / tSpan
      val x = new Array[Double](2 + 2 * order)
      x(0) = 1.0
      x(1) = t
      var n = 1
      while (n <= order) {
        val ang = 2.0 * math.Pi * n * daysSinceEpoch / period
        x(2 * n) = math.sin(ang)
        x(2 * n + 1) = math.cos(ang)
        n += 1
      }
      x
    }

    def predict(daysSinceEpoch: Double): Double = {
      val x = features(daysSinceEpoch)
      var s = 0.0
      var i = 0
      while (i < x.length) { s += beta(i) * x(i); i += 1 }
      s
    }
  }

  /** Fit on a daily series. `dateCol` must be a DateType column. */
  def fit(daily: DataFrame, dateCol: Column, valueCol: Column,
          order: Int = 3, period: Double = 7.0, ridge: Double = 1e-3): Model = {
    val p = 2 + 2 * order
    val base = daily.select(
      datediff(dateCol, lit("1970-01-01")).cast("double").as("d"),
      valueCol.cast("double").as("y"))
    val Seq(tMin, tMax) = base.agg(min("d"), max("d")).head()
      .toSeq.map(_.asInstanceOf[Double])
    val tSpan = math.max(tMax - tMin, 1.0)

    def feat(i: Int): Column = i match {
      case 0 => lit(1.0)
      case 1 => (col("d") - lit(tMin)) / lit(tSpan)
      case _ =>
        val n = i / 2
        val ang = col("d") * (2.0 * math.Pi * n / period)
        if (i % 2 == 0) sin(ang) else cos(ang)
    }

    // one pass: upper-triangular Gram + moments (+ n, Σy² for sigma)
    val gramAggs =
      (for (i <- 0 until p; j <- i until p)
        yield sum(feat(i) * feat(j)).as(s"g_${i}_$j")) ++
        (0 until p).map(i => sum(feat(i) * col("y")).as(s"b_$i")) ++
        Seq(count(lit(1)).as("n"), sum(col("y") * col("y")).as("yy"))
    val row = base.agg(gramAggs.head, gramAggs.tail: _*).head()

    val g = Array.ofDim[Double](p, p)
    var idx = 0
    for (i <- 0 until p; j <- i until p) {
      g(i)(j) = row.getDouble(idx); g(j)(i) = g(i)(j); idx += 1
    }
    val bVec = Array.tabulate(p)(i => row.getDouble(idx + i))
    val n = row.getLong(idx + p)
    val yy = row.getDouble(idx + p + 1)
    for (i <- 0 until p) g(i)(i) += ridge

    val beta = solve(g, bVec)
    // residual variance from the same aggregates:
    // RSS = Σy² − 2β'X'y + β'(X'X)β
    var bxb = 0.0
    for (i <- 0 until p; j <- 0 until p) bxb += beta(i) * g(i)(j) * beta(j)
    var bxy = 0.0
    for (i <- 0 until p) bxy += beta(i) * bVec(i)
    val rss = math.max(yy - 2 * bxy + bxb, 0.0)
    val sigma = math.sqrt(rss / math.max(n - p, 1))
    Model(beta, tMin, tSpan, period, order, sigma)
  }

  /** Fleet-scale variant of [[fit]]: ONE model per key, every key fit
    * simultaneously. The reference fits one Prophet per request; at
    * 100 TB you fit per-entity seasonal models for the whole fleet in
    * one pass:
    *
    *  - per-key time normalization (tMin/tSpan) comes from a window
    *    over the key — the window's hash exchange is REUSED by the
    *    grouped aggregation that follows (same key), so the pipeline
    *    costs one shuffle;
    *  - the grouped aggregation emits each key's p(p+1)/2 Gram terms +
    *    p moments + (n, Σy²) — a few hundred doubles per key;
    *  - the p×p ridge solve runs INSIDE a deterministic UDF on each
    *    aggregated row — per-key work is O(p³) on ~100 bytes of input,
    *    embarrassingly parallel, nothing touches the driver.
    *
    * Output per key: `beta` (array), `sigma`, `n_obs`, `t_min`,
    * `t_span` — enough to reconstruct [[Model]] for scoring.
    */
  def fitPerKey(daily: DataFrame, key: String, dateCol: Column, valueCol: Column,
                order: Int = 3, period: Double = 7.0,
                ridge: Double = 1e-3): DataFrame = {
    val p = 2 + 2 * order
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    val base = daily.select(col(key),
        datediff(dateCol, lit("1970-01-01")).cast("double").as("d"),
        valueCol.cast("double").as("y"))
      .withColumn("__tmin", min(col("d")).over(w))
      .withColumn("__tspan",
        greatest(max(col("d")).over(w) - col("__tmin"), lit(1.0)))

    def feat(i: Int): Column = i match {
      case 0 => lit(1.0)
      case 1 => (col("d") - col("__tmin")) / col("__tspan")
      case _ =>
        val n = i / 2
        val ang = col("d") * (2.0 * math.Pi * n / period)
        if (i % 2 == 0) sin(ang) else cos(ang)
    }
    val gramAggs =
      (for (i <- 0 until p; j <- i until p)
        yield sum(feat(i) * feat(j)).as(s"g_${i}_$j")) ++
        (0 until p).map(i => sum(feat(i) * col("y")).as(s"b_$i")) ++
        Seq(count(lit(1)).as("n_obs"), sum(col("y") * col("y")).as("yy"),
          first(col("__tmin")).as("t_min"), first(col("__tspan")).as("t_span"))
    val agged = base.groupBy(col(key)).agg(gramAggs.head, gramAggs.tail: _*)

    val gCols = array((for (i <- 0 until p; j <- i until p)
      yield col(s"g_${i}_$j")): _*)
    val bCols = array((0 until p).map(i => col(s"b_$i")): _*)
    val solveUdf = udf((gFlat: Seq[Double], bv: Seq[Double], n: Long, yy: Double) => {
      val g = Array.ofDim[Double](p, p)
      var idx = 0
      for (i <- 0 until p; j <- i until p) {
        g(i)(j) = gFlat(idx); g(j)(i) = gFlat(idx); idx += 1
      }
      for (i <- 0 until p) g(i)(i) += ridge
      val beta = solve(g, bv.toArray)
      var bxb = 0.0
      for (i <- 0 until p; j <- 0 until p) bxb += beta(i) * g(i)(j) * beta(j)
      var bxy = 0.0
      for (i <- 0 until p) bxy += beta(i) * bv(i)
      val rss = math.max(yy - 2 * bxy + bxb, 0.0)
      (beta, math.sqrt(rss / math.max(n - p, 1)))
    })
    agged
      .withColumn("__m", solveUdf(gCols, bCols, col("n_obs"), col("yy")))
      .select(col(key), col("__m._1").as("beta"), col("__m._2").as("sigma"),
        col("n_obs"), col("t_min"), col("t_span"))
  }

  /** Rebuild a scoring [[Model]] from one [[fitPerKey]] output row. */
  def modelFromRow(row: org.apache.spark.sql.Row, order: Int = 3,
                   period: Double = 7.0): Model =
    Model(row.getAs[collection.Seq[Double]]("beta").toArray,
      row.getAs[Double]("t_min"), row.getAs[Double]("t_span"),
      period, order, row.getAs[Double]("sigma"))

  /** Gaussian elimination with partial pivoting (p is tiny). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val p = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    for (k <- 0 until p) {
      var piv = k
      for (i <- k + 1 until p) if (math.abs(a(i)(k)) > math.abs(a(piv)(k))) piv = i
      val tmp = a(k); a(k) = a(piv); a(piv) = tmp
      val tb = b(k); b(k) = b(piv); b(piv) = tb
      require(math.abs(a(k)(k)) > 1e-12, "singular system")
      for (i <- k + 1 until p) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until p) a(i)(j) -= f * a(k)(j)
        b(i) -= f * b(k)
      }
    }
    val x = new Array[Double](p)
    for (i <- p - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until p) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }

  /** Forecast `days` past the series end: ds, yhat and normal-approx
    * 80% interval (z=1.2816 · residual sigma — documented approximation
    * vs Prophet's trend-uncertainty MC).
    */
  def forecast(spark: SparkSession, model: Model, lastDate: java.time.LocalDate,
               days: Int, z: Double = 1.2816): DataFrame = {
    val bc = spark.sparkContext.broadcast(model)
    val predUdf = udf((d: java.sql.Date) => bc.value.predict(d.toLocalDate.toEpochDay.toDouble))
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(lastDate.plusDays(1).toString)),
        to_date(lit(lastDate.plusDays(days).toString)),
        expr("interval 1 day"))).as("ds"))
      .withColumn("yhat", predUdf(col("ds")))
      .withColumn("yhat_lower", col("yhat") - z * model.sigma)
      .withColumn("yhat_upper", col("yhat") + z * model.sigma)
  }
}
