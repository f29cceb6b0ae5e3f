package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.api.EnergyApi
import graft.ml.{IsoForestScorer, ProphetScorer, TrendSim}

/** Model-scorer parity (SURVEY §5.4).
  *
  * IsoForest: fixed vectors vs decision_function values from an
  * independent numpy implementation of the same public sklearn
  * formulas (`tools/export_isoforest.py` fixture).
  * Prophet: trend vs the artifact's own embedded fitted trend (exact
  * in-sample oracle), plus forecast-shape and L-1 invariants.
  */
class MlScorerSpec extends SparkSpec {
  import spark.implicits._

  test("isoforest: decision_function matches numpy reference on 24 fixtures") {
    val in = getClass.getResourceAsStream("/isoforest_fixture.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val model = IsoForestScorer.bundled
    (0 until root.get("vectors").size).foreach { i =>
      val v = (0 until 4).map(j => root.get("vectors").get(i).get(j).asDouble).toArray
      val expected = root.get("decision_function").get(i).asDouble
      val got = model.decisionFunction(v)
      assert(math.abs(got - expected) < 1e-9, s"vec $i: got $got expected $expected")
      val predicted = if (got < 0) -1 else 1
      assert(predicted == root.get("predict").get(i).asInt)
    }
  }

  test("isoforest: Spark UDF path flags ~contamination share on training-like data") {
    val readings = graft.core.EnergyIngest.ingest(spark, RefCsv)._1
    val scored = EnergyApi.detectAnomalies(readings)
    val n = scored.count()
    // densification is per-home min..max (reference parity, NOT a
    // global grid): expected rows = sum over homes of span days
    val expected = readings
      .groupBy("HomeID")
      .agg((datediff(max(to_date($"Date", "dd-MM-yyyy")),
        min(to_date($"Date", "dd-MM-yyyy"))) + 1).as("span"))
      .agg(sum("span")).head().getLong(0)
    assert(n == expected, s"dense grid rows: $n vs $expected")
    // the model trained on ~38k OBSERVED (home, day) rows at
    // contamination 0.05 — on observed rows the flagged share must sit
    // near that; zero-filled densified days score off-distribution, so
    // the overall share only gets a loose ceiling
    val observed = scored.filter($"total_kwh" > 0)
    val shareObs = observed.filter($"anomaly").count().toDouble / observed.count()
    assert(shareObs > 0.01 && shareObs < 0.10, s"observed anomaly share $shareObs")
    val shareAll = scored.filter($"anomaly").count().toDouble / n
    assert(shareAll < 0.2, s"overall anomaly share $shareAll")
    assert(scored.columns.toSeq == Seq("HomeID", "Date", "total_kwh",
      "unique_appliances", "rolling_7_mean", "dow", "score", "anomaly"))
  }

  test("isoforest: fixed ensemble hand-walked on a 1-tree depth-2 case") {
    // t=0, depth 2: node0 (f0, thr -2.0) -> node2 (f2, thr -1.32) for
    // z=0 (both comparisons false -> right); leaf node6, depth 2,
    // n = 2 + 6*7 % 120 = 44
    val m = IsoForestScorer.fixedModel(numTrees = 1, depth = 2)
    val x = Array(48.0, 49.0, 50.0, 51.0) // z = (0,0,0,0)
    val c44 = 2.0 * (math.log(43.0) + 0.5772156649015329) - 2.0 * 43.0 / 44.0
    val path = 2.0 + c44
    val expected = -math.pow(2.0, -path / (1 * m.cNorm)) - m.offset
    assert(m.decisionFunction(x) == expected)
    // left-at-root coverage: z0 <= -2 needs x0 <= 48 - 56
    val xLeft = Array(-10.0, 49.0, 50.0, 51.0)
    // node0 -> node1 (f3, thr -1.66): z3=0 > thr -> right -> leaf 4,
    // n = 2 + 4*7 % 120 = 30
    val c30 = 2.0 * (math.log(29.0) + 0.5772156649015329) - 2.0 * 29.0 / 30.0
    val expLeft = -math.pow(2.0, -(2.0 + c30) / (1 * m.cNorm)) - m.offset
    assert(m.decisionFunction(xLeft) == expLeft)
  }

  test("isoforest: fixed ensemble discriminates across the id range") {
    val scores = (0L until 200L).map(id => IsoForestScorer.fixedEnsemble
      .decisionFunction(Array(((id * 17 + 3) % 1000) / 10.0,
        ((id * 29 + 7) % 1000) / 10.0, ((id * 41 + 11) % 1000) / 10.0,
        ((id * 53 + 13) % 1000) / 10.0)))
    assert(scores.distinct.size > 50, s"only ${scores.distinct.size} distinct")
    assert(scores.forall(s => s > -1.0 && s < 1.0))
  }

  test("prophet: trend matches the artifact's embedded fitted trend") {
    val in = getClass.getResourceAsStream("/prophet_model.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val m = ProphetScorer.bundled
    val hist = new ObjectMapper().readTree(root.get("history").asText).get("data")
    val trendRef = root.get("params").get("trend").get(0)
    (0 until hist.size by 10).foreach { i =>
      val t = hist.get(i).get("t").asDouble
      val got = m.trendScaled(t)
      val exp = trendRef.get(i).asDouble
      assert(math.abs(got - exp) < 1e-5, s"t=$t got $got exp $exp")
    }
  }

  test("prophet: codegen'd yhat Column is bit-equal to the scorer loop") {
    // the q88 gate expression must BE q29's mean path — not an
    // approximation of it: same literals, same accumulation order,
    // so the doubles match exactly over a full year of horizon
    import org.apache.spark.sql.functions._
    val m = ProphetScorer.bundled
    val first = m.historyEnd.plusDays(1).toString
    val last = m.historyEnd.plusDays(365).toString
    val rows = spark.range(1)
      .select(explode(sequence(to_date(lit(first)), to_date(lit(last)),
        expr("interval 1 day"))).as("ds"))
      .withColumn("d", datediff(col("ds"), lit("1970-01-01")).cast("double"))
      .select(col("d"), ProphetScorer.yhatColumn(m, col("d")).as("yhat"))
      .collect()
    assert(rows.length == 365)
    rows.foreach { r =>
      val d = r.getDouble(0)
      val exp = m.yhat(d * 86400.0)
      assert(r.getDouble(1) == exp, s"d=$d col=${r.getDouble(1)} loop=$exp")
    }
  }

  test("prophet: in-sample yhat tracks history (MAE well under data scale)") {
    val in = getClass.getResourceAsStream("/prophet_model.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val m = ProphetScorer.bundled
    val hist = new ObjectMapper().readTree(root.get("history").asText).get("data")
    var mae = 0.0; var mean = 0.0
    (0 until hist.size).foreach { i =>
      val ds = java.time.LocalDate.parse(hist.get(i).get("ds").asText.take(10))
      val y = hist.get(i).get("y").asDouble
      mae += math.abs(m.yhat(ds.toEpochDay * 86400.0) - y)
      mean += y
    }
    mae /= hist.size; mean /= hist.size
    assert(mae < 0.1 * mean, s"MAE $mae vs mean $mean")
  }

  test("prophet: 80% MC interval covers ~80% of the model's own history") {
    // score the embedded history dates through the same trend+seasonal
    // mean and the MC interval halfwidth taken from the first forecast
    // day (horizon-0-ish width ~ observation noise dominates in-sample)
    val m = ProphetScorer.bundled
    val in = getClass.getResourceAsStream("/prophet_model.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val hist = new ObjectMapper().readTree(root.get("history").asText).get("data")
    // sigma_obs scaled back to data units; z for 80% two-sided
    val half = 1.2816 * m.sigmaObs * m.yScale
    val covered = (0 until hist.size).count { i =>
      val ds = java.time.LocalDate.parse(hist.get(i).get("ds").asText.take(10))
      val y = hist.get(i).get("y").asDouble
      math.abs(y - m.yhat(ds.toEpochDay * 86400.0)) <= half
    }
    val rate = covered.toDouble / hist.size
    assert(rate >= 0.6 && rate <= 0.95, s"in-sample 80pct coverage $rate")
  }

  test("prophet: MC band matches analytic normal approx; tight in-sample coverage") {
    // The round-2/3 agenda item, quantified: in-sample (t <= 1) no
    // future changepoint fires, so the MC 80% band reduces to the
    // observation-noise quantiles — which for N(0, sigma_obs) have the
    // closed form ±z_.9 · sigma_obs · y_scale. Assert (a) the seeded
    // 1000-path MC edges land within 10% of that analytic width (MC
    // percentile noise at n=1000 is ~3-4%), and (b) the MC band covers
    // the artifact's own 151-row history at 80% ± 8pp (measured
    // 0.795 analytic — residual std 33.57 vs sigma·y_scale 33.52, the
    // fit's noise estimate is honest).
    val m = ProphetScorer.bundled
    val in = getClass.getResourceAsStream("/prophet_model.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val hist = new ObjectMapper().readTree(root.get("history").asText).get("data")
    val horizonT = ((m.historyEnd.plusDays(30).toEpochDay * 86400.0) - m.start) / m.tScale
    val sims = TrendSim.drawPortable(m, horizonT, seed = 42L)
    val sortedNoise = sims.map(_.noiseDraw * m.yScale).sorted
    val lo = TrendSim.percentile(sortedNoise, 0.1)
    val hi = TrendSim.percentile(sortedNoise, 0.9)
    val analytic = 1.2815515655446004 * m.sigmaObs * m.yScale
    assert(math.abs(-lo - analytic) / analytic < 0.10,
      s"MC lower edge $lo vs analytic ±$analytic")
    assert(math.abs(hi - analytic) / analytic < 0.10,
      s"MC upper edge $hi vs analytic ±$analytic")
    val covered = (0 until hist.size).count { i =>
      val ds = java.time.LocalDate.parse(hist.get(i).get("ds").asText.take(10))
      val r = hist.get(i).get("y").asDouble - m.yhat(ds.toEpochDay * 86400.0)
      r >= lo && r <= hi
    }
    val rate = covered.toDouble / hist.size
    assert(rate >= 0.72 && rate <= 0.88, s"in-sample MC 80pct coverage $rate")
  }

  test("prophet: yhat and 80% band match independent numpy prophet-1.1.7 reimpl fixture") {
    // Fixture: tools/gen_prophet_fixture.py — an independent numpy
    // reimplementation of prophet-1.1.7 predict() over the reference
    // artifact (prophet itself can't run here: no egress). yhat is
    // closed-form => exact; band edges are quasi-exact 200k-sample
    // quantiles with a per-edge tolerance = 4x the std-dev of
    // 1000-sample replicate edges (any single prophet run's band —
    // prophet's own RNG is unseeded — lies inside w.p. ~0.9999).
    val in = getClass.getResourceAsStream("/prophet_forecast_fixture.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val rows = root.get("rows")
    val got = ProphetScorer.forecast(spark, days = root.get("days").asInt)
      .orderBy("ds").collect()
    assert(got.length == rows.size)
    (0 until rows.size).foreach { i =>
      val exp = rows.get(i)
      assert(got(i).getDate(0).toString == exp.get("ds").asText)
      val dy = math.abs(got(i).getDouble(1) - exp.get("yhat").asDouble)
      assert(dy < 1e-6, s"day $i yhat off by $dy")
      val tol = exp.get("edge_tol").asDouble
      val dLo = math.abs(got(i).getDouble(2) - exp.get("yhat_lower").asDouble)
      val dHi = math.abs(got(i).getDouble(3) - exp.get("yhat_upper").asDouble)
      assert(dLo <= tol, s"day $i lower off by $dLo (tol $tol)")
      assert(dHi <= tol, s"day $i upper off by $dHi (tol $tol)")
    }
  }

  test("prophet: portable-hash MC draws reproduce the independent python " +
      "reference EXACTLY; 3-row interval fixture pinned") {
    // Fixture: tools/gen_mc_portable_fixture.py — the portable-hash
    // draw pipeline (rolling fold + Pollard-rho avalanche, Poisson
    // CDF-table count, uniform changepoints, Laplace quantile deltas,
    // Box-Muller noise) reimplemented independently in Python,
    // TrendSim.drawPortable(seed=42) replayed draw-for-draw, band
    // edges computed with the scorer's own arithmetic. This pins the
    // MC machinery DETERMINISTICALLY (gen_prophet_fixture pins it only
    // statistically, since prophet's own RNG is unseeded) — and the
    // same arithmetic is what the q29 DuckDB oracle replays, so this
    // fixture is the third independent implementation of the pipeline.
    // Tolerances: the hash stream and every branch decision are exact
    // integer / correctly-rounded float arithmetic -> 1e-12 on the raw
    // draws (ln/cos/sqrt magnitudes may differ by 1 ulp between
    // libms); the edges additionally carry the closed-form yhat base
    // (cross-pinned at 1e-6 by the prophet fixture) -> 1e-4 absolute.
    val in = getClass.getResourceAsStream("/prophet_mc_portable_fixture.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val m = ProphetScorer.bundled
    val days = root.get("days").asInt
    val horizonT =
      ((m.historyEnd.plusDays(days).toEpochDay * 86400.0) - m.start) / m.tScale
    assert(math.abs(horizonT - root.get("horizon_t").asDouble) < 1e-12)
    val sims = TrendSim.drawPortable(m, horizonT,
      seed = root.get("seed").asLong)
    assert(sims.length == root.get("uncertainty_samples").asInt)
    // the exact-stream pin: sample 0's raw draws
    val s0 = root.get("stream_sample0")
    assert(sims(0).newCps.length == s0.get("n_new").asInt,
      s"sample-0 changepoint count ${sims(0).newCps.length}")
    (0 until s0.get("n_new").asInt).foreach { i =>
      assert(math.abs(sims(0).newCps(i) - s0.get("cps").get(i).asDouble) < 1e-12,
        s"cps($i)")
      assert(math.abs(sims(0).newDeltas(i) - s0.get("deltas").get(i).asDouble) < 1e-12,
        s"deltas($i)")
    }
    assert(math.abs(sims(0).noiseDraw - s0.get("noise").asDouble) < 1e-12)
    // the 3-row end-to-end interval pin through forecast() itself
    val rows = root.get("rows")
    val byDs = ProphetScorer.forecast(spark, days).collect()
      .map(r => r.getDate(0).toString -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    (0 until rows.size).foreach { i =>
      val exp = rows.get(i)
      val (lo, hi) = byDs(exp.get("ds").asText)
      val dLo = math.abs(lo - exp.get("yhat_lower").asDouble)
      val dHi = math.abs(hi - exp.get("yhat_upper").asDouble)
      assert(dLo < 1e-4, s"${exp.get("ds").asText} lower off by $dLo")
      assert(dHi < 1e-4, s"${exp.get("ds").asText} upper off by $dHi")
    }
  }

  test("prophet: forecast shape, ordering, interval sanity, L-1 homeId-independence") {
    val f = EnergyApi.forecast(spark, days = 14).orderBy("ds").collect()
    assert(f.length == 14)
    val first = f.head.getDate(0).toLocalDate
    assert(first == ProphetScorer.bundled.historyEnd.plusDays(1))
    f.foreach { r =>
      val (yhat, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(lo < yhat && yhat < hi, s"interval ($lo, $hi) must bracket $yhat")
    }
    // L-1: forecast ignores homeId
    val withHome = EnergyApi.forecast(spark, days = 14, homeId = Some("430"))
      .orderBy("ds").collect()
    assert(f.map(_.getDouble(1)).toSeq == withHome.map(_.getDouble(1)).toSeq)
    assert(f.map(_.getDouble(2)).toSeq == withHome.map(_.getDouble(2)).toSeq)
  }
}
