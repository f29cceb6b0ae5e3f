package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ml.ForecastTrainer
import org.apache.spark.sql.functions._

class ForecastTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a known trend + weekly signal almost exactly") {
    // y = 10 + 0.5*day + 3*sin(2*pi*d/7) + 2*cos(2*pi*2d/7)
    val rows = (0 until 200).map { d =>
      val day = 19000 + d
      val y = 10.0 + 0.05 * d +
        3.0 * math.sin(2 * math.Pi * day / 7.0) +
        2.0 * math.cos(2 * math.Pi * 2 * day / 7.0)
      (java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(day)), y)
    }.toDF("ds", "y")
    val m = ForecastTrainer.fit(rows, $"ds", $"y", order = 3, period = 7.0)
    // in-sample prediction error ~ ridge-only
    val errs = (0 until 200).map { d =>
      val day = 19000 + d
      val expect = 10.0 + 0.05 * d +
        3.0 * math.sin(2 * math.Pi * day / 7.0) +
        2.0 * math.cos(2 * math.Pi * 2 * day / 7.0)
      math.abs(m.predict(day.toDouble) - expect)
    }
    // tolerance = ridge-shrinkage bias at lambda 1e-3, not noise
    assert(errs.max < 0.05, s"max err ${errs.max}")
    assert(m.sigma < 0.05)
  }

  test("fitPerKey == per-slice global fit, for keys with different signals") {
    // two keys with DIFFERENT planted signals and different date ranges
    def series(key: String, start: Int, days: Int, slope: Double,
               amp: Double): Seq[(String, java.sql.Date, Double)] =
      (0 until days).map { d =>
        val day = start + d
        val y = 5.0 + slope * d + amp * math.sin(2 * math.Pi * day / 7.0)
        (key, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(day)), y)
      }
    val df = (series("a", 19000, 120, 0.05, 3.0)
      ++ series("b", 19050, 90, -0.02, 1.5)).toDF("k", "ds", "y")
    val grouped = ForecastTrainer.fitPerKey(df, "k", $"ds", $"y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(grouped.keySet == Set("a", "b"))
    for (k <- Seq("a", "b")) {
      val solo = ForecastTrainer.fit(df.filter($"k" === k), $"ds", $"y")
      val row = grouped(k)
      val beta = row.getAs[collection.Seq[Double]]("beta")
      solo.beta.zip(beta).foreach { case (e, g) =>
        assert(math.abs(e - g) < 1e-8, s"key $k beta: $e vs $g")
      }
      assert(math.abs(solo.sigma - row.getAs[Double]("sigma")) < 1e-8)
      // reconstructed model predicts the same values as the solo fit
      val m = ForecastTrainer.modelFromRow(row)
      assert(math.abs(m.predict(19100.0) - solo.predict(19100.0)) < 1e-8)
    }
  }

  test("fit on the reference model's embedded history: MAE comparable to Prophet") {
    val in = getClass.getResourceAsStream("/prophet_model.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val hist = new ObjectMapper().readTree(root.get("history").asText).get("data")
    val rows = (0 until hist.size).map { i =>
      (java.sql.Date.valueOf(hist.get(i).get("ds").asText.take(10)),
        hist.get(i).get("y").asDouble)
    }.toDF("ds", "y")
    val m = ForecastTrainer.fit(rows, $"ds", $"y")
    val mae = (0 until hist.size).map { i =>
      val d = java.time.LocalDate.parse(hist.get(i).get("ds").asText.take(10)).toEpochDay
      math.abs(m.predict(d.toDouble) - hist.get(i).get("y").asDouble)
    }.sum / hist.size
    // the frozen Prophet artifact fits its own history at MAE ~26.9
    assert(mae < 35.0, s"MAE $mae")

    // forecast surface: spine, ordering, intervals
    val f = ForecastTrainer.forecast(spark, m,
      java.time.LocalDate.parse("2023-05-31"), days = 14).orderBy("ds").collect()
    assert(f.length == 14)
    assert(f.head.getDate(0).toLocalDate == java.time.LocalDate.parse("2023-06-01"))
    f.foreach(r => assert(r.getDouble(2) < r.getDouble(1) && r.getDouble(1) < r.getDouble(3)))
  }

  test("interval calibration: 80% band covers ~80% of held-out history") {
    val in = getClass.getResourceAsStream("/prophet_model.json")
    val root = new ObjectMapper().readTree(in); in.close()
    val hist = new ObjectMapper().readTree(root.get("history").asText).get("data")
    val all = (0 until hist.size).map { i =>
      (java.sql.Date.valueOf(hist.get(i).get("ds").asText.take(10)),
        hist.get(i).get("y").asDouble)
    }
    val (train, holdout) = all.splitAt(120) // 120 train, 31 held out
    val m = ForecastTrainer.fit(train.toDF("ds", "y"), $"ds", $"y")
    val z = 1.2816
    val covered = holdout.count { case (d, y) =>
      val yhat = m.predict(d.toLocalDate.toEpochDay.toDouble)
      y >= yhat - z * m.sigma && y <= yhat + z * m.sigma
    }
    val rate = covered.toDouble / holdout.size
    // 31 points at nominal 0.8: 3-sigma binomial band is ~ +-0.22
    assert(rate >= 0.55 && rate <= 1.0, s"held-out coverage $rate")
  }
}
