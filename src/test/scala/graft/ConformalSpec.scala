package graft

import graft.core.{Eval, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(7)
    (1 to 400).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toLong,
        (rnd.nextInt(10000) + 1).toLong))
  }

  test("qhat is the exact ceil((n+1)(1-alpha)) calibration order statistic") {
    val df = rows.toDF("g", "rid", "y")
    val got = Eval.conformalCalibrate(df, col("g"), col("rid"), col("y"))
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

    // recompute expected driver-side from the SAME portable split
    val split = Sampling.hashSplit(df, "rid",
        Seq("train" -> 0.4, "calib" -> 0.3, "test" -> 0.3))
      .select("g", "rid", "y", "split")
      .as[(String, Long, Long, String)].collect()
    for (g <- Seq("a", "b")) {
      val train = split.filter(r => r._1 == g && r._4 == "train").map(_._3)
      val mean = train.sum / train.length // floor DIV, non-negative
      val calib = split.filter(r => r._1 == g && r._4 == "calib")
        .map(r => math.abs(r._3 - mean)).sorted
      val r = ((calib.length + 1) * 900000L + 999999L) / 1000000L
      val qhat = calib(r.toInt - 1)
      val test = split.filter(r => r._1 == g && r._4 == "test")
        .map(r => math.abs(r._3 - mean))
      val covered = test.count(_ <= qhat)
      val (_, meanG, nCal, qhatG, nTest, nCov, covMicro) = got(g)
      assert(meanG == mean && nCal == calib.length && qhatG == qhat)
      assert(nTest == test.length && nCov == covered)
      assert(covMicro == covered * 1000000L / test.length)
      // finite-sample property sanity: coverage near 1 - alpha
      assert(covMicro > 800000L && covMicro <= 1000000L, s"cov $covMicro")
    }
  }

  test("partition-invariant; undersized groups drop") {
    val df = rows.toDF("g", "rid", "y")
    val a = Eval.conformalCalibrate(df, col("g"), col("rid"), col("y"))
      .collect().toSet
    val b = Eval.conformalCalibrate(df.repartition(13),
      col("g"), col("rid"), col("y")).collect().toSet
    assert(a == b && a.nonEmpty)
    // a group with ~3 rows can't support alpha=0.1 (rank > n_calib)
    val tiny = Seq(("z", 1L, 5L), ("z", 2L, 6L), ("z", 3L, 7L))
      .toDF("g", "rid", "y")
    val out = Eval.conformalCalibrate(tiny, col("g"), col("rid"), col("y"))
    assert(out.filter(col("group") === "z").count() == 0)
  }
}
