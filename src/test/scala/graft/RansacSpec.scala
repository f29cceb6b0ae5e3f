package graft

import graft.core.TimeSeries
import org.apache.spark.sql.functions._

class RansacSpec extends SparkSpec {
  import spark.implicits._

  test("consensus recovers the true line past an outlier (eps=0)") {
    // 12 points on y = 3x + 7, one wild outlier
    val rows = (0L to 11L).map(x => (x, 3 * x + 7)) :+ ((20L, 1L))
    val got = TimeSeries.ransacLine(rows.toDF("x", "y"), "x", "y",
        k = 16, epsY = 0L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    val (_, x1, y1, x2, y2, nIn, nPts, micro) = got
    assert(nPts == 13L)
    assert(nIn == 12L, s"consensus $nIn")            // all line points
    assert(y2 - y1 == 3 * (x2 - x1) && y1 == 3 * x1 + 7) // the true line
    assert(micro == 12L * 1000000L / 13L)
  }

  test("eps widens the consensus band; deterministic across partitionings") {
    val rows = (0L to 9L).map(x => (x, 10 * x + (x % 3))) // jitter <= 2
    val df = rows.toDF("x", "y")
    val tight = TimeSeries.ransacLine(df, "x", "y", k = 8, epsY = 0L)
      .select("n_inliers").as[Long].collect().head
    val loose = TimeSeries.ransacLine(df, "x", "y", k = 8, epsY = 2L)
      .select("n_inliers").as[Long].collect().head
    assert(loose == 10L && tight < loose)
    val a = TimeSeries.ransacLine(df, "x", "y", k = 8, epsY = 2L)
      .collect().toSeq
    val b = TimeSeries.ransacLine(df.repartition(5), "x", "y",
      k = 8, epsY = 2L).collect().toSeq
    assert(a == b)
  }

  test("all-equal x fails loudly (no non-degenerate pair)") {
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      TimeSeries.ransacLine(df, "x", "y", k = 4)
    }
  }

  test("duplicate x values stay deterministic across partitionings " +
      "(y is in the sample hash and the tie-break)") {
    // every x appears twice with different y — under an x-only hash
    // the sort keys were fully tied and the sample partition-order
    // dependent (ADVICE r12)
    val rows = (0L to 9L).flatMap(x => Seq((x, 2 * x), (x, 2 * x + 9)))
    val df = rows.toDF("x", "y")
    val a = TimeSeries.ransacLine(df, "x", "y", k = 8, epsY = 3L)
      .collect().toSeq
    val b = TimeSeries.ransacLine(df.repartition(7), "x", "y",
      k = 8, epsY = 3L).collect().toSeq
    val c = TimeSeries.ransacLine(df.orderBy(col("y").desc), "x", "y",
      k = 8, epsY = 3L).collect().toSeq
    assert(a == b && a == c)
  }
}
