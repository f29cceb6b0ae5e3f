package graft

import graft.core.Similarity
import org.apache.spark.sql.functions._

class LofSpec extends SparkSpec {
  import spark.implicits._

  // 1-D points exact in float32 AND on the milli lattice:
  // 0, 0.125, 0.25 (a tight run) and 1.0 (the outlier), k=2
  private val pts = Seq(
    (1L, Array(0.0f)), (2L, Array(0.125f)),
    (3L, Array(0.25f)), (4L, Array(1.0f)))

  test("hand-checked k=2 LOF: exact integer lrd and lof values") {
    val got = Similarity.lof(pts.toDF("vec_id", "embedding"), k = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // milli coords 0,125,250,1000; see scaladoc algebra
    assert(got(1L) == ((1L, 62500L, 2L, 25600000L, 812500L)))
    assert(got(2L) == ((2L, 15625L, 2L, 16000000L, 1600000L)))
    assert(got(3L) == ((3L, 62500L, 2L, 25600000L, 812500L)))
    val (_, kd, n, lrdD, lofD) = got(4L)
    assert(kd == 765625L && n == 2L && lrdD == 1505882L)
    assert(lofD > 10000000L, s"outlier lof $lofD") // >> 1e6 = inlier
  }

  test("uniform grid: every point is an inlier (lof near 1e6)") {
    val grid = (0 until 20).map(i => (i.toLong, Array(i * 0.125f)))
    val got = Similarity.lof(grid.toDF("vec_id", "embedding"), k = 3)
      .select("lof_micro").as[Long].collect()
    assert(got.forall(l => l > 700000L && l < 1500000L), got.toSeq.toString)
  }

  test("partition-invariant; maxRows guard fires in-plan") {
    val df = pts.toDF("vec_id", "embedding")
    val a = Similarity.lof(df, 2).collect().toSet
    val b = Similarity.lof(df.repartition(3), 2).collect().toSet
    assert(a == b)
    val err = intercept[Exception] {
      Similarity.lof(df, 2, maxRows = 2L).collect()
    }
    assert(err.getMessage.contains("exact O(n^2) baseline"))
  }
}
