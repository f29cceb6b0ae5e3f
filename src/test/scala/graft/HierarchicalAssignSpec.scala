package graft

import graft.core.Similarity
import org.apache.spark.sql.DataFrame

/** Exactness/recall gates for the two-level IVF assignment vs the
  * flat integer-d² baseline.
  */
class HierarchicalAssignSpec extends SparkSpec {
  import spark.implicits._

  // 4 coarse regions on a line, each with 3 fine centroids; points
  // scattered around the fine centroids
  private def fixture: (DataFrame, DataFrame, DataFrame) = {
    val coarse = (0 until 4).map(c => (c.toLong, Array(c * 10.0f)))
    val fine = for (c <- 0 until 4; j <- 0 until 3)
      yield ((c * 3 + j).toLong, Array(c * 10.0f + j * 2.0f))
    val pts = (0 until 48).map { i =>
      (100L + i, Array((i % 12) * 2.0f + (i % 5) * 0.125f))
    }
    (pts.toDF("vec_id", "embedding"),
      coarse.toDF("centroid_id", "embedding"),
      fine.toDF("centroid_id", "embedding"))
  }

  test("wProbe = C reproduces the flat assignment EXACTLY " +
      "(every fine centroid is a candidate, same argmin, same ties)") {
    val (pts, coarse, fine) = fixture
    val flat = Similarity.assignBucketsL2(pts, fine).collect().toSet
    val hier = Similarity.assignBucketsHierarchical(pts, coarse, fine,
      wProbe = 4).collect().toSet
    assert(hier == flat)
  }

  test("clustered points at wProbe=1 match flat; wProbe=2 closes " +
      "coarse-boundary misses") {
    val (pts, coarse, fine) = fixture
    val flat = Similarity.assignBucketsL2(pts, fine).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w2 = Similarity.assignBucketsHierarchical(pts, coarse, fine,
        wProbe = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // wProbe=2 on this geometry: every point's true fine centroid is
    // under one of its two nearest coarse cells
    assert(w2 == flat)
    val w1 = Similarity.assignBucketsHierarchical(pts, coarse, fine,
        wProbe = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // wProbe=1 still agrees for the vast majority (only coarse-cell
    // boundary points can miss) and NEVER reports a smaller d2 than
    // the flat exact minimum
    val agree = w1.count { case (id, v) => flat(id) == v }
    assert(agree >= (w1.size * 8) / 10, s"agree=$agree of ${w1.size}")
    w1.foreach { case (id, (_, d2)) => assert(d2 >= flat(id)._2) }
  }

  test("empty centroid tables fail loudly, not with silent empties") {
    val (pts, coarse, _) = fixture
    val empty = Seq.empty[(Long, Array[Float])]
      .toDF("centroid_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.assignBucketsL2(pts, empty)
    }
    assert(e1.getMessage.contains("empty"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.assignBucketsHierarchical(pts, coarse, empty, 2)
    }
    assert(e2.getMessage.contains("empty"))
  }

  test("partition invariance") {
    val (pts, coarse, fine) = fixture
    val a = Similarity.assignBucketsHierarchical(pts, coarse, fine, 2)
      .collect().toSet
    val b = Similarity.assignBucketsHierarchical(pts.repartition(9),
      coarse, fine, 2).collect().toSet
    assert(a == b)
  }
}
