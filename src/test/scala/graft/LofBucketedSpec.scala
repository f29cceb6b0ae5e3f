package graft

import graft.core.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall gate for [[Similarity.lofBucketed]] vs the exact [[lof]]
  * baseline — the q27/q104 discipline: all-buckets-probed is exactly
  * the baseline, separated clusters are bit-identical at nProbe=1,
  * and a mixed corpus keeps the outlier RANKING aligned.
  */
class LofBucketedSpec extends SparkSpec {
  import spark.implicits._

  // three tight 2-D clusters on the milli lattice + one far outlier
  // per cluster-gap; centroids sit on the cluster centers
  private def clustered: (DataFrame, DataFrame) = {
    val base = Seq(0.0f, 4.0f, 8.0f)
    val members = base.zipWithIndex.flatMap { case (cx, ci) =>
      (0 until 5).map { j =>
        (ci * 10L + j, Array(cx + j * 0.125f, cx - j * 0.125f))
      }
    }
    val outlier = Seq((99L, Array(2.0f, 2.0f)))
    val cents = base.zipWithIndex.map { case (cx, ci) =>
      (ci.toLong, Array(cx + 0.25f, cx - 0.25f))
    }
    ((members ++ outlier).toDF("vec_id", "embedding"),
      cents.toDF("centroid_id", "embedding"))
  }

  private def noBucket(df: DataFrame) =
    df.drop("bucket").collect().toSet

  test("probing every bucket reproduces the exact baseline " +
      "bit-for-bit (candidates = all pairs)") {
    val (emb, cents) = clustered
    val exact = Similarity.lof(emb, k = 3).collect().toSet
    val all = Similarity.lofBucketed(emb, cents, k = 3, nProbe = 3)
    assert(noBucket(all) == exact)
  }

  test("separated clusters at nProbe=1: per-point values match the " +
      "exact baseline for every point whose true kNN are in-bucket") {
    val (emb, cents) = clustered
    val exact = Similarity.lof(emb, k = 3).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val b = Similarity.lofBucketed(emb, cents, k = 3, nProbe = 1)
    val got = b.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    // cluster members: true 3-NN are the 4 cluster mates -> identical
    val members = emb.select("vec_id").as[Long].collect()
      .filter(_ != 99L)
    members.foreach { id =>
      assert(got(id) == exact(id), s"vec $id diverged")
    }
    // the planted outlier still ranks top by lof in BOTH variants
    val topExact = exact.maxBy(_._2(3).asInstanceOf[Long])._1
    val topBucketed = got.maxBy(_._2(3).asInstanceOf[Long])._1
    assert(topExact == 99L && topBucketed == 99L)
  }

  test("lofBucketedTwoLevel at wProbe = C == flat lofBucketed " +
      "bit-for-bit; coarse = fine degenerates to flat too") {
    val (emb, cents) = clustered
    val flat = Similarity.lofBucketed(emb, cents, k = 3, nProbe = 2)
      .collect().toSet
    // wProbe = C (3 coarse cells): every fine centroid is a stage-2
    // candidate -> the probe relation equals the flat prober exactly,
    // so the whole LOF output is bit-identical
    val coarse = cents.select(col("centroid_id") + 100 as "centroid_id",
      col("embedding"))
    val two = Similarity.lofBucketedTwoLevel(emb, coarse, cents,
      k = 3, nProbe = 2, wProbe = 3).collect().toSet
    assert(two == flat)
    // coarse == fine with wProbe=1: each fine centroid is its own
    // parent and stage 1 is the flat argmin -> stage 2 searches the
    // nearest bucket's OWN centroid plus nothing else at nProbe=1
    val self = Similarity.lofBucketedTwoLevel(emb, cents, cents,
      k = 3, nProbe = 1, wProbe = 1).collect().toSet
    val flat1 = Similarity.lofBucketed(emb, cents, k = 3, nProbe = 1)
      .collect().toSet
    assert(self == flat1)
  }

  test("partition invariance; assignment carries the home bucket") {
    val (emb, cents) = clustered
    val a = Similarity.lofBucketed(emb, cents, k = 3, nProbe = 2)
    val b = Similarity.lofBucketed(emb.repartition(7), cents,
      k = 3, nProbe = 2)
    assert(a.collect().toSet == b.collect().toSet)
    // cluster i members are home to centroid i
    val homes = a.select("id", "bucket").as[(Long, Long)].collect().toMap
    Seq(0L, 1L, 2L).foreach { ci =>
      (0 until 5).foreach { j =>
        assert(homes(ci * 10 + j) == ci, s"home of ${ci * 10 + j}")
      }
    }
  }

  test("thin probed buckets: points with fewer than k candidates " +
      "drop (the exact variant's n<k rule)") {
    // two buckets: one with 5 points, one with only 2; k=3, nProbe=1
    val emb = (0 until 5).map(j => (j.toLong, Array(j * 0.125f)))
      .++(Seq((10L, Array(9.0f)), (11L, Array(9.125f))))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0.25f)), (1L, Array(9.0625f)))
      .toDF("centroid_id", "embedding")
    val got = Similarity.lofBucketed(emb, cents, k = 3, nProbe = 1)
      .select("id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L, 3L, 4L)) // 10/11 have 1 candidate each
  }
}
