package graft

import graft.core.Similarity
import graft.ml.KMeansTrainer
import org.apache.spark.sql.functions._

class KMeansTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated direction blobs in 6-dim. */
  private def blobs = {
    val rng = new scala.util.Random(11)
    val axes = Seq(
      Array(1.0, 0, 0, 0, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0),
      Array(0, 0, 0, 0, 1.0, 0))
    val rows = for (b <- axes.indices; i <- 0 until 30) yield {
      val v = axes(b).map(x => (x * 5 + rng.nextGaussian() * 0.2).toFloat)
      (b.toLong * 100 + i, v, b)
    }
    rng.shuffle(rows).toDF("vec_id", "embedding", "blob")
  }

  test("recovers separated blobs; inertia non-increasing; converges early") {
    val df = blobs
    val model = KMeansTrainer.train(df, k = 3, maxIter = 15)
    assert(model.iterations < 15, "well-separated blobs should converge before maxIter")
    // inertia trace is monotone non-increasing (Lloyd's guarantee)
    model.inertia.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-12, s"inertia rose: ${model.inertia}")
      case _ =>
    }
    // every blob maps to exactly one centroid, and distinct blobs to
    // distinct centroids
    val groups = KMeansTrainer.assign(df, model)
      .join(df.select("vec_id", "blob"), "vec_id")
      .groupBy("blob").agg(collect_set("bucket").as("buckets"))
      .as[(Int, Seq[Long])].collect()
    assert(groups.forall(_._2.size == 1), s"blob split across centroids: ${groups.toSeq}")
    assert(groups.map(_._2.head).distinct.length == 3)
  }

  test("assignment is deterministic and matches crossJoin assignBuckets") {
    val df = blobs
    val model = KMeansTrainer.train(df, k = 3, maxIter = 5)
    val viaLiterals = KMeansTrainer.assign(df, model)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    val centDf = KMeansTrainer.centroidsDf(spark, model)
    val viaCrossJoin = Similarity.assignBuckets(df, centDf)
      .select(col("vec_id"), col("bucket").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(viaLiterals == viaCrossJoin)
  }

  test("trained centroids give IVF recall >= arbitrary-row centroids") {
    val emb = Tables.embeddings(spark, Sf0001)
    val queries = emb.filter($"vec_id" % 50 === 1).limit(8)
    val exact = Similarity.cosineTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    def recall(centroids: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfTopK(queries, emb, centroids, k = 5, nProbe = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val arbitrary = emb.filter($"vec_id" % 97 === 3)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val model = KMeansTrainer.train(emb, k = 6, maxIter = 8)
    val trained = recall(KMeansTrainer.centroidsDf(spark, model))
    val baseline = recall(arbitrary)
    assert(trained >= baseline - 1e-9,
      s"trained-centroid recall $trained < arbitrary-centroid recall $baseline")
    assert(trained >= 0.5, s"trained recall unreasonably low: $trained")
  }

  test("empty clusters keep their centroid; k=1 degenerates to the mean direction") {
    val tiny = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0.1f)), (3L, Array(0.9f, 0f))
    ).toDF("vec_id", "embedding")
    val m1 = KMeansTrainer.train(tiny, k = 1, maxIter = 4)
    assert(m1.centroids.length == 1)
    assert(m1.centroids.head(0) > 0.9) // mean of the x-heavy vectors
    // k larger than natural clusters: training still terminates with k
    // centroids (possibly some untouched empties)
    val m3 = KMeansTrainer.train(tiny, k = 3, maxIter = 4)
    assert(m3.centroids.length == 3)
  }
}
