package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  *  - Brute-force cosine top-k: broadcast the (small) query set against
  *    the corpus — one scan of the corpus, no corpus shuffle, per-query
  *    top-k via window rank. This is the exactness baseline.
  *  - IVF-style bucketed ANN: coarse-quantize every vector to its
  *    nearest centroid (broadcast centroid table), then search only
  *    within the probed buckets. At 100 TB the corpus is scanned once
  *    to assign buckets and written partitioned by bucket; queries then
  *    touch only their probe buckets' partitions.
  *
  * All math is sequential-fold double arithmetic (`aggregate`/
  * `zip_with`) so an external engine reproduces results bit-for-bit.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns in double
    * precision.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector.
    *
    * `queries` must be small (broadcast); `corpus` is scanned once.
    * Rank ties broken by corpus id for determinism.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Assign each vector to its nearest centroid (IVF coarse
    * quantization). `centroids` is broadcast; one corpus scan.
    */
  def assignBuckets(corpus: DataFrame, centroids: DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = centroids.select(col("centroid_id"), col(vecCol).as("cent_vec"))
    val scored = corpus.crossJoin(broadcast(c))
      .withColumn("cos", cosine(col(vecCol), col("cent_vec")))
    val w = Window.partitionBy(col(idCol)).orderBy(desc("cos"), asc("centroid_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id").as("bucket"))
  }

  /** IVF ANN: search only the `nProbe` closest buckets per query.
    * Recall < 1.0 by construction; exactness is checked against
    * `cosineTopK` in the test suite, not the oracle gate.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nProbe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = assignBuckets(corpus, centroids, idCol, vecCol)
    val c = centroids.select(col("centroid_id"), col(vecCol).as("cent_vec"))
    val qProbes = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(c))
      .withColumn("cos_c", cosine(col("q_vec"), col("cent_vec")))
    val wq = Window.partitionBy(col("query_id")).orderBy(desc("cos_c"), asc("centroid_id"))
    val probes = qProbes.withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("centroid_id").as("bucket"))
    val scored = probes.join(bucketed, "bucket")
      .filter(col("query_id") =!= col(idCol))
      .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Per-label centroid: mean embedding by label, emitted flat as
    * (label, dim, value) rows so results stay scalar-typed.
    */
  def labelCentroids(embeddings: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(labelCol), col("dim"))
      .agg(avg(col("v").cast("double")).as("mean_v"), count(lit(1)).as("n"))
}
