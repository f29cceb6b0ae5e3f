package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Similarity

/** In-engine spherical k-means (Lloyd's algorithm under cosine
  * similarity) for training IVF coarse quantizers — replaces the
  * "pick arbitrary rows as centroids" stand-in with learned centroids,
  * which directly sets IVF recall per probed bucket.
  *
  * Distribution strategy (the part that matters at 100 TB):
  *
  *  - centroids are TINY (k × dim doubles) and live in the plan as
  *    LITERAL arrays, so assignment is one codegen'd corpus scan — no
  *    crossJoin fan-out, no shuffle of embedding payloads;
  *  - per-iteration sufficient statistics (per-bucket per-dim sums +
  *    counts + residual mass) come back through ONE explode +
  *    map-side-combined aggregation of k × dim rows; the driver only
  *    ever solves/updates k × dim doubles — same shape as
  *    [[ForecastTrainer]]'s distributed Gram accumulation;
  *  - assignment ties break to the smallest centroid id
  *    (struct-ordered `array_max` over (score, -id)), so training is
  *    deterministic for a fixed init regardless of partitioning.
  *
  * Init is deterministic: the k corpus vectors with the smallest
  * `xxhash64(id)` — a seedable pseudo-random draw reproducible across
  * engines and partitionings (k-means++ would need k sequential corpus
  * scans; the hash draw gets the same spread for one TakeOrdered).
  */
object KMeansTrainer {

  /** @param centroids  k × dim (mean vector per cluster, unnormalized —
    *                   cosine assignment is scale-invariant)
    * @param inertia    per-iteration mean residual to the assigned
    *                   centroid — non-increasing over Lloyd iterations
    * @param iterations Lloyd rounds actually run
    * @param cosine     the TRAINING metric, recorded so downstream
    *                   assignment scores with the same geometry the
    *                   quantizer was fit under
    */
  final case class KMeansModel(centroids: Array[Array[Double]],
                               inertia: Seq[Double],
                               iterations: Int,
                               cosine: Boolean = true) {
    def k: Int = centroids.length
  }

  private def centLit(c: Array[Double]): Column = array(c.map(lit): _*)

  /** Per-row (bucket, score) against literal centroids, ties to the
    * smaller centroid id via struct-ordered max over (score, -id).
    *
    * `cosine = true`: score = cosine similarity (spherical k-means).
    * `cosine = false`: score = dot(v,c) − ‖c‖²/2, which is monotone in
    * −‖v−c‖² (argmax ⇔ L2 argmin; the ‖v‖² term is row-constant) — the
    * Euclidean quantizer product quantization needs.
    */
  private def assignment(vecCol: String, cents: Array[Array[Double]],
                         cosine: Boolean = true): Column = {
    val vnorm = Similarity.norm(col(vecCol))
    val scored = cents.indices.map { i =>
      val cn2 = cents(i).map(x => x * x).sum
      val d = Similarity.dot(col(vecCol), centLit(cents(i)))
      val s = if (cosine) d / (vnorm * lit(math.sqrt(cn2)))
              else d - lit(cn2 / 2.0)
      struct(s.as("s"), lit(-i).as("ni"))
    }
    array_max(array(scored: _*))
  }

  def train(emb: DataFrame, k: Int, vecCol: String = "embedding",
            idCol: String = "vec_id", maxIter: Int = 10,
            tol: Double = 1e-6, cosine: Boolean = true): KMeansModel = {
    require(k >= 1, "k must be >= 1")
    import emb.sparkSession.implicits._
    var cents: Array[Array[Double]] = emb
      .select(col(vecCol).cast("array<double>"))
      .orderBy(xxhash64(col(idCol)))
      .limit(k)
      .as[Array[Double]]
      .collect()
    require(cents.length == k, s"corpus has fewer than k=$k vectors")
    val dim = cents.head.length

    val inertiaTrace = scala.collection.mutable.ArrayBuffer.empty[Double]
    var iter = 0
    var shifted = true
    while (iter < maxIter && shifted) {
      // stage 1 (projection): bucket + score per row; stage 2 explodes
      // the vector SEPARATELY so the per-row assignment isn't
      // re-evaluated per dimension above the Generate
      val best = assignment(vecCol, cents, cosine)
      // residual for the trace: cosine → 1−s; L2 → ‖v−c‖² = ‖v‖²−2s
      val resid =
        if (cosine) lit(1.0) - best.getField("s")
        else Similarity.dot(col(vecCol), col(vecCol)) - lit(2.0) * best.getField("s")
      val assigned = emb.select(col(vecCol),
        (-best.getField("ni")).as("bucket"),
        resid.as("resid"))
      // native VectorSum aggregate: map-side combine reduces each
      // partition to <= k whole-vector buffers before the exchange —
      // the shuffle carries k×dim doubles, not rows×dim exploded rows
      // (the posexplode formulation this replaced is VectorSumSpec's
      // parity oracle)
      val stats = assigned
        .groupBy(col("bucket"))
        .agg(Similarity.vectorSum(col(vecCol).cast("array<double>")).as("sv"),
          count(lit(1)).as("n"),
          sum(col("resid")).as("sr"))
        .collect()
      // k × dim sufficient statistics; everything below is driver math
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Long](k)
      var residTotal = 0.0
      stats.foreach { r =>
        val b = r.getAs[Int]("bucket")
        r.getAs[scala.collection.Seq[Double]]("sv").copyToArray(sums(b))
        counts(b) = r.getAs[Long]("n")
        residTotal += r.getAs[Double]("sr")
      }
      val nDocs = counts.sum
      inertiaTrace += residTotal / dim / math.max(nDocs, 1L)
      val next = Array.tabulate(k) { b =>
        if (counts(b) == 0L) cents(b) // empty cluster keeps its centroid
        else sums(b).map(_ / counts(b))
      }
      val maxShift = (0 until k).map { b =>
        math.sqrt(cents(b).zip(next(b)).map { case (a, c) => (a - c) * (a - c) }.sum)
      }.max
      cents = next
      shifted = maxShift > tol
      iter += 1
    }
    KMeansModel(cents, inertiaTrace.toSeq, iter, cosine)
  }

  /** The trained centroids as the (centroid_id, vec) table
    * [[Similarity.ivfTopK]] consumes.
    */
  def centroidsDf(spark: SparkSession, model: KMeansModel,
                  vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq
      .toDF("centroid_id", vecCol)
  }

  /** One-scan bucket assignment against a trained model (the literal-
    * centroid form of [[Similarity.assignBuckets]] — no crossJoin, no
    * window shuffle; at 100 TB this is the map-only pass that writes
    * the corpus partitioned by bucket).
    */
  def assign(emb: DataFrame, model: KMeansModel,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // score with the metric the model was TRAINED under — a cosine
    // assignment over an L2-trained codebook maps same-direction,
    // different-magnitude vectors to the wrong centroid
    val best = assignment(vecCol, model.centroids, model.cosine)
    emb.select(col(idCol), col(vecCol),
      (-best.getField("ni")).cast("long").as("bucket"))
  }
}
