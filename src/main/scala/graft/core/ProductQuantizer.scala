package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ml.KMeansTrainer

/** Product quantization (Jégou, Douze, Schmid: "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — THE storage story for
  * vector search at 100 TB: a D-dim float corpus (256 B/vector at
  * D=64) compresses to `m` one-byte codes + one stored norm
  * (~12 B/vector, ~20×), and queries score candidates from an m×ks
  * lookup table instead of touching raw vectors.
  *
  *  - Train: an independent L2 k-means codebook per subspace
  *    ([[KMeansTrainer]] with `cosine = false`), each a handful of
  *    corpus scans over ONE subvector slice. At real scale, train on a
  *    sampled frame — codebooks are data statistics, not per-row state.
  *  - Encode: one codegen'd scan; per subspace the argmin-‖·‖² code
  *    via the same literal-centroid struct-max trick as the trainer.
  *    Codes live in the plan as a plain `array<int>` column.
  *  - Score (ADC, asymmetric distance computation): per query, build
  *    the m×ks table of exact `dot(q_j, c_{j,r})` sub-products; a
  *    candidate's approximate dot product is the sum of m table
  *    lookups. The stored exact norm makes the cosine denominator
  *    exact, so the only approximation is quantizing the CORPUS side
  *    of the numerator.
  *
  * The deterministic [[hashCodebooks]] variant (pseudo-random
  * codewords derived from [[Similarity.planeComponent]]'s avalanche
  * hash) exists so the ENCODE stage is reproducible by an external
  * engine from literals alone — the same oracle-the-deterministic-
  * prefix discipline as LSH's q50.
  */
object ProductQuantizer {

  /** @param codebooks m × ks × subDim codewords */
  final case class PQModel(m: Int, subDim: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    def ks: Int = codebooks.head.length
    def dim: Int = m * subDim
  }

  /** 1-based slice of subspace `j` (0-based) out of a vector column. */
  private def sub(vecCol: Column, j: Int, subDim: Int): Column =
    slice(vecCol, j * subDim + 1, subDim)

  /** Train m independent L2 codebooks of `ks` codewords each. */
  def train(emb: DataFrame, m: Int, ks: Int,
            vecCol: String = "embedding", idCol: String = "vec_id",
            dim: Int = 64, maxIter: Int = 8): PQModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val books = (0 until m).map { j =>
      val subDf = emb.select(col(idCol), sub(col(vecCol), j, subDim).as(vecCol))
      KMeansTrainer.train(subDf, ks, vecCol, idCol, maxIter, cosine = false).centroids
    }.toArray
    PQModel(m, subDim, books)
  }

  /** Deterministic data-independent codebooks from the avalanche hash —
    * no training pass, reproducible from literals by any engine (the
    * oracle-able encode path; recall is what it is, the point is a
    * bit-exact encode stage).
    */
  def hashCodebooks(m: Int, ks: Int, subDim: Int): PQModel = {
    val books = Array.tabulate(m, ks, subDim) { (j, r, d) =>
      Similarity.planeComponent(j * ks + r, d)
    }
    PQModel(m, subDim, books)
  }

  private def centLit(c: Array[Double]): Column = array(c.map(lit): _*)

  /** Native lookup-sum ([[graft.expressions.AdcScore]]); [[adcScoreHof]]
    * is the built-ins-only formulation kept as its semantic oracle.
    */
  def adcScore(codes: Column, lut: Column): Column =
    org.apache.spark.sql.GraftShim.column(graft.expressions.AdcScore(
      org.apache.spark.sql.GraftShim.expression(codes),
      org.apache.spark.sql.GraftShim.expression(lut)))

  /** HOF formulation of [[adcScore]] — identical semantics, interpreted
    * per-element execution (test oracle only).
    */
  def adcScoreHof(codes: Column, lut: Column): Column =
    aggregate(
      zip_with(codes, lut, (code, row) => element_at(row, code + 1)),
      lit(0.0), (acc, v) => acc + v)

  /** The argmin-‖v_j − c‖² code for subspace j, ties to the smaller
    * code: struct-ordered max over (dot − ‖c‖²/2, −code).
    */
  private def codeFor(vecCol: Column, model: PQModel, j: Int): Column = {
    val s = sub(vecCol, j, model.subDim)
    val scored = model.codebooks(j).zipWithIndex.map { case (c, r) =>
      struct(
        (Similarity.dot(s, centLit(c)) - lit(c.map(x => x * x).sum / 2.0)).as("s"),
        lit(-r).as("nr"))
    }
    -array_max(array(scored.toIndexedSeq: _*)).getField("nr")
  }

  /** One-scan PQ encoding: (id, codes array<int> of length m, vnorm).
    * The norm is stored EXACTLY so ADC cosine only approximates the
    * numerator.
    */
  def encode(emb: DataFrame, model: PQModel,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol),
      array((0 until model.m).map(j => codeFor(col(vecCol), model, j)): _*).as("codes"),
      Similarity.norm(col(vecCol)).as("vnorm"))

  /** Flat (id, subspace, code) form of [[encode]] — scalar-typed for
    * the driver oracle gate.
    */
  def encodeFlat(emb: DataFrame, model: PQModel,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    encode(emb, model, idCol, vecCol)
      .select(col(idCol), posexplode(col("codes")).as(Seq("subspace", "code")))
      .select(col(idCol), col("subspace").cast("long").as("subspace"),
        col("code").cast("long").as("code"))

  /** ADC top-k: approximate cosine = (Σ_j LUT_j[code_j]) /
    * (‖q‖ · vnorm). Queries must be small (broadcast); the encoded
    * corpus is scanned once — scoring touches m ints + one double per
    * candidate, never the raw vectors.
    */
  def adcTopK(queries: DataFrame, encoded: DataFrame, model: PQModel, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // per query: the m×ks sub-product lookup table, exact on the query
    // side; literal codebooks keep this one codegen'd projection
    val lut = array((0 until model.m).map { j =>
      array(model.codebooks(j).map(c =>
        Similarity.dot(sub(col(vecCol), j, model.subDim), centLit(c))).toIndexedSeq: _*)
    }: _*)
    val q = queries.select(col(idCol).as("query_id"), lut.as("lut"),
      Similarity.norm(col(vecCol)).as("q_n"))
    val scored = encoded.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col(idCol))
      .withColumn("adc", adcScore(col("codes"), col("lut")))
      .withColumn("cos_approx", col("adc") / (col("q_n") * col("vnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_approx"), asc(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"),
        round(col("cos_approx"), 6).as("cos_approx"))
  }

  /** IVF + PQ serving composition (IVFADC, Jégou et al. TPAMI 2011 —
    * the standard billion-scale ANN layout): coarse-quantize the
    * corpus to `centroids` buckets, PQ-encode every vector, then
    * answer queries by probing the `nProbe` nearest buckets and
    * ADC-ranking ONLY the probed candidates. Candidate scoring
    * touches m small ints + one stored norm per row — never a raw
    * vector — and bucket pruning cuts the candidate set before any
    * scoring happens. At 100 TB the encoded table is written
    * partitioned by bucket ([[Similarity.writeIvfIndex]]'s layout with
    * codes instead of vectors), so a probe reads O(probed partitions).
    *
    * Deterministic end-to-end for fixed centroids + codebooks — the
    * q87 gate oracle replays assignment, probing, encoding, and ADC
    * ranking relationally.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                model: PQModel, k: Int, nProbe: Int = 2,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = Similarity.assignBuckets(corpus, centroids, idCol, vecCol)
    // the serving index: (id, codes, vnorm, bucket) — one scan
    val enc = bucketed.select(col(idCol),
      array((0 until model.m).map(j => codeFor(col(vecCol), model, j)): _*).as("codes"),
      Similarity.norm(col(vecCol)).as("vnorm"), col("bucket"))
    val c = centroids.select(col("centroid_id"), col(vecCol).as("cent_vec"))
    val qProbes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(c))
      .withColumn("cos_c", Similarity.cosine(col("q_vec"), col("cent_vec")))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_c"), asc("centroid_id"))
    val probes = qProbes.withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= nProbe)
      .select(col("query_id"), col("centroid_id").as("bucket"))
    val lut = array((0 until model.m).map { j =>
      array(model.codebooks(j).map(cb =>
        Similarity.dot(sub(col(vecCol), j, model.subDim), centLit(cb))).toIndexedSeq: _*)
    }: _*)
    val q = queries.select(col(idCol).as("query_id"), lut.as("lut"),
      Similarity.norm(col(vecCol)).as("q_n"))
    val scored = probes.join(enc, "bucket")
      .filter(col("query_id") =!= col(idCol))
      .join(broadcast(q), "query_id")
      .withColumn("cos_approx",
        adcScore(col("codes"), col("lut")) / (col("q_n") * col("vnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_approx"), asc(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"),
        round(col("cos_approx"), 6).as("cos_approx"))
  }

  /** Reconstruction (decode) of the codes back to a vector — test/
    * diagnostics surface for quantization error.
    */
  def decode(encoded: DataFrame, model: PQModel,
             idCol: String = "vec_id"): DataFrame = {
    val parts = (0 until model.m).map { j =>
      val rows = model.codebooks(j).map(centLit)
      element_at(array(rows.toIndexedSeq: _*), element_at(col("codes"), j + 1) + 1)
    }
    encoded.select(col(idCol), concat(parts: _*).as("decoded"))
  }
}
