package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): the OTHER standard vector-compression
  * layout next to product quantization — per-dimension uniform
  * [min, max] → one byte, 4× over float32 (64 B/vector at D=64 vs
  * PQ's ~12 B but with far lower distortion), the faiss
  * `ScalarQuantizer(QT_8bit)` shape. At 100 TB the encoded corpus
  * stores codes + one exact norm per row; queries score candidates by
  * decoding codes IN-PLAN (a codegen'd projection over literal
  * per-dim ranges) — raw vectors are never read at serve time.
  *
  *  - Fit: one aggregation computes 2×D column statistics (per-dim
  *    min/max) — bounded model state (2·D doubles on the driver),
  *    the [[graft.ml.KMeansTrainer]] discipline.
  *  - Encode: one codegen'd scan; `code_d = clamp(floor((v_d − mn_d)
  *    · 255 / (mx_d − mn_d) + 0.5))` — every step a correctly-rounded
  *    IEEE operation, so an external engine reproduces codes
  *    bit-for-bit from the same data (no learned state to embed).
  *  - Score (asymmetric, the ADC discipline of
  *    [[ProductQuantizer]]): the query stays full precision; the
  *    corpus side decodes `mn_d + code_d·(mx_d − mn_d)/255` and the
  *    sequential-fold [[Similarity.dot]] runs over the decoded array.
  *    The stored exact norm makes the cosine denominator exact — the
  *    only approximation is quantizing the corpus side of the
  *    numerator, and the quantization error is bounded by half a
  *    cell (`(mx−mn)/510`) per dimension.
  */
object ScalarQuantizer {

  /** Per-dimension ranges; bounded driver state (2·dim doubles). */
  final case class SQModel(mins: Array[Double], maxs: Array[Double]) {
    def dim: Int = mins.length
  }

  /** One scan, 2·dim codegen'd aggregates. Mins/maxs of the float
    * column cast to double are exact, so an external engine fitting
    * over the same rows lands on identical model values. Fails fast
    * (with the offending dimension) on an empty input or an all-null
    * dimension — a silent NULL range would otherwise surface later as
    * an NPE or as garbage codes.
    */
  def fit(emb: DataFrame, dim: Int = 64, vecCol: String = "embedding"): SQModel = {
    val aggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(col(vecCol), d + 1).cast("double")).as(s"__mn_$d"),
        max(element_at(col(vecCol), d + 1).cast("double")).as(s"__mx_$d"))
    }
    val row = emb.agg(aggs.head, aggs.tail: _*).head()
    (0 until dim).foreach { d =>
      require(!row.isNullAt(2 * d) && !row.isNullAt(2 * d + 1),
        s"SQ fit: dimension $d has no non-null values " +
          "(empty input or all-null dimension)")
    }
    SQModel(
      Array.tabulate(dim)(d => row.getDouble(2 * d)),
      Array.tabulate(dim)(d => row.getDouble(2 * d + 1)))
  }

  private def codeExpr(v: Column, mn: Double, mx: Double): Column =
    if (mx == mn) lit(0)
    else least(greatest(
      floor(((v - lit(mn)) * lit(255.0)) / lit(mx - mn) + lit(0.5)).cast("long"),
      lit(0L)), lit(255L)).cast("int")

  /** Encode to (idCol, codes array<int> in [0,255], norm) — the
    * serving layout. The exact norm is computed HERE, from the raw
    * vector, because the decoded norm is lossy and the cosine
    * denominator should not be.
    */
  def encode(emb: DataFrame, model: SQModel,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val codes = array((0 until model.dim).map { d =>
      codeExpr(element_at(v, d + 1).cast("double"), model.mins(d), model.maxs(d))
    }: _*)
    emb.select(col(idCol), codes.as("codes"),
      Similarity.norm(v).as("norm"))
  }

  /** Decoded (lossy) vector as an in-plan projection over `codes` —
    * per-dim range literals, no model broadcast needed.
    */
  def decodeExpr(codes: Column, model: SQModel): Column =
    array((0 until model.dim).map { d =>
      val mn = model.mins(d); val mx = model.maxs(d)
      lit(mn) + (element_at(codes, d + 1).cast("double") * lit(mx - mn)) / lit(255.0)
    }: _*)

  /** Asymmetric top-k over the encoded corpus: full-precision queries
    * broadcast against one scan of (codes, norm) rows; cosine =
    * seq-fold dot(query, decoded) / (exact q-norm · stored c-norm).
    * Rank ties break on neighbor id. Zero-norm rows (on either side)
    * have no defined cosine — they are filtered out rather than
    * emitting NaN scores that would rank nondeterministically.
    */
  def adcTopK(queries: DataFrame, encoded: DataFrame, model: SQModel, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      Similarity.norm(col(vecCol)).as("q_n"))
      .filter(col("q_n") > 0.0)
    val scored = encoded
      .select(col(idCol).as("neighbor_id"),
        decodeExpr(col("codes"), model).as("dec"), col("norm"))
      .filter(col("norm") > 0.0)
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        Similarity.dot(col("q_vec"), col("dec")) / (col("q_n") * col("norm")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}
