package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Packing
import graft.sources.SnapshotTable

/** Continuous sequence packing — the streaming face of the q80
  * flagship's final stage: encoded documents arrive in micro-batches
  * and fixed-length token-id training sequences come out, numbered
  * contiguously across batches, with the open partial sequence (the
  * "tail") carried BETWEEN batches as table state.
  *
  * Design:
  *  - State lives in the SAME snapshot table as the output: `seq`
  *    rows are finished sequences, the single latest `tail` row is
  *    the open remainder (token ids + owning doc ids, in order).
  *    No executor state store — restart-safe, inspectable, and batch
  *    consumers read the identical table.
  *  - Each micro-batch commits sequences AND its new tail in ONE
  *    idempotent append ([[SnapshotTable.appendIdempotent]] keyed by
  *    batch id), so a replayed batch — Structured Streaming's crash
  *    contract — is a FULL no-op: exactly-once without a two-table
  *    coordination problem.
  *  - Within a batch the placement is [[Packing.offsetsBy]]'s
  *    two-phase distributed prefix sum; only (id, pos) pairs and the
  *    token ids that complete sequences shuffle. The tail is at most
  *    seqLen-1 tokens — one bounded row, never a driver loop.
  *
  * Fed doc-id-ordered batches, the emitted sequences are IDENTICAL to
  * the batch [[Packing.packIdSequences]] over the concatenated corpus,
  * with ONE semantic delta: the batch form emits its trailing partial
  * sequence, the stream holds it as the tail (more data may still
  * arrive). PackStreamSpec pins both, which makes the streaming form
  * a drop-in continuation of a batch bootstrap: pack the historical
  * corpus in batch, then stream the daily increment into the same
  * table.
  */
object PackStream {

  val Writer = "pack-stream"

  private def emptyTail(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("pos"), col("id").as("token_id"),
      col("id").as("doc_id"))

  /** Pack one micro-batch of encoded docs (idCol, piece_ids) into
    * `table`. Call from `foreachBatch`; `batchId` must be the stream's
    * monotone batch id.
    */
  def packBatch(batch: DataFrame, table: String, seqLen: Int,
                batchId: Long, idCol: String = "doc_id"): Unit = {
    val spark = batch.sparkSession
    // replay probe: the whole batch landed (or not) as one commit
    val already = SnapshotTable.currentVersion(table).exists(v =>
      SnapshotTable.txnVersions(table, v).get(Writer).exists(_ >= batchId))
    if (already) return

    val existing = SnapshotTable.currentVersion(table)
      .map(_ => SnapshotTable.read(spark, table))
    // prior state: latest tail row -> (pos, token_id, doc_id) + count;
    // seq high-water mark. Three bounded scalar reads, never row data.
    val (tailToks, nOpen, nextSeq) = existing match {
      case None => (emptyTail(spark), 0L, 0L)
      case Some(t) =>
        val tailRow = t.filter(col("kind") === "tail")
          .orderBy(col("batch_id").desc).limit(1)
          .select(col("token_ids"), col("doc_ids"), col("n_tokens"))
          .collect()
        val (toks, n) = tailRow.headOption match {
          case Some(r) if !r.isNullAt(0) =>
            val ids = r.getSeq[Long](0)
            val docs = r.getSeq[Long](1)
            val df = spark.createDataFrame(
              spark.sparkContext.parallelize(
                ids.indices.map(i => (i.toLong, ids(i), docs(i))), 1))
              .toDF("pos", "token_id", "doc_id")
            (df, r.getLong(2))
          case _ => (emptyTail(spark), 0L)
        }
        val hi = t.filter(col("kind") === "seq")
          .agg(max(col("seq_id"))).collect()(0)
        (toks, n, if (hi.isNullAt(0)) 0L else hi.getLong(0) + 1L)
    }

    val counted = batch.select(col(idCol).cast("long").as("doc_id"),
      col("piece_ids"), size(col("piece_ids")).cast("long").as("n_tokens"))
    val nBatch = counted.agg(coalesce(sum("n_tokens"), lit(0L)))
      .collect()(0).getLong(0)
    val offs = Packing.offsetsBy(
      counted.select(col("doc_id"), col("n_tokens")), "doc_id")
    val batchToks = counted.join(offs, Seq("doc_id"))
      .select(col("doc_id"), col("tok_start"),
        posexplode(col("piece_ids")).as(Seq("i", "token_id")))
      .select(col("doc_id"),
        (lit(nOpen) + col("tok_start") + col("i")).as("pos"), col("token_id"))

    val all = tailToks.select("pos", "token_id", "doc_id")
      .unionByName(batchToks.select("pos", "token_id", "doc_id"))
    val fullSeqs = (nOpen + nBatch) / seqLen
    val cut = fullSeqs * seqLen

    val seqs = all.filter(col("pos") < cut)
      .withColumn("sl", (col("pos") / seqLen).cast("long"))
      .groupBy(col("sl"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        transform(array_sort(collect_list(struct(col("pos"), col("token_id")))),
          s => s.getField("token_id")).as("token_ids"))
      .select((lit(nextSeq) + col("sl")).as("seq_id"),
        lit("seq").as("kind"), lit(batchId).as("batch_id"),
        col("n_docs"), col("n_tokens"), col("token_ids"),
        lit(null).cast("array<bigint>").as("doc_ids"))

    // the new tail: one bounded row (< seqLen tokens), re-based to 0
    val tail = all.filter(col("pos") >= cut)
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(countDistinct(col("doc_id")), lit(0L)).as("n_docs"),
        transform(array_sort(collect_list(
            struct(col("pos"), col("token_id"), col("doc_id")))),
          s => s.getField("token_id")).as("token_ids"),
        transform(array_sort(collect_list(
            struct(col("pos"), col("token_id"), col("doc_id")))),
          s => s.getField("doc_id")).as("doc_ids"))
      .select(lit(null).cast("bigint").as("seq_id"),
        lit("tail").as("kind"), lit(batchId).as("batch_id"),
        col("n_docs"), col("n_tokens"), col("token_ids"), col("doc_ids"))

    SnapshotTable.appendIdempotent(seqs.unionByName(tail), table,
      Writer, batchId)
    ()
  }

  /** The packed training sequences committed so far. */
  def sequences(spark: SparkSession, table: String): DataFrame =
    SnapshotTable.read(spark, table).filter(col("kind") === "seq")
      .select(col("seq_id"), col("n_docs"), col("n_tokens"), col("token_ids"))

  /** The current open tail (latest `tail` row). */
  def tail(spark: SparkSession, table: String): DataFrame =
    SnapshotTable.read(spark, table).filter(col("kind") === "tail")
      .orderBy(col("batch_id").desc).limit(1)
      .select(col("n_docs"), col("n_tokens"), col("token_ids"), col("doc_ids"))
}
