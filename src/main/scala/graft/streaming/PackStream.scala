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
    *
    * Per-batch driver work is TWO actions regardless of table size:
    * the single state-recovery aggregate ([[recoverState]] — confined
    * to the last commit's files in steady state) and the idempotent
    * append itself. The sequence cut is computed in-plan from a
    * broadcast one-row total, not with a count action, and every
    * per-batch cache (the union of positioned tokens, the prefix-sum
    * intermediate inside [[Packing.offsetsByReleasable]]) is released
    * before returning — a long-running stream holds no cached blocks
    * between batches.
    */
  def packBatch(batch: DataFrame, table: String, seqLen: Int,
                batchId: Long, idCol: String = "doc_id"): Unit = {
    val spark = batch.sparkSession
    // replay probe: the whole batch landed (or not) as one commit
    val already = SnapshotTable.currentVersion(table).exists(v =>
      SnapshotTable.txnVersions(table, v).get(Writer).exists(_ >= batchId))
    if (already) return

    val (tailToks, nOpen, nextSeq) = recoverState(spark, table, batchId)

    val counted = batch.select(col(idCol).cast("long").as("doc_id"),
      col("piece_ids"), size(col("piece_ids")).cast("long").as("n_tokens"))
    val (offs, releaseOffs) = Packing.offsetsByReleasable(
      counted.select(col("doc_id"), col("n_tokens")), "doc_id")
    val batchToks = counted.join(offs, Seq("doc_id"))
      .select(col("doc_id"), col("tok_start"),
        posexplode(col("piece_ids")).as(Seq("i", "token_id")))
      .select(col("doc_id"),
        (lit(nOpen) + col("tok_start") + col("i")).as("pos"), col("token_id"))

    // every positioned token of this batch (carried tail + new),
    // persisted: the total, the sequence branch, and the tail branch
    // each scan it once inside the SINGLE append action
    val all = tailToks.select("pos", "token_id", "doc_id")
      .unionByName(batchToks.select("pos", "token_id", "doc_id"))
      .persist()
    // pos is dense 0..n-1, so the token total is max(pos)+1 — derived
    // in-plan via a broadcast one-row frame instead of a driver count
    val tot = all.agg((coalesce(max(col("pos")), lit(-1L)) + 1L).as("_total"))
    val withCut = all.crossJoin(broadcast(tot))
      .withColumn("_cut", (col("_total") / seqLen).cast("long") * lit(seqLen.toLong))

    val seqs = withCut.filter(col("pos") < col("_cut"))
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

    // the new tail: one bounded row (< seqLen tokens), re-based to 0.
    // Conditional aggregates over the UNfiltered token set so the row
    // exists even when the tail is empty; its seq_id field carries the
    // NEXT sequence id, which is what lets recovery read one row
    // instead of aggregating every seq row ever written.
    val tailStruct = when(col("pos") >= col("_cut"),
      struct(col("pos"), col("token_id"), col("doc_id")))
    val tail = withCut
      .agg(
        coalesce(sum(when(col("pos") >= col("_cut"), 1L)), lit(0L))
          .as("n_tokens"),
        countDistinct(when(col("pos") >= col("_cut"), col("doc_id")))
          .as("n_docs"),
        transform(array_sort(collect_list(tailStruct)),
          s => s.getField("token_id")).as("token_ids"),
        transform(array_sort(collect_list(tailStruct)),
          s => s.getField("doc_id")).as("doc_ids"),
        first(col("_cut")).as("_cutv"))
      .select(
        (lit(nextSeq) +
          coalesce((col("_cutv") / seqLen).cast("long"), lit(0L)))
          .as("seq_id"),
        lit("tail").as("kind"), lit(batchId).as("batch_id"),
        col("n_docs"), col("n_tokens"), col("token_ids"), col("doc_ids"))

    try SnapshotTable.appendIdempotent(seqs.unionByName(tail), table,
      Writer, batchId)
    finally { all.unpersist(); releaseOffs() }
    ()
  }

  /** State recovery for [[packBatch]]: (carried tail tokens as (pos,
    * token_id, doc_id) rows, open-token count, next sequence id) in
    * ONE driver action.
    *
    * The latest tail row carries the seq high-water mark in its
    * `seq_id` field, and `batch_id` file stats confine the read to the
    * last commit's files when batch ids are contiguous (the
    * foreachBatch contract) — so steady-state recovery is O(one
    * commit), not O(table). A table whose pruned slice has no
    * usable tail (fresh checkpoint with non-contiguous ids, or a tail
    * written before the high-water field existed) falls back to the
    * same single aggregate over the full table, where max(seq_id)
    * over the seq rows recovers the high-water mark.
    */
  private def recoverState(spark: SparkSession, table: String,
                           batchId: Long): (DataFrame, Long, Long) = {
    if (SnapshotTable.currentVersion(table).isEmpty)
      return (emptyTail(spark), 0L, 0L)

    def stateOf(t: DataFrame): org.apache.spark.sql.Row =
      t.agg(
        max(when(col("kind") === "seq", col("seq_id"))).as("hi_seq"),
        max_by(
          struct(col("n_tokens"), col("token_ids"), col("doc_ids"),
            col("seq_id")),
          when(col("kind") === "tail", col("batch_id"))).as("tl"))
        .collect()(0)

    val pruned = stateOf(SnapshotTable.read(spark, table,
      prune = Seq(SnapshotTable.ColRange("batch_id",
        lower = Some(batchId - 1)))))
    val st =
      if (!pruned.isNullAt(1) && !pruned.getStruct(1).isNullAt(3)) pruned
      else stateOf(SnapshotTable.read(spark, table))

    val hiSeq = if (st.isNullAt(0)) None else Some(st.getLong(0))
    val tl = if (st.isNullAt(1)) None else Some(st.getStruct(1))
    val (toks, nOpen) = tl match {
      case Some(r) if !r.isNullAt(1) && r.getLong(0) > 0 =>
        val ids = r.getSeq[Long](1)
        val docs = r.getSeq[Long](2)
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(
            ids.indices.map(i => (i.toLong, ids(i), docs(i))), 1))
          .toDF("pos", "token_id", "doc_id")
        (df, r.getLong(0))
      case _ => (emptyTail(spark), 0L)
    }
    val nextSeq = tl.filter(r => !r.isNullAt(3)).map(_.getLong(3))
      .getOrElse(hiSeq.map(_ + 1L).getOrElse(0L))
    (toks, nOpen, nextSeq)
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
