package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step that turns a curated corpus into
  * fixed-length training sequences: concatenate every document's
  * tokens in a deterministic order and chop the stream into
  * `seqLen`-token windows (the "concatenate and chunk" regime of
  * GPT-style pretraining; documents may span window boundaries, and a
  * window may hold many short documents).
  *
  * The load-bearing primitive is a GLOBAL token prefix sum in id
  * order. A naive `Window.orderBy(id)` computes it on ONE partition —
  * the canonical driver-bottleneck anti-pattern. This implementation
  * is the classic two-phase distributed prefix sum, fully
  * declarative:
  *
  *   1. range-partition by id (contiguous id ranges per partition —
  *      AQE may coalesce, but only ADJACENT ranges, so contiguity
  *      survives);
  *   2. partition-local running sums (window keyed on the range
  *      partition id — the shuffle carries only (id, n_tokens));
  *   3. per-partition totals (one tiny P-row aggregate) turned into
  *      partition prefix offsets by a P-row window — the only
  *      single-partition step, over ≤ a few thousand rows at any
  *      scale — broadcast-joined back.
  *
  * Every downstream shape is embarrassingly parallel: a doc spanning
  * token interval [s, e) lands in sequences s/L .. (e-1)/L via
  * sequence+explode (fan-out = ceil(doc_len/L) + 1 rows max), and
  * window assembly is one hash aggregation on seq_id.
  *
  * Reference anchor: the reference pipeline's transform stage emits
  * row-shaped JSON for consumers (`/root/reference/process_etl.py`);
  * packing is the corpus-scale analogue of that "reshape for the
  * downstream consumer" step for LM training.
  */
object Packing {

  /** Per-document token interval [tok_start, tok_end) in the global
    * id-ordered token stream. Zero-token docs cannot occur under
    * whitespace tokenization (an empty text still yields one empty
    * token — same convention as DuckDB's regexp_split_to_array, which
    * keeps the oracle exact); callers filtering tokens upstream get
    * correct intervals regardless.
    */
  def tokenOffsets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    offsetsBy(df.select(col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens")),
      idCol)

  /** The prefix sum over an arbitrary non-negative integer cost
    * column named `n_tokens` — whitespace tokens are ONE cost model;
    * packing by characters (embedding-model chunking), bytes, or
    * learned-tokenizer piece counts ([[Bpe.encode]]'s `n_pieces`) is
    * the same placement problem with a different weight.
    */
  def offsetsBy(counted: DataFrame, idCol: String): DataFrame =
    offsetsByReleasable(counted, idCol)._1

  /** [[offsetsBy]] plus a release handle for its internal persist —
    * the (id, count, pid) cache must live until the caller's plans
    * over the offsets have MATERIALIZED, which a one-shot batch job
    * does implicitly at action time but a long-running caller (a
    * foreachBatch loop — [[graft.streaming.PackStream]]) must end
    * explicitly, or cached blocks accumulate without bound across
    * batches. Same contract as [[Curation.StageCaches]].
    */
  def offsetsByReleasable(counted: DataFrame,
                          idCol: String): (DataFrame, () => Unit) =
    offsetsOrderedReleasable(counted, idCol, Seq(col(idCol)))

  /** The same two-phase prefix sum under an ARBITRARY total order
    * (`order` must be total — include the id as the last key):
    * placement by priority instead of id, the primitive under
    * budget-capped selection ([[Sampling.tokenBudgetSelect]]).
    */
  def offsetsOrderedReleasable(counted: DataFrame, idCol: String,
                               order: Seq[Column]): (DataFrame, () => Unit) = {
    val ranged = counted.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
    // PERSIST: the per-partition totals below must see the SAME _pid
    // assignment as this branch. Without it, Catalyst builds a second
    // scan + range exchange for the totals branch, which (a) doubles
    // the corpus scan and (b) only agrees on partition boundaries
    // because range-boundary sampling happens to be deterministic —
    // a coincidence this function must not lean on. The cached rows
    // are (id, count, pid) — three words per doc.
    val local = ranged.withColumn("_local_end",
      sum("n_tokens").over(
        Window.partitionBy("_pid").orderBy(order: _*)))
      .persist()
    val prefixes = local.groupBy("_pid")
      .agg(sum("n_tokens").as("_ptotal"))
      .withColumn("_offset",
        coalesce(sum("_ptotal").over(
          Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_offset"))
    // pass through every caller column (offsetsBy's counted is
    // (id, n_tokens) → the classic 4-column shape; ordered callers
    // keep their priority columns alongside the offsets)
    val out = local.join(broadcast(prefixes), Seq("_pid"))
      .select(counted.columns.map(col) ++ Seq(
        (col("_local_end") + col("_offset") - col("n_tokens")).as("tok_start"),
        (col("_local_end") + col("_offset")).as("tok_end")): _*)
    (out, () => { local.unpersist(); () })
  }

  /** Two-phase distributed RANK + inclusive running weight sum under
    * an arbitrary total order, in ONE range-partitioned pass: `rank` =
    * global 1-based position, `cum` = Σ weight through this row. The
    * frequency-curve primitive (vocab coverage, cumulative-share
    * tables): the naive formulation is an unpartitioned row_number +
    * running-sum window — a single-partition sort of the WHOLE table,
    * vocab-sized at web scale — which this replaces with per-partition
    * locals plus a broadcast of per-partition (count, total) prefixes,
    * the [[offsetsOrderedReleasable]] machinery with a second
    * accumulator riding the same exchange. `order` must be total
    * (include a unique key last). Output: caller columns + (rank, cum)
    * BIGINT; release contract as [[offsetsByReleasable]].
    */
  def rankAndCumOrderedReleasable(counted: DataFrame, weightCol: String,
                                  order: Seq[Column]): (DataFrame, () => Unit) = {
    val ranged = counted.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy("_pid").orderBy(order: _*)
    // persist for the same reason offsetsOrderedReleasable does: the
    // totals branch must see the SAME _pid assignment
    val local = ranged
      .withColumn("_local_rank", row_number().over(w).cast("long"))
      .withColumn("_local_cum", sum(col(weightCol)).over(w))
      .persist()
    val before = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = local.groupBy("_pid")
      .agg(count(lit(1)).as("_pn"), sum(col(weightCol)).as("_pw"))
      .withColumn("_rank_off", coalesce(sum("_pn").over(before), lit(0L)))
      .withColumn("_cum_off", coalesce(sum("_pw").over(before), lit(0L)))
      .select(col("_pid"), col("_rank_off"), col("_cum_off"))
    val out = local.join(broadcast(prefixes), Seq("_pid"))
      .select(counted.columns.map(col) ++ Seq(
        (col("_local_rank") + col("_rank_off")).as("rank"),
        (col("_local_cum") + col("_cum_off")).as("cum")): _*)
    (out, () => { local.unpersist(); () })
  }

  /** The packing MAP — which documents contribute which token slices
    * to which sequence. One row per (doc, sequence) intersection:
    * `seq_off` (where in the sequence the slice starts), `doc_off`
    * (where in the doc it starts), `n_toks` (slice length). This is
    * the scale-path artifact: it never materializes text, shuffles
    * only offsets, and is what a 100 TB run persists so that workers
    * can assemble their own shards.
    */
  def packCompositions(df: DataFrame, idCol: String, textCol: String,
                       seqLen: Int): DataFrame =
    compositionsFrom(tokenOffsets(df, idCol, textCol), idCol, seqLen)

  /** Composition map under any cost model: `counted` must carry
    * (idCol, n_tokens ≥ 0). Same slicing math, weight-agnostic.
    */
  def packCompositionsBy(counted: DataFrame, idCol: String,
                         seqLen: Int): DataFrame =
    compositionsFrom(offsetsBy(counted, idCol), idCol, seqLen)

  private def compositionsFrom(offsets: DataFrame, idCol: String,
                               seqLen: Int): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val L = lit(seqLen.toLong)
    offsets
      .filter(col("n_tokens") > 0)
      .withColumn("seq_id", explode(sequence(
        (col("tok_start") / L).cast("long"),
        ((col("tok_end") - 1) / L).cast("long"))))
      .select(col(idCol), col("seq_id"),
        (greatest(col("tok_start"), col("seq_id") * L) - col("seq_id") * L)
          .as("seq_off"),
        greatest(col("seq_id") * L - col("tok_start"), lit(0L)).as("doc_off"),
        (least(col("tok_end"), (col("seq_id") + 1) * L)
          - greatest(col("tok_start"), col("seq_id") * L)).as("n_toks"))
  }

  /** Per-sequence document-BOUNDARY map — the sidecar a trainer needs
    * next to the packed token arrays to build block-diagonal attention
    * masks (and to trace any training token back to its source doc):
    * for each sequence, the in-order list of (start offset, doc id,
    * slice length) encoded as a canonical `off:doc:len;...` string
    * (engine-portable, hash-stable — no struct-array comparison
    * semantics to trip on).
    *
    * Scale shape: ONE aggregation over the composition map (offsets
    * only, text never moves); per-sequence state is bounded by
    * seqLen slices (every slice holds ≥ 1 token), so the collect_list
    * cannot blow up on any input.
    */
  def packBoundaries(df: DataFrame, idCol: String, textCol: String,
                     seqLen: Int): DataFrame =
    packCompositions(df, idCol, textCol, seqLen)
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(
              col("seq_off"), col(idCol).as("d"), col("n_toks").as("t")))),
            x => concat_ws(":", x.getField("seq_off"), x.getField("d"),
              x.getField("t"))),
          ";").as("bounds"))
      .select(col("seq_id"), col("n_docs"), col("n_tokens"), col("bounds"))

  /** Materialize packed sequences as TRAINING SHARDS: range-cluster
    * on seq_id into `shards` contiguous slices and commit to a
    * transactional snapshot table. Because each file then carries a
    * tight seq_id min/max in the manifest, a trainer fetching shard k
    * (a seq_id range) opens O(its files) — the same stats-pruning
    * contract every other snapshot consumer gets, plus time travel
    * and idempotent re-writes for free. This closes the
    * corpus→sequences→shards loop inside the engine.
    *
    * @return committed snapshot version
    */
  def writeShards(seqs: DataFrame, table: String, shards: Int): Int = {
    require(shards >= 1, "shards must be >= 1")
    val clustered = seqs
      .repartitionByRange(shards, col("seq_id"))
      .sortWithinPartitions("seq_id")
    graft.sources.SnapshotTable.append(clustered, table)
  }

  /** Assembled TOKEN-ID sequences — the artifact a trainer actually
    * consumes: feed [[Bpe.encodeIds]] output (idCol, piece_ids,
    * n_pieces) and get back (seq_id, n_docs, n_tokens, token_ids)
    * fixed-length id arrays, documents split across boundaries
    * exactly as the composition map dictates. Same shapes as the text
    * path: placement never moves ids, ids move once for the final
    * seq-keyed aggregation.
    */
  def packIdSequences(encoded: DataFrame, idCol: String,
                      seqLen: Int): DataFrame = {
    val comp = packCompositionsBy(
      encoded.select(col(idCol), col("n_pieces").as("n_tokens")),
      idCol, seqLen)
    comp.join(encoded.select(col(idCol), col("piece_ids")), Seq(idCol))
      .select(col("seq_id"), col("seq_off"),
        slice(col("piece_ids"), (col("doc_off") + 1).cast("int"),
          col("n_toks").cast("int")).as("ids"),
        col("n_toks"))
      .groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(col("seq_off"), col("ids")))),
          s => s.getField("ids"))).as("token_ids"))
  }

  /** [[packIdSequences]] with a MATERIALIZED encode boundary: write
    * `encoded` once to a SnapshotTable at `table`, then pack from the
    * READ. Functionally identical output (PackingSpec pins it); the
    * difference is pure execution shape — packing consumes the encode
    * output twice (the placement pass and the assembly join), so the
    * in-line form re-runs the encode lineage per consumer while this
    * form pays one write and two columnar scans. At bench SF the
    * memoized CPU encode wins (see PLANS.md "q80 encode boundary");
    * at 100 TB — where the encode output doesn't fit memory and
    * recompute means re-reading the raw corpus — the written table is
    * the only shape that works, and THIS is the function a production
    * run calls.
    */
  def packIdSequencesMaterialized(encoded: DataFrame, table: String,
                                  idCol: String, seqLen: Int): DataFrame = {
    graft.sources.SnapshotTable.overwrite(encoded, table)
    packIdSequences(
      graft.sources.SnapshotTable.read(encoded.sparkSession, table),
      idCol, seqLen)
  }

  /** Length-grouped batching (a.k.a. dynamic batching): bucket
    * documents by token length, order each bucket longest-first and
    * cut fixed-size batches — the padded-batch counterpart of
    * [[packIdSequences]]'s concat-and-chunk regime (SFT/eval loaders
    * pad to the batch max instead of packing, and pad-token waste is
    * pure wasted FLOPs; grouping similar lengths minimizes it).
    *
    * Returns the ASSIGNMENT (id, len, bucket, batch, rank_in_bucket):
    * batch `b` of bucket `k` holds ranks [b·batchSize, (b+1)·batchSize).
    * Everything is exact integers under the total order
    * (bucket, len DESC, id) — callers aggregate padding accounting
    * relationally (see the q121 gate).
    *
    * Scale shape: a bucket can hold billions of rows, so rank-within-
    * bucket must NOT be a `Window.partitionBy(bucket)` (one task per
    * bucket = the skewed-window anti-pattern). The global rank comes
    * from the same two-phase prefix sum as packing (weight 1 per row
    * under the bucket-major total order) and the per-bucket rank is
    * global rank − the bucket's first rank — a #buckets-row broadcast.
    * The shuffle carries (id, len, bucket), never text.
    */
  def lengthBatches(counted: DataFrame, idCol: String, lenCol: String,
                    bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      "lengthBatches needs positive bucketWidth and batchSize")
    val bucketed = counted
      .select(col(idCol), col(lenCol).cast("long").as("len"),
        expr(s"cast($lenCol as bigint) DIV ${bucketWidth}L").as("bucket"))
      .withColumn("n_tokens", lit(1L))
    // same leak-the-handle contract as offsetsBy: the internal persist
    // must outlive the caller's action (a long-running caller should
    // use the Releasable primitive directly)
    val ranked = offsetsOrderedReleasable(bucketed, idCol,
      Seq(col("bucket"), col("len").desc, col(idCol)))._1
    // tok_end under weight-1 rows IS the 1-based global rank
    val starts = ranked.groupBy("bucket")
      .agg(min("tok_end").as("__bstart"))
    ranked.join(broadcast(starts), Seq("bucket"))
      .select(col(idCol), col("len"), col("bucket"),
        (col("tok_end") - col("__bstart")).as("rank_in_bucket"))
      .withColumn("batch", expr(s"rank_in_bucket DIV ${batchSize}L"))
      .select(col(idCol), col("len"), col("bucket"), col("batch"),
        col("rank_in_bucket"))
  }

  /** Per-batch padding accounting over a [[lengthBatches]] assignment:
    * (bucket, batch, n_docs, max_len, sum_len, pad_waste) where
    * pad_waste = max_len·n_docs − sum_len — the pad-token count a
    * loader padding to the batch max would feed the model.
    */
  def batchPadding(assign: DataFrame): DataFrame =
    assign.groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max("len").as("max_len"),
        sum("len").as("sum_len"))
      .withColumn("pad_waste",
        col("max_len") * col("n_docs") - col("sum_len"))

  /** Assembled fixed-length sequences: joins the composition map back
    * to the doc text (the map side carries offsets only until this
    * final join), slices each doc's contribution, and concatenates in
    * sequence order — one hash aggregation keyed on seq_id. The final
    * sequence of the corpus may be shorter than `seqLen` (`n_tokens`
    * makes that visible; padding policy belongs to the consumer).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int): DataFrame = {
    val comp = packCompositions(df, idCol, textCol, seqLen)
    val words = TextAnalysis.tokens(col(textCol))
    val pieces = comp.join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col("seq_id"), col("seq_off"), col("n_toks"),
        concat_ws(" ", slice(words, (col("doc_off") + 1).cast("int"),
          col("n_toks").cast("int"))).as("piece"))
    pieces.groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("seq_off"), col("piece")))),
          s => s.getField("piece"))).as("text"))
  }
}
