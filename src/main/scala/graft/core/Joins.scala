package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Catalyst's built-ins.
  *
  * Backward as-of join: for each left row, the single most recent
  * right row with the same key and right.ts <= left.ts. Spark has no
  * native as-of join; per the custom-operator preference order
  * (compose > custom Expression > custom plan), this composes
  * built-ins: tag + union both sides, one window pass per key ordered
  * by (ts, side), carry the last right value forward, keep left rows.
  * Exactly one shuffle (hash by key) and one sort — the same physical
  * work a hand-written sort-merge as-of exec would do, but AQE/codegen
  * still apply.
  */
object Joins {

  /** `left` gains `valueCols` from the latest `right` row at or before
    * its `leftTs`. Right rows sort before left rows at equal
    * timestamps, so an exact tie matches (<= semantics).
    *
    * @param leftKey/rightKey equality keys
    * @param valueCols columns of `right` to carry (must not clash with
    *   left's column names)
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: Column, rightTs: Column,
                   valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Row-atomic carry: the right side's value columns travel as ONE
    // struct per right row (non-null for every right row, even when
    // individual fields are null), and the window takes the last
    // non-null STRUCT. Carrying each column independently with
    // last(ignoreNulls) would back-fill a null field from an OLDER
    // right row — mixing columns from different right rows, diverging
    // from AsofJoinExec and DuckDB ASOF semantics.
    val carryType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val lTagged = left
      .withColumn("__key", col(leftKey))
      .withColumn("__ts", leftTs.cast("timestamp"))
      .withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(carryType))
    val rTagged = leftCols.foldLeft(
        right
          .withColumn("__key", col(rightKey))
          .withColumn("__ts", rightTs.cast("timestamp"))
          .withColumn("__side", lit(0))
          .withColumn("__carry", struct(valueCols.map(col): _*)))((d, c) =>
        if (valueCols.contains(c)) d
        // null placeholders must carry the OTHER side's real types or
        // the union rejects the NullType columns
        else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val sel = ("__key" +: "__ts" +: "__side" +: "__carry" +: leftCols).distinct.map(col)
    val unioned = lTagged.select(sel: _*).unionByName(rTagged.select(sel: _*))
    val w = Window.partitionBy("__key").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
    val unpacked = valueCols.foldLeft(carried)((d, c) =>
      d.withColumn(c, col("__carry").getField(c)))
    unpacked.filter(col("__side") === 1).drop("__key", "__ts", "__side", "__carry")
  }

  /** All-matches range (interval containment) join: every `points` row
    * paired with every `intervals` row of the same key whose half-open
    * window `[start, end)` contains the point's timestamp.
    *
    * The naive formulation — equi-join on key plus a range filter —
    * degenerates at scale: a hot key becomes a per-key cartesian
    * product that the range filter prunes only AFTER materializing.
    * This implementation buckets time into `bucketSeconds`-wide epochs:
    * each point lands in exactly ONE bucket, each interval explodes
    * into the buckets it overlaps, and the join runs on (key, bucket)
    * before the exact predicate — so the shuffle fan-out is bounded by
    * interval-length/bucketSeconds instead of per-key row counts, and
    * every true match is found exactly once (no post-join dedup,
    * because the point's bucket is unique). Pick `bucketSeconds` near
    * the typical interval length: shorter buckets shrink false
    * candidates but grow the interval explosion.
    *
    * Bucketing uses second-truncated epochs on BOTH sides (truncation
    * is monotone, so a contained point's bucket always falls inside the
    * interval's bucket span); the exact predicate then uses the raw
    * timestamps. `intervals`' key column is renamed internally, so its
    * other columns must not clash with `points`'.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointKey: String, intervalKey: String,
                tsCol: String, startCol: String, endCol: String,
                bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val p = points.withColumn("__pb",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    val iv = intervals
      .withColumnRenamed(intervalKey, "__ivk")
      .withColumn("__ib", explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    p.join(iv,
        col(pointKey) === col("__ivk") && col("__pb") === col("__ib") &&
          col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__ivk", "__pb", "__ib")
  }

  /** Interval × interval overlap join — the two-sided generalization
    * of [[rangeJoin]] (which joins points into intervals): emit one
    * row per pair of CLOSED intervals [aStart, aEnd], [bStart, bEnd]
    * that overlap (`aStart <= bEnd AND bStart <= aEnd`), with all
    * columns of both sides.
    *
    * Scale shape: each side explodes its interval into the hour
    * buckets it spans — bounded fan-out, `span/bucketSeconds + 1`
    * rows per interval — and the join keys on (equality keys,
    * bucket). A pair spanning several shared buckets is emitted
    * EXACTLY once without any distinct: only the canonical bucket —
    * the one containing `greatest(aStart, bStart)`, the first instant
    * both intervals are live — passes the join filter. That keeps the
    * plan a plain shuffled equi-join (AQE/skew-split eligible), never
    * a cartesian with a post-filter, and never an O(pairs)
    * deduplication exchange.
    *
    * @param keys equality columns present on BOTH sides (e.g. a
    *   tenant id) — empty means bucket-only, which at 100 TB demands
    *   a time-bounded workload (the overlap product itself is the
    *   output size, not a plan artifact)
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          keys: Seq[String] = Nil,
                          bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def bkt(c: Column): Column = floor(unix_timestamp(c) / bucketSeconds)
    val ab = a.withColumn("__ab",
      explode(sequence(bkt(col(aStart)), bkt(col(aEnd)))))
    val bb = b.withColumn("__bb",
      explode(sequence(bkt(col(bStart)), bkt(col(bEnd)))))
    val cond = keys.map(k => ab(k) === bb(k))
      .foldLeft(
        col("__ab") === col("__bb") &&
          ab(aStart) <= bb(bEnd) && bb(bStart) <= ab(aEnd) &&
          col("__ab") === floor(
            greatest(unix_timestamp(ab(aStart)), unix_timestamp(bb(bStart)))
              / bucketSeconds))(_ && _)
    val joined = ab.join(bb, cond).drop("__ab", "__bb")
    // keep one copy of each equality key (the a side's)
    keys.foldLeft(joined)((d, k) => d.drop(bb(k)))
  }

  /** Same semantics as [[asofBackward]] through the custom plan node
    * ([[graft.plans.AsofJoin]] + AsofJoinExec): one hash exchange per
    * side, per-partition streaming merge. Registers the planner
    * strategy on the session at first use (idempotent).
    */
  def asofBackwardNative(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTs: Column, rightTs: Column,
                         valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    val lPlan = GraftShim.logicalPlan(
      left.withColumn("__lts", leftTs.cast("timestamp")))
    val rPlan = GraftShim.logicalPlan(
      right.withColumn("__rts", rightTs.cast("timestamp")))
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val plan = graft.plans.AsofJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, "__lts"), attr(rPlan, "__rts"),
      valueCols.map(c => attr(rPlan, c)))
    GraftShim.ofRows(spark, plan).drop("__lts")
  }

  /** Fuzzy entity linkage — record-linkage candidate pairs by
    * blocked edit distance: rows are first collapsed to DISTINCT
    * entity strings with their row counts (the scale move: pairing
    * runs on the entity table, never row × row), then entities
    * sharing a blocking key pair up via a plain equi-join (no cross
    * join) and survive at levenshtein ≤ maxDist. `entity_1 <
    * entity_2` emits each pair once. Both engines implement the same
    * classic DP edit distance, so the pair set oracles exactly.
    *
    * At 100 TB the entity table is the distinct-value space of the
    * name column (bounded far below row count for real catalogs);
    * skewed blocks get the q94/q95 treatment — cap the block size
    * and record the drop — via `maxBlockSize`.
    *
    * `blockKey` is evaluated against the collapsed entity table, so
    * express it over the column named `entity` (e.g.
    * `split(col("entity"), " ")(0)`).
    *
    * Output: (entity_1, entity_2, dist, rows_1, rows_2).
    */
  def fuzzyLinkPairs(df: DataFrame, entityCol: String, blockKey: Column,
                     maxDist: Int,
                     maxBlockSize: Long = Long.MaxValue): DataFrame = {
    val entities = df.groupBy(col(entityCol).as("entity"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", blockKey)
    val sized =
      if (maxBlockSize == Long.MaxValue) entities
      else {
        val keep = entities.groupBy("blk")
          .agg(count(lit(1)).as("blk_n"))
          .filter(col("blk_n") <= maxBlockSize)
          .select("blk")
        entities.join(keep, "blk")
      }
    val a = sized.select(col("blk"), col("entity").as("entity_1"),
      col("n_rows").as("rows_1"))
    val b = sized.select(col("blk"), col("entity").as("entity_2"),
      col("n_rows").as("rows_2"))
    a.join(b, Seq("blk"))
      .filter(col("entity_1") < col("entity_2"))
      .withColumn("dist",
        levenshtein(col("entity_1"), col("entity_2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("entity_1", "entity_2", "dist", "rows_1", "rows_2")
  }
}
