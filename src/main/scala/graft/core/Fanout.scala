package graft.core

import org.apache.spark.sql.DataFrame

/** Unsplittable-input fan-out — the guide's §2.5 "input skew: one huge
  * unsplittable file — repartition immediately after the read", made
  * scale-adaptive.
  *
  * The driver testdata ships every table as ONE parquet row group, and
  * a row group is the unit a parquet scan task owns — so every scan
  * stage here is ONE task regardless of core count, and an operator
  * whose heavy work runs BEFORE its first exchange (codec decode,
  * tokenize+explode, per-row DP) serializes that work on one core of
  * `local[32]` (measured: q293's O(n²) dot pass ran as one 2.5 s task;
  * q90's whole encode→decode pipeline has no exchange at all).
  *
  * [[ensure]] round-robins to the session's default parallelism ONLY
  * when the input has fewer partitions — at production scale a 100 TB
  * table scans as thousands of row-group tasks, the guard is false,
  * and no shuffle is added (the scale-adaptive discipline: session
  * parallelism, never a constant; a no-op exactly when the scan
  * already feeds every core). The repartition moves the rows once —
  * worth it precisely when the per-row work downstream dominates the
  * row bytes, which is the only place this helper is called.
  */
object Fanout {
  def ensure(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val par = sc.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
  }
}
