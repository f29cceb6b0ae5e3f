package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** SnapshotTable manifest scaling probe (r4 verdict #6): the format
  * claims 100 TB posture, and the driver-side manifest — one JSON per
  * version listing every live file with stats — is its only unmeasured
  * single point. This main grows a table to `commits x filesPerCommit`
  * files and measures, at checkpoints along the way:
  *
  *  - append commit time (the manifest is rewritten whole per commit,
  *    so this is the O(files) driver cost that grows with table size);
  *  - read PLANNING time, pruned and unpruned (manifest parse + stat
  *    filter — no data touched);
  *  - pruned file count (stat skipping must stay intact at depth);
  *  - txn-watermark read time (the streaming source's commit-log tail).
  *
  * Usage: runMain graft.ManifestProbe [commits] [filesPerCommit] [synthetic]
  * Prints one JSON line per checkpoint.
  *
  * `synthetic` mode commits pre-built manifest ENTRIES (no parquet
  * writes — the `appendEntries` seam), so the probe reaches the
  * 100k–1M-file regime in seconds: commit cost, chunk roll/compaction,
  * root size and PLAN time are all real; only the data bytes are not,
  * which planning never touches anyway.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val commits = if (args.length > 0) args(0).toInt else 100
    val filesPerCommit = if (args.length > 1) args(1).toInt else 100
    val synthetic = args.length > 2 && args(2) == "synthetic"
    val spark = Tables.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val table = java.nio.file.Files
      .createTempDirectory("graft_manifest_probe").toString + "/t"

    def msOf[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e6)
    }

    val synthSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("seq_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.LongType)))
    val checkpoints = Set(1, 10, 25, 50, commits / 2, commits)
    (1 to commits).foreach { c =>
      // seq_id ranges are disjoint per commit, so a tight prune should
      // open ~filesPerCommit files no matter how many commits exist
      val lo = (c - 1).toLong * filesPerCommit
      val (_, tCommit) =
        if (synthetic) {
          val entries = (0 until filesPerCommit).map { i =>
            SnapshotTable.FileEntry(s"s-${lo + i}.parquet",
              Map("seq_id" -> SnapshotTable.ColStats(lo + i, lo + i)),
              4096L)
          }
          msOf(SnapshotTable.appendEntries(table, entries, synthSchema,
            Map("probe" -> c.toLong)))
        } else msOf {
          val df = spark.range(lo, lo + filesPerCommit)
            .select(col("id").as("seq_id"),
              (col("id") % 7).as("payload"))
            .repartitionByRange(filesPerCommit, col("seq_id"))
          SnapshotTable.appendIdempotent(df, table, "probe", c.toLong)
        }
      if (checkpoints.contains(c)) {
        val nFiles = c * filesPerCommit
        val (planned, tPlanFull) = msOf(SnapshotTable.read(spark, table))
        val fullFiles = planned.inputFiles.length
        val mid = nFiles.toLong / 2
        val (pruned, tPlanPruned) = msOf(SnapshotTable.read(spark, table,
          prune = Seq(SnapshotTable.ColRange("seq_id",
            lower = Some(mid), upper = Some(mid + filesPerCommit / 2)))))
        val prunedFiles = pruned.inputFiles.length
        val (_, tTxn) = msOf(
          SnapshotTable.txnVersions(table,
            SnapshotTable.currentVersion(table).get))
        val manifestBytes = java.nio.file.Files.size(java.nio.file.Paths
          .get(table, "_manifests", s"v${SnapshotTable.currentVersion(table).get}.json"))
        println(f"""{"files":$nFiles,"commit_ms":$tCommit%.1f,""" +
          f""""plan_full_ms":$tPlanFull%.1f,"plan_pruned_ms":$tPlanPruned%.1f,""" +
          f""""full_files":$fullFiles,"pruned_files":$prunedFiles,""" +
          f""""txn_read_ms":$tTxn%.1f,"manifest_bytes":$manifestBytes}""")
      }
    }
    spark.stop()
  }
}
