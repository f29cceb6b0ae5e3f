package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Keyed upsert ("MERGE") into a parquet table directory — the Spark
  * re-expression of the reference's per-record
  * `container.upsert_item(record)` loop
  * (`/root/reference/blob_to_cosmosdb.py:32-38`, SURVEY §2.1 S8).
  *
  * Semantics: rows in `updates` replace current rows with the same key;
  * all other current rows survive. Implemented as
  * `current ANTI JOIN updates ON key` ∪ `updates`, written to a temp
  * dir then atomically swapped — so readers never observe a partial
  * table and a crashed writer leaves the old data intact.
  *
  * With a transactional table format (Delta/Iceberg) this is a one-line
  * `MERGE INTO`; the swap emulates the same reader isolation on plain
  * parquet. The anti-join shuffles both sides by the key — at 100 TB
  * you'd bucket the table by the key so the join is co-located, or use
  * a format with file-level pruning; the operator contract stays the
  * same.
  */
object ParquetMerge {

  def tableExists(dir: String): Boolean = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) return false
    val s = Files.list(p)
    try s.findFirst().isPresent finally s.close()
  }

  /** Upsert `updates` into the table at `dir`, keyed by `key`.
    * Re-running with the same updates is a no-op (idempotent — fixes
    * the reference's re-upload-duplicates-data bug, SURVEY §2.10 E3).
    */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame, key: String): Unit = {
    // The reference's per-record upsert loop is last-write-wins per key
    // (`blob_to_cosmosdb.py:34`); a set-based MERGE must collapse
    // within-batch duplicates itself or both copies survive the union.
    val deduped = updates.dropDuplicates(key)
    if (!tableExists(dir)) {
      deduped.write.mode(SaveMode.Overwrite).parquet(dir)
      return
    }
    val current = spark.read.parquet(dir)
    val merged = current
      .join(deduped.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(deduped)
    val tmp = dir.stripSuffix("/") + ".__merge_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    swap(Paths.get(tmp), Paths.get(dir))
  }

  private def swap(tmp: Path, target: Path): Unit = {
    val backup = Paths.get(target.toString + ".__old")
    deleteRecursively(backup)
    Files.move(target, backup, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(backup)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val w = Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally w.close()
    }
}
