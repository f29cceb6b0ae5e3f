package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-table replication primitives over [[SnapshotTable]]:
  *
  *  - [[applyCdc]] — apply one typed change batch (rows tagged
  *    I/U/D) through a SINGLE conditional MERGE commit: upserts
  *    update-or-insert, deletes remove, a delete for an absent key is
  *    a no-op (standard CDC-apply semantics, one atomic snapshot).
  *  - [[sync]] — exactly-once incremental replication of an
  *    append-only source table: reads the source change feed past the
  *    replica's recorded watermark and applies it idempotently. The
  *    watermark IS the snapshot txn mechanism
  *    ([[SnapshotTable.appendIdempotent]]) keyed by a per-source
  *    writer id, so a crashed-and-restarted sync (or a double-run
  *    scheduler) re-applies nothing — the replica converges on
  *    at-most-once per source version with NO coordination beyond the
  *    replica's own manifest.
  *
  * At 100 TB this is how a derived copy (regional mirror, indexing
  * cluster, dev snapshot) follows a production table: per sync it
  * moves only the files committed since the watermark, never a full
  * scan of the source.
  */
object Replication {

  /** Apply a CDC batch to `table` in one MERGE commit. `changes`
    * carries the target's data columns plus `opCol` ∈ {"I","U","D"}.
    * Deletes for keys not present in the table are dropped (no-op)
    * rather than inserted.
    */
  def applyCdc(spark: SparkSession, table: String, changes: DataFrame,
               key: String, opCol: String = "_op"): Int = {
    val dataCols = SnapshotTable.schemaOf(spark, table)
      .fieldNames.filterNot(_ == key)
    val existingKeys = SnapshotTable.read(spark, table).select(col(key))
    // a D row with no matching key must not reach the NOT MATCHED
    // INSERT branch — semi-join deletes onto live keys first
    val pruned = changes.filter(col(opCol) =!= "D")
      .unionByName(changes.filter(col(opCol) === "D")
        .join(existingKeys, Seq(key), "left_semi"))
    SnapshotTable.merge(spark, table, pruned, key,
      whenMatchedUpdate =
        dataCols.map(c => c -> col(s"_src.$c")).toMap,
      whenMatchedDelete = Some(col(s"_src.$opCol") === "D"),
      whenNotMatchedInsert = true)
  }

  /** The replica's recorded source watermark (last synced source
    * version), read from the replica's own txn map.
    */
  def watermark(replica: String, writerId: String): Option[Long] =
    SnapshotTable.currentVersion(replica)
      .flatMap(v => SnapshotTable.txnVersions(replica, v).get(writerId))

  /** One incremental sync step: append every source row committed in
    * versions (watermark, current] to the replica, recording the new
    * watermark in the SAME commit. Returns the replica version
    * committed, or None when already up to date (including replayed
    * calls — the idempotent-append watermark makes re-delivery a
    * no-op). Source must be append-only for row-level fidelity (the
    * [[SnapshotTable.readChanges]] contract).
    */
  def sync(spark: SparkSession, source: String, replica: String,
           writerId: String): Option[Int] = {
    val hi = SnapshotTable.currentVersion(source).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $source"))
    val since = watermark(replica, writerId).getOrElse(-1L)
    if (hi <= since) return None
    val delta = SnapshotTable
      .readChanges(spark, source, since.toInt, Some(hi))
      .drop("_commit_version")
    SnapshotTable.appendIdempotent(delta, replica, writerId, hi.toLong)
  }
}
