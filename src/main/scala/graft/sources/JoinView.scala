package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view over two APPEND-ONLY snapshot
  * tables — the join sibling of [[IncrementalRollup]] (which maintains
  * aggregates). For V = A ⋈ B under appends ΔA, ΔB, the standard
  * delta-join identity
  *
  *   ΔV = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
  *
  * counts the ΔA ⋈ ΔB cross term exactly once (it lives in the first
  * leg, because B_new ⊇ ΔB and A_old excludes ΔA). Each refresh
  * therefore scans only ONE full side per delta — never A_new ⋈ B_new
  * — and a refresh where only one source moved scans nothing but that
  * side's delta joined to the other side: the materialized-view
  * economics that make a 100 TB star join maintainable.
  *
  * Exactly-once: the view's txn watermarks record the last-synced
  * version of EACH source (`ivm:a` / `ivm:b` writer ids), checked and
  * advanced atomically by the idempotent append — a crashed or
  * double-run scheduler re-applies nothing (the [[Replication.sync]]
  * contract, extended to two upstream cursors; the delta append
  * itself re-checks inside the commit retry loop).
  *
  * Append-only is REQUIRED of both sources: the file-level change
  * feed re-emits rewritten rows, so an upstream upsert/delete would
  * double or strand view rows. Compose with [[SnapshotTable.merge]]
  * views downstream when upstreams mutate.
  */
object JoinView {

  private val WriterA = "ivm:a"
  private val WriterB = "ivm:b"
  // the DELIVERY cursor: one writer id whose version encodes BOTH
  // source versions monotonically (vA·1e9 + vB — each component only
  // grows, so the combination does too). The idempotent append checks
  // only its primary writer id; tracking the sources as two separate
  // primary ids would let a B-only delta replay-skip against A's
  // already-current watermark and silently drop rows.
  private val Cursor = "ivm"
  private val CursorBase = 1000000000L

  /** Versions of (A, B) the view has already absorbed. */
  def syncedVersions(view: String): (Option[Long], Option[Long]) =
    SnapshotTable.currentVersion(view) match {
      case None => (None, None)
      case Some(v) =>
        val t = SnapshotTable.txnVersions(view, v)
        (t.get(WriterA), t.get(WriterB))
    }

  /** Refresh the view with everything `srcA`/`srcB` committed since
    * the last refresh (bootstraps on first call). `joinKey` is the
    * equi-join column (same name both sides); `project` selects the
    * view's output columns from the joined frame.
    *
    * @return Some(view version) when a delta landed; None when both
    *         cursors were already current (the no-op replay path)
    */
  def maintain(spark: SparkSession, view: String, srcA: String,
               srcB: String, joinKey: String,
               project: DataFrame => DataFrame = identity): Option[Int] = {
    val vA = SnapshotTable.currentVersion(srcA).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $srcA"))
    val vB = SnapshotTable.currentVersion(srcB).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $srcB"))
    val (lastA, lastB) = syncedVersions(view)
    if (lastA.contains(vA.toLong) && lastB.contains(vB.toLong)) return None

    def changes(src: String, last: Option[Long], to: Int): DataFrame = {
      val lo = last.map(_.toInt).getOrElse(-1)
      SnapshotTable.readChanges(spark, src, lo, Some(to))
        .drop("_commit_version")
    }
    val dA = changes(srcA, lastA, vA)
    val bNew = SnapshotTable.read(spark, srcB, Some(vB))
    val dB = changes(srcB, lastB, vB)
    // A as of the PREVIOUS cursor: the ΔA ⋈ ΔB cross term must not
    // appear twice (leg 1 already pairs ΔA with all of B_new)
    val aOld = lastA match {
      case Some(v0) => SnapshotTable.read(spark, srcA, Some(v0.toInt))
      case None => dA.limit(0)
    }
    val delta = project(dA.join(bNew, joinKey))
      .unionByName(project(aOld.join(dB, joinKey)))
    SnapshotTable.appendIdempotent(delta, view, Cursor,
      vA.toLong * CursorBase + vB.toLong,
      Map(WriterA -> vA.toLong, WriterB -> vB.toLong))
  }
}
