package graft

import java.nio.file.Files
import graft.sources.{Replication, SnapshotTable}

/** CDC apply + exactly-once incremental replication over the
  * snapshot table's change feed and txn watermarks.
  */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  test("applyCdc: one MERGE commit applies I/U/D; a delete for an " +
      "absent key is a no-op") {
    val t = Files.createTempDirectory("graft_cdc").toString + "/t"
    SnapshotTable.append(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), t)
    val before = SnapshotTable.currentVersion(t).get
    val changes = Seq(
      (2, "B", "U"),   // update
      (4, "d", "I"),   // insert
      (3, "c", "D"),   // delete
      (99, "x", "D")   // delete for absent key: no-op, must NOT insert
    ).toDF("id", "v", "_op")
    Replication.applyCdc(spark, t, changes, "id")
    // exactly one new version (atomic batch)
    assert(SnapshotTable.currentVersion(t).get == before + 1)
    val now = SnapshotTable.read(spark, t).as[(Int, String)].collect().toMap
    assert(now == Map(1 -> "a", 2 -> "B", 4 -> "d"))
  }

  test("sync: bootstrap + incremental delta + replayed call is a " +
      "no-op; replica converges on source content") {
    val src = Files.createTempDirectory("graft_repl").toString + "/src"
    val rep = Files.createTempDirectory("graft_repl").toString + "/rep"
    val wid = "replica:test"
    SnapshotTable.append(Seq((1, "a")).toDF("id", "v"), src)
    SnapshotTable.append(Seq((2, "b")).toDF("id", "v"), src)
    // bootstrap: both source versions move in one replica commit
    assert(Replication.sync(spark, src, rep, wid).isDefined)
    assert(SnapshotTable.read(spark, rep).as[(Int, String)]
      .collect().toSet == Set((1, "a"), (2, "b")))
    assert(Replication.watermark(rep, wid).contains(1L))

    // replay: no new source commits -> no-op, replica version frozen
    val frozen = SnapshotTable.currentVersion(rep)
    assert(Replication.sync(spark, src, rep, wid).isEmpty)
    assert(SnapshotTable.currentVersion(rep) == frozen)

    // incremental: one more source commit moves ONLY the delta
    SnapshotTable.append(Seq((3, "c")).toDF("id", "v"), src)
    assert(Replication.sync(spark, src, rep, wid).isDefined)
    assert(SnapshotTable.read(spark, rep).as[(Int, String)]
      .collect().toSet == Set((1, "a"), (2, "b"), (3, "c")))
    assert(Replication.watermark(rep, wid).contains(2L))
    // the incremental commit added exactly the delta rows, not a
    // re-copy: version count grew by one and the v-diff is one row
    val lastV = SnapshotTable.currentVersion(rep).get
    val delta = SnapshotTable.readChanges(spark, rep, lastV - 1, Some(lastV))
    assert(delta.count() == 1)

    // double-run after convergence: still a no-op
    assert(Replication.sync(spark, src, rep, wid).isEmpty)
  }
}
