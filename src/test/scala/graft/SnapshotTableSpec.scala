package graft

import java.nio.file.Files
import graft.sources.SnapshotTable

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  test("append/overwrite versions, time travel, snapshot isolation") {
    val t = Files.createTempDirectory("graft_snap").toString + "/t"
    val v0 = SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)
    val v1 = SnapshotTable.append(Seq((3, "c")).toDF("id", "v"), t)
    assert(v0 == 0 && v1 == 1)
    assert(SnapshotTable.read(spark, t).count() == 3)
    // a reader holding version 0 still sees exactly the old snapshot
    assert(SnapshotTable.read(spark, t, Some(0)).as[(Int, String)]
      .collect().toSet == Set((1, "a"), (2, "b")))

    val v2 = SnapshotTable.overwrite(Seq((9, "z")).toDF("id", "v"), t)
    assert(v2 == 2)
    assert(SnapshotTable.read(spark, t).as[(Int, String)].collect().toSet == Set((9, "z")))
    // time travel across all three versions
    assert(SnapshotTable.read(spark, t, Some(1)).count() == 3)
    assert(SnapshotTable.read(spark, t, Some(0)).count() == 2)
  }

  test("keyed upsert merges per snapshot; vacuum drops old versions") {
    val t = Files.createTempDirectory("graft_snap2").toString + "/t"
    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)
    SnapshotTable.upsert(spark, Seq((2, "B"), (3, "c"), (3, "c2")).toDF("id", "v"), t, "id")
    val now = SnapshotTable.read(spark, t).as[(Int, String)].collect().toMap
    assert(now.keySet == Set(1, 2, 3))
    assert(now(2) == "B")
    // pre-upsert snapshot still intact
    assert(SnapshotTable.read(spark, t, Some(0)).as[(Int, String)]
      .collect().toMap == Map(1 -> "a", 2 -> "b"))

    SnapshotTable.vacuum(t, keepVersions = 1)
    // latest still reads fine; old version is gone
    assert(SnapshotTable.read(spark, t).count() == 3)
    intercept[Exception](SnapshotTable.read(spark, t, Some(0)).count())
  }
}
