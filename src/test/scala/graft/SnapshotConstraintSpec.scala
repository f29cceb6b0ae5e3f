package graft

import java.nio.file.Files
import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** CHECK constraints on the snapshot table — the Delta ALTER TABLE
  * ADD CONSTRAINT contract: vet existing data on add, reject
  * violating batches ATOMICALLY on every data-adding commit, SQL NULL
  * semantics (violation only when the expression is FALSE), carry
  * forward through unrelated commits, metadata-only add/drop.
  */
class SnapshotConstraintSpec extends SparkSpec {
  import spark.implicits._

  test("violating append/idempotent-append rejected atomically; " +
      "passing append commits; constraint carries through commits") {
    val t = Files.createTempDirectory("graft_cons").toString + "/t"
    SnapshotTable.append(Seq((1, 10.0), (2, 20.0)).toDF("id", "kwh"), t)
    val vAdd = SnapshotTable.addConstraint(spark, t, "kwh_pos", "kwh > 0")
    assert(SnapshotTable.constraintsOf(t) == Map("kwh_pos" -> "kwh > 0"))

    val before = SnapshotTable.currentVersion(t)
    val e = intercept[IllegalArgumentException](
      SnapshotTable.append(Seq((3, -1.0)).toDF("id", "kwh"), t))
    assert(e.getMessage.contains("kwh_pos") && e.getMessage.contains("1 row"))
    // atomic: no version committed, no rows landed
    assert(SnapshotTable.currentVersion(t) == before)
    assert(SnapshotTable.read(spark, t).count() == 2)

    val eIdem = intercept[IllegalArgumentException](
      SnapshotTable.appendIdempotent(
        Seq((3, -1.0)).toDF("id", "kwh"), t, "writer", 1L))
    assert(eIdem.getMessage.contains("kwh_pos"))

    // a passing append commits, and the constraint SURVIVES it
    SnapshotTable.append(Seq((3, 3.0)).toDF("id", "kwh"), t)
    assert(SnapshotTable.constraintsOf(t) == Map("kwh_pos" -> "kwh > 0"))
    assert(SnapshotTable.currentVersion(t).get > vAdd)
    // ...so the NEXT violating append still fails
    intercept[IllegalArgumentException](
      SnapshotTable.append(Seq((4, 0.0)).toDF("id", "kwh"), t))
  }

  test("add vets existing data; NULL passes (SQL CHECK semantics); " +
      "drop re-opens the gate") {
    val t = Files.createTempDirectory("graft_cons2").toString + "/t"
    SnapshotTable.append(Seq((1, 5.0), (2, -4.0)).toDF("id", "kwh"), t)
    val e = intercept[IllegalArgumentException](
      SnapshotTable.addConstraint(spark, t, "kwh_pos", "kwh > 0"))
    assert(e.getMessage.contains("1 existing row"))
    assert(SnapshotTable.constraintsOf(t).isEmpty)

    SnapshotTable.addConstraint(spark, t, "kwh_floor", "kwh > -10")
    // NULL expression result passes, as in the SQL standard and Delta
    SnapshotTable.append(
      Seq((3, Option.empty[Double])).toDF("id", "kwh"), t)
    assert(SnapshotTable.read(spark, t).count() == 3)
    intercept[IllegalArgumentException](
      SnapshotTable.append(Seq((4, -11.0)).toDF("id", "kwh"), t))

    SnapshotTable.dropConstraint(t, "kwh_floor")
    assert(SnapshotTable.constraintsOf(t).isEmpty)
    SnapshotTable.append(Seq((4, -11.0)).toDF("id", "kwh"), t)
    assert(SnapshotTable.read(spark, t).count() == 4)
    // unknown column / duplicate name fail loudly
    intercept[Exception](
      SnapshotTable.addConstraint(spark, t, "bad", "no_such_col > 0"))
    intercept[IllegalArgumentException](SnapshotTable.dropConstraint(t, "ghost"))
  }

  test("merge enforces on the MERGED output: an update that drives a " +
      "row out of range is rejected before any data lands") {
    val t = Files.createTempDirectory("graft_cons3").toString + "/t"
    SnapshotTable.append(Seq((1, 5.0), (2, 6.0)).toDF("id", "kwh"), t)
    SnapshotTable.addConstraint(spark, t, "kwh_pos", "kwh > 0")
    val before = SnapshotTable.currentVersion(t)
    // the UPDATE expression (kwh - 100) violates even though the
    // incoming source rows alone look harmless
    val e = intercept[IllegalArgumentException](
      SnapshotTable.merge(spark, t,
        Seq((1, 1.0)).toDF("id", "kwh"), "id",
        whenMatchedUpdate = Map("kwh" -> (col("kwh") - lit(100.0)))))
    assert(e.getMessage.contains("kwh_pos"))
    assert(SnapshotTable.currentVersion(t) == before)
    assert(SnapshotTable.read(spark, t).as[(Int, Double)].collect().toMap
      == Map(1 -> 5.0, 2 -> 6.0))
    // a passing merge commits
    SnapshotTable.merge(spark, t, Seq((1, 9.0)).toDF("id", "kwh"), "id",
      whenMatchedUpdate = Map("kwh" -> col("kwh")))
    assert(SnapshotTable.read(spark, t).count() == 2)
  }
}
