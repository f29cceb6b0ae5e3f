package graft

import java.nio.file.Files
import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Generated columns (the Delta GENERATED ALWAYS AS contract): the
  * TABLE stamps derived columns, writers may omit them, explicit
  * conflicting values are rejected, row-rewrite paths (UPDATE/MERGE)
  * recompute from the new bases, and manifest stats on the generated
  * column prune reads like any hand-maintained partition key.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String = {
    val t = Files.createTempDirectory(prefix).toString + "/t"
    SnapshotTable.create(t,
      new StructType().add("id", LongType).add("v", LongType))
    SnapshotTable.addGeneratedColumn(spark, t, "bucket", "v DIV 10")
    t
  }

  test("append materializes an omitted generated column; an explicit " +
      "conflicting value is rejected; a matching one passes") {
    val t = freshTable("graft_gen")
    assert(SnapshotTable.generatedColumnsOf(t) == Map("bucket" -> "v DIV 10"))
    SnapshotTable.append(Seq((1L, 15L), (2L, 25L)).toDF("id", "v"), t)
    assert(SnapshotTable.read(spark, t).as[(Long, Long, Long)]
      .collect().toSet == Set((1L, 15L, 1L), (2L, 25L, 2L)))

    val before = SnapshotTable.currentVersion(t)
    val e = intercept[IllegalArgumentException](SnapshotTable.append(
      Seq((3L, 35L, 9L)).toDF("id", "v", "bucket"), t))
    assert(e.getMessage.contains("_gen:bucket"))
    assert(SnapshotTable.currentVersion(t) == before)

    SnapshotTable.append(Seq((3L, 35L, 3L)).toDF("id", "v", "bucket"), t)
    assert(SnapshotTable.read(spark, t).count() == 3)
    // idempotent append also stamps
    SnapshotTable.appendIdempotent(
      Seq((4L, 47L)).toDF("id", "v"), t, "w1", 1L)
    assert(SnapshotTable.read(spark, t).filter($"id" === 4L)
      .select("bucket").as[Long].head() == 4L)
  }

  test("MERGE recomputes generated columns from post-update bases and " +
      "stamps inserts; UPDATE recomputes and refuses SET on generated") {
    val t = freshTable("graft_gen2")
    SnapshotTable.append(Seq((1L, 15L), (2L, 25L)).toDF("id", "v"), t)
    SnapshotTable.merge(spark, t,
      Seq((2L, 95L), (4L, 41L)).toDF("id", "v"), "id",
      whenMatchedUpdate = Map("v" -> col("_src.v")),
      whenMatchedDelete = None, whenNotMatchedInsert = true)
    val after = SnapshotTable.read(spark, t).as[(Long, Long, Long)]
      .collect().map { case (id, v, b) => id -> ((v, b)) }.toMap
    assert(after(2L) == ((95L, 9L)), s"stale generated value: $after")
    assert(after(4L) == ((41L, 4L)))

    SnapshotTable.update(spark, t, $"id" === 1L,
      Map("v" -> ($"v" + 60L)))
    assert(SnapshotTable.read(spark, t).filter($"id" === 1L)
      .select("v", "bucket").as[(Long, Long)].head() == ((75L, 7L)))
    val e = intercept[IllegalArgumentException](SnapshotTable.update(
      spark, t, $"id" === 1L, Map("bucket" -> lit(0L))))
    assert(e.getMessage.contains("generated"))
  }

  test("retro-fit vets existing rows; manifest stats on the generated " +
      "column prune files the filter never opens") {
    // retro-fit rejection: existing explicit column disagrees
    val bad = Files.createTempDirectory("graft_gen3").toString + "/t"
    SnapshotTable.append(Seq((1L, 15L, 99L)).toDF("id", "v", "bucket"), bad)
    val e = intercept[IllegalArgumentException](
      SnapshotTable.addGeneratedColumn(spark, bad, "bucket", "v DIV 10"))
    assert(e.getMessage.contains("disagree"))

    // pruning: two appends in disjoint v ranges -> disjoint generated
    // ranges in the manifest stats
    val t = freshTable("graft_gen4")
    SnapshotTable.append((1L to 50L).map(i => (i, i)).toDF("id", "v"), t)
    SnapshotTable.append((51L to 100L).map(i => (i, i + 900L)).toDF("id", "v"), t)
    val all = SnapshotTable.filesForRead(t)
    val pr = Seq(SnapshotTable.ColRange("bucket",
      lower = Some(91L), upper = Some(100L)))
    val pruned = SnapshotTable.filesForRead(t, prune = pr)
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"generated-column stats did not prune: ${pruned.size}/${all.size}")
    assert(SnapshotTable.read(spark, t, prune = pr)
      .filter($"bucket" >= 91L).count() == 50L)
  }
}
