package graft

import java.sql.Timestamp
import graft.sources.{IncrementalRollup, SnapshotTable}
import org.apache.spark.sql.functions._

/** Incrementally-maintained daily rollup: batch-merge order cannot
  * change the view, late data folds in additively, and the measure's
  * fixed-point form is what makes that exact.
  */
class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def ev = Seq(
    (1L, t("2024-03-01 08:00:00"), 1.25),
    (2L, t("2024-03-01 09:30:00"), 2.50),
    (3L, t("2024-03-02 10:00:00"), 0.75),
    (4L, t("2024-03-02 11:00:00"), 4.125),
    (5L, t("2024-03-03 12:00:00"), 9.001)
  ).toDF("event_id", "ts", "value")

  private def snap(table: String): Map[String, (Long, Long)] =
    IncrementalRollup.readDaily(spark, table)
      .select(col("d").cast("string"), col("total_micro"), col("n"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("two-batch build equals one-shot, under either batch order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val oneShot = s"$dir/one"; val ab = s"$dir/ab"; val ba = s"$dir/ba"
    IncrementalRollup.upsertDaily(spark, ev, oneShot)
    IncrementalRollup.upsertDaily(spark, ev.filter($"event_id" % 2 === 0), ab)
    IncrementalRollup.upsertDaily(spark, ev.filter($"event_id" % 2 === 1), ab)
    IncrementalRollup.upsertDaily(spark, ev.filter($"event_id" % 2 === 1), ba)
    IncrementalRollup.upsertDaily(spark, ev.filter($"event_id" % 2 === 0), ba)
    val expect = snap(oneShot)
    assert(expect("2024-03-01") == ((3750000L, 2L)))
    assert(expect("2024-03-03") == ((9001000L, 1L)))
    assert(snap(ab) == expect)
    assert(snap(ba) == expect)
  }

  test("late data updates its day in place and inserts unseen days") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val table = s"$dir/t"
    IncrementalRollup.upsertDaily(spark, ev, table)
    val late = Seq(
      (6L, t("2024-03-02 23:59:00"), 1.0),   // existing day
      (7L, t("2024-03-05 01:00:00"), 2.5)    // new day
    ).toDF("event_id", "ts", "value")
    val v = IncrementalRollup.upsertDaily(spark, late, table)
    val after = snap(table)
    assert(after("2024-03-02") == ((4875000L + 1000000L, 3L)))
    assert(after("2024-03-05") == ((2500000L, 1L)))
    assert(after.size == 4)
    // the merge committed a new readable version with history intact
    assert(SnapshotTable.currentVersion(table).contains(v))
    assert(SnapshotTable.history(table).size >= 2)
  }

  test("an empty batch is a no-op commit, not a table rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val table = s"$dir/t"
    IncrementalRollup.upsertDaily(spark, ev, table)
    val before = snap(table)
    IncrementalRollup.upsertDaily(spark, ev.filter($"event_id" < 0), table)
    assert(snap(table) == before)
  }
}
