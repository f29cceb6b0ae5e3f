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

  test("exactly-once: a replayed (writer, batch) pair is a structural " +
      "no-op; a rotated writer re-applies") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val table = s"$dir/t"
    assert(IncrementalRollup.upsertDailyIdempotent(spark,
      ev.filter($"event_id" % 2 === 0), table, "w1", 0L))
    assert(IncrementalRollup.upsertDailyIdempotent(spark,
      ev.filter($"event_id" % 2 === 1), table, "w1", 1L))
    val expect = snap(table)
    val vBefore = SnapshotTable.currentVersion(table)
    // crash replay: same writer, same batch id — no new version, no
    // doubled sums
    assert(!IncrementalRollup.upsertDailyIdempotent(spark,
      ev.filter($"event_id" % 2 === 1), table, "w1", 1L))
    assert(SnapshotTable.currentVersion(table) == vBefore)
    assert(snap(table) == expect)
    // an OLD batch id replayed out of order is also skipped
    assert(!IncrementalRollup.upsertDailyIdempotent(spark,
      ev.filter($"event_id" % 2 === 0), table, "w1", 0L))
    assert(snap(table) == expect)
    // a fresh checkpoint rotates the writer id and its batch 0 applies
    assert(IncrementalRollup.upsertDailyIdempotent(spark,
      ev.filter($"event_id" === 5L), table, "w2", 0L))
    assert(snap(table)("2024-03-03") == ((18002000L, 2L)))
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
