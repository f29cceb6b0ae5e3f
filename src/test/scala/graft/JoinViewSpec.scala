package graft

import graft.sources.{JoinView, SnapshotTable}
import java.nio.file.Files

/** Incremental join-view maintenance: interleaved source commits must
  * land exactly the one-shot join, deliveries must be exactly-once,
  * and the delta legs must neither drop a single-side refresh nor
  * double the ΔA ⋈ ΔB cross term.
  */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def dirs(): (String, String, String) = {
    val base = Files.createTempDirectory("graft_jv").toString
    (base + "/a", base + "/b", base + "/v")
  }

  test("interleaved commits == one-shot join; replay is a no-op") {
    val (ta, tb, tv) = dirs()
    SnapshotTable.append(Seq((1, "x1"), (2, "x2")).toDF("k", "a"), ta)
    SnapshotTable.append(Seq((1, "y1")).toDF("k", "b"), tb)
    assert(JoinView.maintain(spark, tv, ta, tb, "k").nonEmpty) // bootstrap
    assert(JoinView.maintain(spark, tv, ta, tb, "k").isEmpty,
      "cursors current: refresh must be a no-op")
    SnapshotTable.append(Seq((1, "x3"), (3, "x4")).toDF("k", "a"), ta)
    assert(JoinView.maintain(spark, tv, ta, tb, "k").nonEmpty) // ΔA leg
    SnapshotTable.append(Seq((2, "y2"), (3, "y3")).toDF("k", "b"), tb)
    assert(JoinView.maintain(spark, tv, ta, tb, "k").nonEmpty) // ΔB leg
    val got = SnapshotTable.read(spark, tv)
      .as[(Int, String, String)].collect().toSeq
    val expected = Seq((1, "x1", "y1"), (1, "x3", "y1"), (2, "x2", "y2"),
      (3, "x4", "y3"))
    assert(got.sorted == expected.sorted, s"$got")
    assert(got.size == got.distinct.size, "no doubled cross terms")
    assert(JoinView.maintain(spark, tv, ta, tb, "k").isEmpty)
  }

  test("a B-only delta is not dropped by A's current watermark") {
    // the bug class the combined cursor exists for: A unchanged, B
    // moves — a per-source primary writer id would replay-skip
    val (ta, tb, tv) = dirs()
    SnapshotTable.append(Seq((7, "xa")).toDF("k", "a"), ta)
    SnapshotTable.append(Seq((8, "yb")).toDF("k", "b"), tb)
    JoinView.maintain(spark, tv, ta, tb, "k") // bootstrap: empty join
    assert(SnapshotTable.read(spark, tv).count() == 0)
    SnapshotTable.append(Seq((7, "ymatch")).toDF("k", "b"), tb)
    assert(JoinView.maintain(spark, tv, ta, tb, "k").nonEmpty,
      "B-only delta must land")
    assert(SnapshotTable.read(spark, tv).as[(Int, String, String)]
      .collect().toSeq == Seq((7, "xa", "ymatch")))
  }

  test("both sides moving between refreshes counts the cross term once") {
    val (ta, tb, tv) = dirs()
    SnapshotTable.append(Seq((1, "a0")).toDF("k", "a"), ta)
    SnapshotTable.append(Seq((2, "b0")).toDF("k", "b"), tb)
    JoinView.maintain(spark, tv, ta, tb, "k")
    // ΔA and ΔB share key 5: the pair must appear exactly once
    SnapshotTable.append(Seq((5, "a1"), (2, "a2")).toDF("k", "a"), ta)
    SnapshotTable.append(Seq((5, "b1"), (1, "b2")).toDF("k", "b"), tb)
    JoinView.maintain(spark, tv, ta, tb, "k")
    val got = SnapshotTable.read(spark, tv)
      .as[(Int, String, String)].collect().toSeq
    val expected = Seq((5, "a1", "b1"), (2, "a2", "b0"), (1, "a0", "b2"))
    assert(got.sorted == expected.sorted, s"$got")
  }
}
