package graft

import graft.core.TimeSeries
import org.apache.spark.sql.functions._

class IntervalIslandsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], parts: Int = 1) = {
    val df = rows.toDF("k", "s", "e")
    TimeSeries.intervalIslands(
      if (parts > 1) df.repartition(parts) else df,
      "k", col("s"), col("e"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("hand-checked: overlap, touch, containment, gap") {
    val got = run(Seq(
      ("u", 0L, 10L), ("u", 5L, 15L),   // overlap -> island [0,15]
      ("u", 15L, 20L),                  // touch merges -> [0,20]
      ("u", 30L, 40L), ("u", 32L, 35L), // containment -> [30,40]
      ("u", 50L, 50L)))                 // zero-length point island
    // islands: [0,20], [30,40], [50,50]; covered 20+10+0=30; span 50
    assert(got("u") == ((6L, 3L, 30L, 20L)))
  }

  test("negative duration clamps to a point; per-key independence") {
    val got = run(Seq(
      ("a", 10L, 3L),                   // clamped to [10,10]
      ("a", 20L, 25L),
      ("b", 0L, 100L)))
    assert(got("a") == ((2L, 2L, 5L, 10L)))  // [10,10] + [20,25]
    assert(got("b") == ((1L, 1L, 100L, 0L)))
  }

  test("matches a brute-force sweep on random intervals; partition-invariant") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 400).map { _ =>
      val s = rnd.nextInt(1000).toLong
      ("u", s, s + rnd.nextInt(30).toLong)
    }
    // brute force: mark covered integer cells on [s, e)
    val covered = Array.fill(1100)(false)
    rows.foreach { case (_, s, e) =>
      (s until e).foreach(i => covered(i.toInt) = true) }
    val expCovered = covered.count(identity).toLong
    // islands = maximal covered runs intersecting the data
    val got = run(rows)("u")
    assert(got._3 == expCovered, s"covered ${got._3} vs $expCovered")
    assert(run(rows, parts = 13)("u") == got)
  }
}
