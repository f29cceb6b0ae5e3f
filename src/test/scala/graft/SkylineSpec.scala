package graft

import graft.core.Skyline
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def frontier(rows: Seq[(Long, Long, Long)], parts: Int = 1) = {
    val df = rows.toDF("id", "x", "y")
    Skyline.skyline2d(if (parts > 1) df.repartition(parts) else df,
      col("id"), col("x"), col("y"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def brute(rows: Seq[(Long, Long, Long)]) =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx <= x && by >= y && (bx < x || by > y)
      }
    }.toSet

  test("hand-checked staircase with ties on both dims") {
    // frontier: (1,1,5), (2,3,8); (3,3,8) tie kept; dominated: rest
    val rows = Seq(
      (1L, 1L, 5L), (2L, 3L, 8L), (3L, 3L, 8L),
      (4L, 3L, 7L),   // same x, lower y -> dominated
      (5L, 2L, 4L),   // dominated by (1,1,5)
      (6L, 9L, 8L))   // same y as (2), higher x -> dominated
    assert(frontier(rows) == Set((1L, 1L, 5L), (2L, 3L, 8L), (3L, 3L, 8L)))
    assert(frontier(rows) == brute(rows))
  }

  test("matches brute force on random points, partition-invariant") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map(i =>
      (i.toLong, rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val exp = brute(rows)
    assert(frontier(rows) == exp)
    assert(frontier(rows, parts = 17) == exp)
    assert(exp.nonEmpty)
  }

  test("monotone chain: every point undominated") {
    val rows = (1 to 20).map(i => (i.toLong, i.toLong, i.toLong))
    assert(frontier(rows) == rows.toSet)
  }
}
