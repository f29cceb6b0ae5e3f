package graft

import graft.core.TimeSeries
import org.apache.spark.sql.functions._

class MannKendallSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(String, Int, Long)]) =
    TimeSeries.mannKendall(rows.toDF("k", "o", "v"), "k", "o", "v")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("hand-checked: strict increase is significant, flat/short are not") {
    val rows =
      (1 to 5).map(i => ("up", i, i.toLong * 10)) ++      // S=10
      (1 to 5).map(i => ("flat", i, 7L)) ++               // S=0, var18=0
      Seq(("tiny", 1, 1L), ("tiny", 2, 2L))               // S=1, |S|<=1
    val got = mk(rows)
    // up: S=10, var18 = 5*4*15 = 300; (9^2)*18*625 = 911250 > 720300
    assert(got("up") == (("up", 5L, 10L, 300L, true)))
    assert(got("flat") == (("flat", 5L, 0L, 0L, false)))
    assert(got("tiny") == (("tiny", 2L, 1L, 18L, false)))
  }

  test("ties correct the variance; alternating series not significant") {
    // values 1,1,2,2: S = 4 (pairs across tie groups), tie term =
    // 2*[2*1*9] = 36, var18 = 4*3*13 - 36 = 120
    val got = mk(Seq(("t", 1, 1L), ("t", 2, 1L), ("t", 3, 2L),
      ("t", 4, 2L)))
    assert(got("t") == (("t", 4L, 4L, 120L, false)))
    val alt = mk((1 to 10).map(i =>
      ("a", i, if (i % 2 == 0) 10L else 20L)))
    assert(!alt("a")._5)
  }

  test("partition-invariant; matches a brute-force S on random data") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 60).map(i => ("r", i, rnd.nextInt(40).toLong))
    val got = mk(rows)("r")
    val vs = rows.map(_._3)
    val brute = (for {
      i <- vs.indices; j <- (i + 1) until vs.size
    } yield java.lang.Long.signum(vs(j) - vs(i)).toLong).sum
    assert(got._3 == brute)
    val rep = TimeSeries.mannKendall(
        rows.toDF("k", "o", "v").repartition(7), "k", "o", "v")
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(rep == got)
  }
}
