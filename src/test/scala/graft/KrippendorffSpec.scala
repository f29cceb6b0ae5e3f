package graft

import graft.core.Eval
import org.apache.spark.sql.functions._

class KrippendorffSpec extends SparkSpec {
  import spark.implicits._

  private def alpha(rows: Seq[(String, String)]) =
    Eval.krippendorffAlpha(rows.toDF("u", "c"), col("u"), col("c"))
      .as[(Long, Long, Long, Option[Long])].collect().head

  test("hand-checked alpha = 0.5 (textbook coincidence algebra)") {
    // u1 [a,a], u2 [a,b], u3 [b,b,b], u4 [a] (dropped, one rating)
    val got = alpha(Seq(("u1", "a"), ("u1", "a"), ("u2", "a"),
      ("u2", "b"), ("u3", "b"), ("u3", "b"), ("u3", "b"), ("u4", "a")))
    // Do = 2/7, De = 24/42 -> alpha = 0.5 exactly
    assert(got == ((3L, 7L, 2L, Some(500000L))))
  }

  test("perfect agreement = 1e6; single-label data = NULL (De = 0)") {
    val perfect = alpha(Seq(("u1", "a"), ("u1", "a"),
      ("u2", "b"), ("u2", "b")))
    assert(perfect._4 == Some(1000000L))
    val degenerate = alpha(Seq(("u1", "a"), ("u1", "a"),
      ("u2", "a"), ("u2", "a")))
    assert(degenerate._4.isEmpty)
  }

  test("systematic disagreement goes negative; partition-invariant") {
    // every unit [a, b]: Do = 1, De < 1 -> alpha < 0
    val rows = (1 to 10).flatMap(i => Seq((s"u$i", "a"), (s"u$i", "b")))
    val got = alpha(rows)
    assert(got._4.exists(_ < 0L), got.toString)
    val rep = Eval.krippendorffAlpha(rows.toDF("u", "c").repartition(7),
        col("u"), col("c"))
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(rep == got)
  }

  test("a unit above maxRatings fails loudly") {
    val rows = (1 to 11).map(i => ("u1", s"l$i")) :+ (("u2", "a")) :+
      (("u2", "b"))
    val e = intercept[Exception] {
      alpha(rows)
    }
    assert(e.getMessage.contains("ratings") || e.getCause != null)
  }
}
