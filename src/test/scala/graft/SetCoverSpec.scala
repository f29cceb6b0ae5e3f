package graft

import graft.core.Sampling

class SetCoverSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(String, String)], k: Int, parts: Int = 1) = {
    val df = pairs.toDF("s", "e")
    Sampling.greedySetCover(
      if (parts > 1) df.repartition(parts) else df, "s", "e", k)
      .as[(Long, String, Long, Long)].collect().toSeq
  }

  test("hand-checked greedy: marginal gains, not raw sizes") {
    // A = {1,2,3,4}, B = {3,4,5}, C = {5,6}; greedy: A(4), C(2), B(0->drop)
    val pairs = Seq(
      ("A", "1"), ("A", "2"), ("A", "3"), ("A", "4"),
      ("B", "3"), ("B", "4"), ("B", "5"),
      ("C", "5"), ("C", "6"))
    val got = run(pairs, 3)
    assert(got == Seq((1L, "A", 4L, 4L), (2L, "C", 2L, 6L)))
    // B never picked: after A and C its marginal gain is zero
    // (universe exhausted -> the loop stops at 2 steps)
  }

  test("tie-break on equal gain goes to the smaller set id") {
    val pairs = Seq(("Z", "1"), ("Z", "2"), ("M", "3"), ("M", "4"))
    val got = run(pairs, 2)
    assert(got.head._2 == "M" && got(1)._2 == "Z")
  }

  test("duplicate pairs collapse; partition-invariant") {
    val pairs = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "y"),
      ("B", "z"))
    val a = run(pairs, 2)
    val b = run(pairs, 2, parts = 5)
    assert(a == b)
    assert(a == Seq((1L, "A", 2L, 2L), (2L, "B", 1L, 3L)))
  }
}
