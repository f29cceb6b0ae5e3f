package graft

import graft.core.Recommend
import org.apache.spark.sql.functions._

/** Item-item CF: hand-checked cosine algebra, support threshold,
  * ownership filter, deterministic ranks.
  */
class RecommendSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: sims, support cut, ownership filter, scores") {
    // u1 {A,B}, u2 {A,B,C}, u3 {B,C}: common(A,B)=2, common(B,C)=2,
    // common(A,C)=1 (dies at support 2). |A|=2 |B|=3 |C|=2 ->
    // sim(A,B) = sim(B,C) = 2/(sqrt(2)*sqrt(3)) = 816497 micro
    val ui = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "B"), (3L, "C")).toDF("u", "it")
    val sims = Recommend.itemItemSim(ui, "u", "it", minSupport = 2L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(sims == Set(("A", "B", 2L, 816497L), ("B", "C", 2L, 816497L)),
      s"$sims")
    val panel = Seq(1L, 2L, 3L).toDF("u")
    val recs = Recommend.recommendTopK(ui, Recommend.itemItemSim(
        ui, "u", "it", 2L), panel, "u", "it", k = 5)
      .as[(Long, Long, String, Long, Long)].collect().toSet
    // u1 gets C through its B link; u3 gets A through B; u2 owns all
    assert(recs == Set((1L, 1L, "C", 816497L, 1L),
      (3L, 1L, "A", 816497L, 1L)), s"$recs")
  }

  test("scores sum links from multiple owned items; ranks break ties by id") {
    // u owns A and B; X links to both (sum), Y links only to A
    val ui = Seq(
      (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "X"), (3L, "A"), (3L, "X"),   // common(A,X)=2
      (4L, "B"), (4L, "X"), (5L, "B"), (5L, "X"),   // common(B,X)=2
      (6L, "A"), (6L, "Y"), (7L, "A"), (7L, "Y"))   // common(A,Y)=2
      .toDF("u", "it")
    val sims = Recommend.itemItemSim(ui, "u", "it", 2L)
    val recs = Recommend.recommendTopK(ui, sims, Seq(1L).toDF("u"),
        "u", "it", k = 5)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._2).toSeq
    assert(recs.head._3 == "X" && recs.head._5 == 2L,
      s"X must rank first with two links: $recs")
    assert(recs(1)._3 == "Y" && recs(1)._5 == 1L, s"$recs")
    assert(recs.head._4 > recs(1)._4, "summed links outscore one link")
  }
}
