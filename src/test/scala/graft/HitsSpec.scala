package graft

import graft.core.GraphOps
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], iters: Int) =
    GraphOps.hits(edges.toDF("s", "d"), "s", "d", iters)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("hand-checked 2-iteration lattice on a 3-edge bipartite graph") {
    val edges = Seq(("s1", "d1"), ("s1", "d2"), ("s2", "d1"))
    // iter1: a(d1)=2e6/2e6=1e6, a(d2)=1e6*1e6/2e6=500000
    //        h(s1)=1.5e6 -> 1e6, h(s2)=1e6*1e6/1.5e6=666666
    val i1 = run(edges, 1)
    assert(i1(("auth", "d1")) == 1000000L && i1(("auth", "d2")) == 500000L)
    assert(i1(("hub", "s1")) == 1000000L && i1(("hub", "s2")) == 666666L)
    // iter2: a(d1)=1666666 -> 1e6, a(d2)=1e6*1e6/1666666=600000
    //        h(s1)=1600000 -> 1e6, h(s2)=1e6*1e6/1600000=625000
    val i2 = run(edges, 2)
    assert(i2(("auth", "d1")) == 1000000L && i2(("auth", "d2")) == 600000L)
    assert(i2(("hub", "s1")) == 1000000L && i2(("hub", "s2")) == 625000L)
  }

  test("duplicate edges collapse; partition-invariant; max always 1e6") {
    val edges = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"),
      ("c", "y"), ("c", "z"))
    val one = run(edges, 3)
    val rep = GraphOps.hits(edges.toDF("s", "d").repartition(5),
        "s", "d", 3)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(one == rep)
    assert(one.filter(_._1._1 == "hub").values.max == 1000000L)
    assert(one.filter(_._1._1 == "auth").values.max == 1000000L)
    // y has the most hub endorsements -> top authority
    val topAuth = one.collect { case (("auth", v), s) => v -> s }
      .maxBy(_._2)._1
    assert(topAuth == "y")
  }

  test("empty edge table fails loudly, not with an NPE") {
    val ex = intercept[IllegalArgumentException] {
      GraphOps.hits(Seq.empty[(String, String)].toDF("s", "d"),
        "s", "d", 2)
    }
    assert(ex.getMessage.contains("empty"))
  }
}
