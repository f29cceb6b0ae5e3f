package graft

import graft.core.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val T = 1000000000000L // initPico

  test("pageRank: hand-computed path graph a-b-c, one iteration") {
    // undirected path: deg a=1, b=2, c=1; after one step
    //   r(a) = 0.15T + 85*(T/2)//100   = 575e9
    //   r(b) = 0.15T + 85*(T+T)//100   = 1850e9
    //   r(c) = r(a)
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val got = GraphOps.pageRank(e, "src", "dst", iters = 1)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 575000000000L, "b" -> 1850000000000L,
      "c" -> 575000000000L))
  }

  test("pageRank: symmetric regular graph is a fixed point at full mass") {
    // isolated undirected pair: each vertex receives exactly its
    // neighbor's full mass -> 0.15T + 0.85T = T forever
    val e = Seq(("x", "y"), ("y", "x")).toDF("src", "dst")
    val got = GraphOps.pageRank(e, "src", "dst", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> T, "y" -> T))
  }

  test("pageRank: duplicate and self edges are ignored") {
    val e = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "a"))
      .toDF("src", "dst")
    val got = GraphOps.pageRank(e, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> T, "b" -> T)) // reduces to the x-y pair
  }

  test("pageRank: hub dominates leaves, deterministic across partitioning") {
    // star: hub h connected to l1..l4 (symmetrized)
    val leaves = (1 to 4).map(i => s"l$i")
    val e = (leaves.map(("h", _)) ++ leaves.map((_, "h"))).toDF("src", "dst")
    val r1 = GraphOps.pageRank(e, "src", "dst", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(leaves.forall(l => r1("h") > r1(l)))
    assert(leaves.map(r1).distinct.size == 1) // leaves symmetric
    val r2 = GraphOps.pageRank(e.repartition(7), "src", "dst", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(r1 == r2)
  }

  test("labelPropagate: chain depth, tie to smallest label, seed immunity") {
    // b's neighbors are seeds 1 and 2 -> tie -> label 1;
    // chain a(7) <- b2 <- c2 needs TWO rounds to reach c2;
    // seed s keeps its label against contradicting neighbors
    val edges = Seq(
      ("b", "a1"), ("b", "a2"),          // tie case
      ("b2", "a7"), ("c2", "b2"),        // 2-hop chain
      ("s", "a1"), ("s", "a2")           // seed under pressure
    ).toDF("v", "u")
    val seeds = Seq(("a1", 1L), ("a2", 2L), ("a7", 7L), ("s", 9L))
      .toDF("sv", "sl")
    def run(iters: Int) =
      GraphOps.labelPropagate(edges, "v", "u", seeds, "sv", "sl", iters)
        .select("v", "lbl").as[(String, Option[Long])].collect().toMap
    val one = run(1)
    assert(one("b").contains(1L))   // tie -> smallest label
    assert(one("b2").contains(7L))
    assert(one("c2").isEmpty)       // b2 was unlabeled when c2 voted
    assert(one("s").contains(9L))   // seed never moves
    val two = run(2)
    assert(two("c2").contains(7L))  // second round reaches the chain end
    assert(two("s").contains(9L))
  }

  test("textrankKeywords: connectives outrank leaves; ties break lexically") {
    // the/sat each touch {cat,dog,cow}; the graph is symmetric under
    // the<->sat and cat<->dog<->cow, so ranks 1-2 are the tied
    // connectives (lex order: sat before the) and rank 3 is 'cat'
    val docs = Seq("the cat sat", "the dog sat", "the cow sat")
      .toDF("text")
    val got = GraphOps.textrankKeywords(docs, "text", iters = 5, k = 3)
      .select("rank", "token", "score_pico")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq((1L, "sat"), (2L, "the"), (3L, "cat")))
    assert(got(0)._3 == got(1)._3)              // symmetric tie
    assert(got.map(_._3).sorted.reverse == got.map(_._3))
  }

  test("triangleStats: K4 census; star + one closing edge; input " +
      "canonicalization") {
    // complete graph on 4 vertices: 6 edges, Sum d(d-1)/2 = 4*3 = 12
    // wedges, C(4,3) = 4 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    assert(GraphOps.triangleStats(k4, "a", "b")
      .as[(Long, Long, Long)].head() == ((6L, 12L, 4L)))

    // hub star 0-{1..5} has wedges but no triangles; closing 1-2
    // makes exactly one, found at the LOW-degree apex (1 or 2), which
    // is what the degree orientation guarantees cheap on hubs
    val star = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    assert(GraphOps.triangleStats(star, "a", "b")
      .as[(Long, Long, Long)].head() == ((5L, 10L, 0L)))
    val closed = star.unionByName(Seq((1L, 2L)).toDF("a", "b"))
    val (e, w, t) = GraphOps.triangleStats(closed, "a", "b")
      .as[(Long, Long, Long)].head()
    assert((e, t) == ((6L, 1L)))
    // wedges: deg 0->5, 1->2, 2->2 others 1: 10 + 1 + 1 = 12
    assert(w == 12L)

    // duplicate rows and a>b rows must not double-count: same K4 fed
    // as duplicated non-canonical edges
    val messy = k4.select(col("b").as("a"), col("a").as("b"))
      .unionByName(k4).unionByName(k4)
    assert(GraphOps.triangleStats(messy, "a", "b")
      .as[(Long, Long, Long)].head() == ((6L, 12L, 4L)))
  }

  test("kCore: a path dissolves round by round, a triangle survives") {
    // path 1-2-3-4-5 + triangle 10-11-12, k = 2: each peel round
    // strips only the CURRENT degree-1 endpoints, so one round still
    // leaves the path's middle — proving the iteration matters
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val one = GraphOps.kCore(g, "a", "b", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(one.keySet == Set(2L, 3L, 4L, 10L, 11L, 12L),
      s"round 1 keeps the path middle: ${one.keySet}")
    val full = GraphOps.kCore(g, "a", "b", k = 2, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(full == Map(10L -> 2L, 11L -> 2L, 12L -> 2L),
      s"only the triangle is a 2-core: $full")
  }

  test("kCore: clique survives at its degree; gate rounds reach the fixpoint") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val core = GraphOps.kCore(k4, "a", "b", k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // the gate's fixed 6 rounds must BE the fixpoint on the gate
    // corpus (sf0.001 co-purchase graph): round 7 adds nothing
    val basket = Tables.load(spark, Sf0001, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = basket.as("x").join(basket.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
    val edges = pairs.groupBy("a", "b").agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2).select("a", "b")
    val r6 = GraphOps.kCore(edges, "a", "b", k = 2, rounds = 6)
      .as[(Long, Long)].collect().toSet
    val r7 = GraphOps.kCore(edges, "a", "b", k = 2, rounds = 7)
      .as[(Long, Long)].collect().toSet
    assert(r6 == r7 && r6.nonEmpty, s"fixpoint at 6 rounds: ${r6.size}")
  }

  test("negativeEdges: never true edges or self-loops, <= k per " +
      "positive in draw order, partition invariant") {
    // a 5-vertex graph: triangle 1-2-3 plus edges 3-4, 4-5
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val neg = GraphOps.negativeEdges(g, "a", "b", k = 2, candidates = 12)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val edgeSet = Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    neg.foreach { case (a, b, _, v) =>
      assert(v != a && v != b, s"self-ish draw survived: ($a,$b)->$v")
      val p = (math.min(a, v), math.max(a, v))
      assert(!edgeSet.contains(p), s"true edge sampled as negative: $p")
      assert((1L to 5L).contains(v), "draws come from the vertex set")
    }
    val perEdge = neg.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3))
    perEdge.foreach { case (e, is) =>
      assert(is.size <= 2, s"$e got ${is.size} negatives")
      assert(is == is.sorted, s"$e negatives not in draw order")
    }
    // deterministic across partitioning
    val again = GraphOps.negativeEdges(g.repartition(7), "a", "b",
      k = 2, candidates = 12)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(again.toSet == neg.toSet)
  }

  test("adamicAdar: hand-checked wedge scores on the 4-cycle + chord") {
    // edges: 1-2, 1-3, 2-3, 2-4, 3-4. deg(1)=2, deg(2)=3, deg(3)=3,
    // deg(4)=2. AA(1,4) = 1/ln3 + 1/ln3 (centers 2 and 3), non-edge.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val aa = GraphOps.adamicAdar(e, "a", "b")
      .select("a", "b", "n_common", "aa_micro", "is_edge")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // round(1e6/ln 3) = 910239 per center
    assert(aa((1L, 4L)) == ((2L, 1820478L, false)))
    // AA(1,2): common neighbor {3} only
    assert(aa((1L, 2L)) == ((1L, 910239L, true)))
    // AA(2,3): common neighbors {1, 4}, both deg 2: round(1e6/ln 2)*2
    assert(aa((2L, 3L)) == ((2L, 2885390L, true)))
  }

  test("adamicAdar: maxDeg cap drops hub centers, keeps exact survivors") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    // cap 2 removes centers 2 and 3 (deg 3); only deg-2 centers 1 and
    // 4 generate wedges -> single surviving pair (2,3) via both
    val capped = GraphOps.adamicAdar(e, "a", "b", maxDeg = 2)
      .select("a", "b", "n_common", "aa_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == Set((2L, 3L, 2L, 2885390L)))
  }

  test("adamicAdar: duplicate/reversed input edges collapse first") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L))
      .toDF("a", "b")
    // clean triangle: every pair's only common neighbor is the third
    // vertex with deg 2
    val out = GraphOps.adamicAdar(e, "a", "b")
      .select("a", "b", "n_common", "aa_micro", "is_edge")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 2L, 1L, 1442695L, true),
      (1L, 3L, 1L, 1442695L, true),
      (2L, 3L, 1L, 1442695L, true)))
  }
}
