package graft

import graft.core.Eval
import org.apache.spark.sql.functions._

class RougeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: clipped n-gram overlap with multiplicity. */
  private def brute(cand: String, ref: String, n: Int)
      : (Long, Long, Long, Long, Long, Long) = {
    def gs(t: String): Seq[String] = {
      val toks = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      if (toks.size < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    val (c, r) = (gs(cand), gs(ref))
    val cm = c.groupBy(identity).view.mapValues(_.size).toMap
    val rm = r.groupBy(identity).view.mapValues(_.size).toMap
    val m = cm.map { case (g, k) => math.min(k, rm.getOrElse(g, 0)) }.sum
      .toLong
    val (ct, rt) = (c.size.toLong, r.size.toLong)
    (m, ct, rt,
      if (ct > 0) m * 1000000L / ct else 0L,
      if (rt > 0) m * 1000000L / rt else 0L,
      if (ct + rt > 0) 2 * m * 1000000L / (ct + rt) else 0L)
  }

  private def run(pairs: Seq[(Long, String, String)], n: Int) =
    Eval.rougeN(pairs.toDF("id", "cand", "ref"), "id",
        col("cand"), col("ref"), n)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("hand case: rouge-1 and rouge-2 with repeats clip correctly") {
    // "the the the" vs "the cat": rouge-1 matches clip at ref count 1
    val pairs = Seq(
      (1L, "the the the", "the cat"),
      (2L, "police killed the gunman", "the gunman was killed by police"),
      (3L, "identical short text", "identical short text"))
    val r1 = run(pairs, 1)
    assert(r1(1L) == ((1L, 3L, 2L, 333333L, 500000L, 400000L)))
    assert(r1(3L) == ((3L, 3L, 3L, 1000000L, 1000000L, 1000000L)))
    pairs.foreach { case (id, c, r) =>
      assert(r1(id) == brute(c, r, 1), s"r1 pair $id")
    }
    val r2 = run(pairs, 2)
    pairs.foreach { case (id, c, r) =>
      assert(r2(id) == brute(c, r, 2), s"r2 pair $id")
    }
    // pair 2 rouge-2: cand bigrams {police killed, killed the,
    // the gunman}; ref has {the gunman} -> m=1, c=3, r=5
    assert(r2(2L)._1 == 1L && r2(2L)._2 == 3L && r2(2L)._3 == 5L)
  }

  test("edges: blank candidate, too-short sides, disjoint texts " +
      "all emit zero ratios (never NULL); brute parity") {
    val pairs = Seq(
      (1L, "", "some reference text here"),
      (2L, "one", "two words"),          // cand shorter than n=2
      (3L, "alpha beta", "gamma delta"), // disjoint
      (4L, "  ", ""))
    val got = run(pairs, 2)
    pairs.foreach { case (id, c, r) =>
      assert(got(id) == brute(c, r, 2), s"pair $id")
    }
    assert(got.values.forall(v => v._4 >= 0L && v._5 >= 0L && v._6 >= 0L))
    assert(got(3L) == ((0L, 1L, 1L, 0L, 0L, 0L)))
  }

  /** Reference BLEU components: clipped matches per order, corpus-
    * summed.
    */
  private def bruteBleu(pairs: Seq[(Long, String, String)], maxN: Int)
      : Map[Long, (Long, Long)] = {
    def gs(t: String, n: Int): Seq[String] = {
      val toks = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      if (toks.size < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    (1 to maxN).map { n =>
      val (m, c) = pairs.map { case (_, cand, ref) =>
        val cm = gs(cand, n).groupBy(identity).view.mapValues(_.size)
        val rm = gs(ref, n).groupBy(identity).view.mapValues(_.size)
          .toMap
        (cm.map { case (g, k) => math.min(k, rm.getOrElse(g, 0)) }.sum,
          gs(cand, n).size)
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      n.toLong -> ((m.toLong, c.toLong))
    }.toMap
  }

  test("bleuComponents: clipped per-order corpus counts match brute " +
      "force; lengths skip blanks; missing orders emit zero rows") {
    val pairs = Seq(
      (1L, "the cat the cat on the mat", "the cat is on the mat"),
      (2L, "one", "one two three"),
      (3L, "", "nonempty reference"))
    val got = Eval.bleuComponents(pairs.toDF("id", "cand", "ref"), "id",
        col("cand"), col("ref"), maxN = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val exp = bruteBleu(pairs, 4)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    (1L to 4L).foreach { n =>
      assert((got(n)._1, got(n)._2) == exp(n), s"order $n")
    }
    // lengths: 7+1+0 candidate tokens, 6+3+2 reference tokens
    assert(got(1L)._3 == 8L && got(1L)._4 == 11L)
    // order 4: pair-1 cand has 4-grams but none match; pair-2/3 none
    assert(got(4L)._1 == 0L && got(4L)._2 == 4L)
  }

  /** Reference LCS: classic full-matrix DP over whitespace tokens. */
  private def bruteLcs(cand: String, ref: String): (Long, Long, Long) = {
    def tk(t: String) = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val (a, b) = (tk(cand), tk(ref))
    val dp = Array.ofDim[Int](a.size + 1, b.size + 1)
    for (i <- 1 to a.size; j <- 1 to b.size)
      dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
                 else math.max(dp(i - 1)(j), dp(i)(j - 1))
    (dp(a.size)(b.size).toLong, a.size.toLong, b.size.toLong)
  }

  private def runL(pairs: Seq[(Long, String, String)]) =
    Eval.rougeL(pairs.toDF("id", "cand", "ref"), "id",
        col("cand"), col("ref"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("rougeL: hand cases — subsequence beats bigram on reordered " +
      "text; repeats; identity") {
    val pairs = Seq(
      // classic Lin example: "police killed the gunman" vs
      // "the gunman was killed by police" — LCS = 2 ("killed ..."?
      // longest in-order chain is {the, gunman} or {killed, ...}):
      // cand order (police, killed, the, gunman); ref order
      // (the, gunman, was, killed, by, police) -> LCS = 2
      (1L, "police killed the gunman", "the gunman was killed by police"),
      (2L, "the cat the cat", "the cat"),
      (3L, "identical short text", "identical short text"))
    val got = runL(pairs)
    pairs.foreach { case (id, c, r) =>
      val (l, ct, rt) = bruteLcs(c, r)
      val exp = (l, ct, rt,
        if (ct > 0) l * 1000000L / ct else 0L,
        if (rt > 0) l * 1000000L / rt else 0L,
        if (ct + rt > 0) 2 * l * 1000000L / (ct + rt) else 0L)
      assert(got(id) == exp, s"pair $id")
    }
    assert(got(1L)._1 == 2L)
    assert(got(2L) == ((2L, 4L, 2L, 500000L, 1000000L, 666666L)))
    assert(got(3L)._6 == 1000000L)
  }

  test("rougeL: edges — blank sides give zero ratios (never NULL); " +
      "brute parity on a generated corpus; partition invariance") {
    val edge = Seq(
      (1L, "", "some reference text here"),
      (2L, "one", "two words"),
      (3L, "alpha beta", "gamma delta"),
      (4L, "  ", ""))
    val ge = runL(edge)
    edge.foreach { case (id, c, r) =>
      val (l, ct, rt) = bruteLcs(c, r)
      assert((ge(id)._1, ge(id)._2, ge(id)._3) == ((l, ct, rt)), s"p $id")
    }
    assert(ge(1L) == ((0L, 0L, 4L, 0L, 0L, 0L)))
    assert(ge(4L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    val pairs = (1L to 40L).map { i =>
      val words = (0 until (4 + (i % 9)).toInt)
        .map(j => s"w${(i * 7 + j * 3) % 13}")
      val ref = words.mkString(" ")
      // drop a prefix AND shuffle a tail pair so LCS < min(c, r)
      val cand = (words.drop((i % 3).toInt).reverse).mkString(" ")
      (i, cand, ref)
    }
    val got = runL(pairs)
    pairs.foreach { case (id, c, r) =>
      val (l, ct, rt) = bruteLcs(c, r)
      assert((got(id)._1, got(id)._2, got(id)._3) == ((l, ct, rt)),
        s"pair $id")
    }
    val rep = Eval.rougeL(pairs.toDF("id", "cand", "ref")
        .repartition(7), "id", col("cand"), col("ref"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(rep == got)
  }

  test("brute parity on a generated corpus; partition invariance") {
    val pairs = (1L to 30L).map { i =>
      val words = (0 until (5 + (i % 7)).toInt)
        .map(j => s"w${(i * 3 + j * 5) % 11}")
      val ref = words.mkString(" ")
      val cand = words.drop((i % 3).toInt).mkString(" ")
      (i, cand, ref)
    }
    val got = run(pairs, 2)
    pairs.foreach { case (id, c, r) =>
      assert(got(id) == brute(c, r, 2), s"pair $id")
    }
    val rep = Eval.rougeN(pairs.toDF("id", "cand", "ref")
        .repartition(7), "id", col("cand"), col("ref"), 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(rep == got)
  }

  test("row-local TokenGramMatches edges (r16 rewrite): NULL text " +
      "keeps the relational null semantics; empty corpus emits zero " +
      "bleu rows") {
    // NULL cand/ref: the old explode path emitted no grams and the
    // CASE totals fell to 0 — the rewrite must coalesce identically
    val pairs = Seq(
      (1L, null.asInstanceOf[String], "some reference text"),
      (2L, "a candidate here", null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String]),
      (4L, "both sides live", "both sides live"))
    val got = run(pairs.map(p => (p._1, p._2, p._3)), 2)
    assert(got(1L) == ((0L, 0L, 2L, 0L, 0L, 0L)))
    assert(got(2L) == ((0L, 2L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(4L) == ((2L, 2L, 2L, 1000000L, 1000000L, 1000000L)))
    val bc = Eval.bleuComponents(pairs.toDF("id", "cand", "ref"), "id",
      col("cand"), col("ref"), maxN = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(bc.map(_._1).toSet == Set(1L, 2L))
    // empty input: zero rows, not maxN null rows (the old orders-join
    // contract)
    val empty = Eval.bleuComponents(
      Seq.empty[(Long, String, String)].toDF("id", "cand", "ref"), "id",
      col("cand"), col("ref"), maxN = 4)
    assert(empty.count() == 0L)
  }
}
