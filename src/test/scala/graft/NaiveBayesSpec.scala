package graft

import graft.ml.NaiveBayes
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def floorMicro(x: Double): Long =
    math.floor(math.log(x) * 1e6).toLong

  test("train: hand-checked smoothed log-probs and priors") {
    // label a: "x x y" (T=3), label b: "z z y" (T=3), V=3
    val docs = Seq(("a", "x x y"), ("b", "z z y")).toDF("l", "t")
    val m = NaiveBayes.train(docs, col("l"), col("t"))
    val lp = m.termLogProb.as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(lp(("a", "x")) == floorMicro(3.0 / 6.0)) // (2+1)/(3+3)
    assert(lp(("a", "y")) == floorMicro(2.0 / 6.0))
    assert(lp(("b", "z")) == floorMicro(3.0 / 6.0))
    val lab = m.labels.as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(lab("a") == ((floorMicro(0.5), floorMicro(1.0 / 6.0))))
    assert(lab("b") == ((floorMicro(0.5), floorMicro(1.0 / 6.0))))
  }

  test("predict: argmax picks the generating class; unseen terms fall " +
      "to the per-label default; exact tie breaks to smallest label") {
    val docs = Seq(("a", "x x y"), ("b", "z z y")).toDF("l", "t")
    val m = NaiveBayes.train(docs, col("l"), col("t"))
    val test = Seq((1L, "x x"), (2L, "z"), (3L, "y"), (4L, "w w w"))
      .toDF("id", "t")
    val got = NaiveBayes.predict(m, test, "id", col("t"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(1L) == "a" && got(2L) == "b")
    // "y" scores identically under both labels -> smallest label wins;
    // "w" is unseen everywhere -> equal defaults -> same tie-break
    assert(got(3L) == "a" && got(4L) == "a")
  }

  test("predict: score_micro is the exact integer sum prior + Σ tf·lp") {
    val docs = Seq(("a", "x x y"), ("b", "z z y")).toDF("l", "t")
    val m = NaiveBayes.train(docs, col("l"), col("t"))
    val got = NaiveBayes.predict(m, Seq((1L, "x x w")).toDF("id", "t"),
        "id", col("t"))
      .as[(Long, String, Long)].head()
    // under a: prior ln(1/2) + 2·ln(3/6) + 1·default ln(1/6)
    val expected = floorMicro(0.5) + 2 * floorMicro(0.5) +
      floorMicro(1.0 / 6.0)
    assert(got._2 == "a" && got._3 == expected, s"$got")
  }

  test("predict: partition invariant and deterministic on a larger " +
      "synthetic corpus") {
    val docs = spark.range(300).selectExpr(
      "CASE WHEN id % 3 = 0 THEN 'news' WHEN id % 3 = 1 THEN 'web' " +
        "ELSE 'forum' END AS l",
      "concat('w', id % 17, ' w', id % 7, ' w', id % 29) AS t")
    val m = NaiveBayes.train(docs, col("l"), col("t"))
    val test = spark.range(100).selectExpr("id",
      "concat('w', id % 13, ' w', id % 5) AS t")
    val a = NaiveBayes.predict(m, test, "id", col("t"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    val m2 = NaiveBayes.train(docs.repartition(7), col("l"), col("t"))
    val b = NaiveBayes.predict(m2, test.repartition(5), "id", col("t"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == 100)
  }
}
