package graft

import graft.expressions.RollingHash
import org.apache.spark.sql.Row

/** SQL-surface registration via GraftExtensions: the native
  * expressions must be callable from pure `spark.sql`, and agree with
  * their DataFrame/semantic-oracle forms.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash SQL function matches the Scala reference hash") {
    val got = spark.sql("SELECT rolling_hash('hello world') AS h")
      .head().getLong(0)
    assert(got == RollingHash.hash("hello world"))
  }

  test("dot_product SQL function: fold semantics and NULL on length mismatch") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       dot_product(array(1.0D), array(1.0D, 2.0D)) AS mism""".stripMargin)
      .head()
    assert(r.getDouble(0) == 32.0)
    assert(r.isNullAt(1))
  }

  test("shingles SQL function matches ShingleArray over a real column") {
    val df = Seq("the quick brown fox", "a b").toDF("text")
    df.createOrReplaceTempView("shingle_in")
    val got = spark.sql("SELECT shingles(text, 2) AS sh FROM shingle_in")
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      List("the quick", "quick brown", "brown fox"),
      List("a b")))
    // non-literal n is rejected with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT shingles(text, length(text)) FROM shingle_in").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("adc_score SQL function: lookup sum and NULL on bad code") {
    val r = spark.sql(
      """SELECT adc_score(array(1, 0), array(array(1.0D, 2.0D), array(3.0D, 4.0D))) AS s,
        |       adc_score(array(5), array(array(1.0D))) AS bad""".stripMargin)
      .head()
    assert(r.getDouble(0) == 5.0) // lut[0][1] + lut[1][0]
    assert(r.isNullAt(1))
  }

  test("pair_combinations SQL generator explodes unordered pairs") {
    val rows = spark.sql(
      """SELECT pair_combinations(array(
        |  named_struct('id', 1L), named_struct('id', 2L),
        |  named_struct('id', 3L)))""".stripMargin)
      .collect().toList
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).sorted ==
      List((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  // ---- table-valued SQL surface for the table-shaped operators ----

  test("chi2 table function from pure SQL matches the DataFrame API") {
    spark.range(200).selectExpr("id % 3 = 0 AS a", "id % 5 = 0 AS b")
      .createOrReplaceTempView("chi2_in")
    val sql = spark.sql("SELECT * FROM chi2('chi2_in', 'a', 'b')").collect()
    val api = graft.core.Eval.chiSquare(spark.table("chi2_in"),
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b")).collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("mann_whitney and log_rank table functions match the API") {
    spark.range(300).selectExpr(
      "id AS k", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS arm",
      "CAST((id * 37) % 100 AS BIGINT) AS v",
      "CAST(1 + id % 20 AS BIGINT) AS dur", "id % 3 = 0 AS death")
      .createOrReplaceTempView("mw_in")
    val mwSql = spark.sql(
      "SELECT * FROM mann_whitney('mw_in', 'k', 'arm', 'v', 'A', 'B')")
      .collect()
    val mwApi = graft.core.Eval.mannWhitneyU(spark.table("mw_in"),
      $"k", $"arm", $"v", "A", "B").collect()
    assert(mwSql.toSeq == mwApi.toSeq)
    val lrSql = spark.sql(
      "SELECT * FROM log_rank('mw_in', 'k', 'dur', 'death', 'arm = \\'A\\'')")
      .collect()
    val lrApi = graft.core.Eval.logRank(spark.table("mw_in"),
      $"k", $"dur", $"death", org.apache.spark.sql.functions.expr("arm = 'A'"))
      .collect()
    assert(lrSql.toSeq == lrApi.toSeq)
  }

  test("bm25_topk and retrieval_map table functions match the API") {
    Seq((1L, "spark shuffles data across the cluster"),
        (2L, "spark caches hot data in memory"),
        (3L, "ducks swim across the pond"),
        (4L, "the cluster shuffles spark data"))
      .toDF("doc_id", "text").createOrReplaceTempView("bm_docs")
    Seq((10L, "spark data"), (11L, "pond ducks"))
      .toDF("doc_id", "text").createOrReplaceTempView("bm_queries")
    val sql = spark.sql("SELECT * FROM bm25_topk('bm_docs', 'bm_queries', 3)")
    sql.createOrReplaceTempView("bm_ranked")
    val api = graft.core.Retrieval.bm25TopK(
      spark.table("bm_docs"), spark.table("bm_queries"), k = 3)
    assert(sql.collect().toSeq == api.collect().toSeq)
    Seq((10L, 1L), (10L, 2L), (11L, 3L))
      .toDF("query_id", "doc_id").createOrReplaceTempView("bm_rel")
    val mapSql = spark.sql(
      "SELECT * FROM retrieval_map('bm_ranked', 'bm_rel', 3)").collect()
    val mapApi = graft.core.Retrieval.mapAtK(api, spark.table("bm_rel"),
      k = 3).collect()
    assert(mapSql.toSeq == mapApi.toSeq)
  }

  test("longest_repeats table function matches the API") {
    Seq((1L, "a shared block of text right here"),
        (2L, "prefix a shared block of text right here suffix"),
        (3L, "something else entirely again"))
      .toDF("doc_id", "text").createOrReplaceTempView("lr_in")
    val sql = spark.sql(
      "SELECT * FROM longest_repeats('lr_in', 'doc_id', 'text', 3, 5)")
      .collect()
    val api = graft.core.SuffixArray.longestRepeats(
      spark.table("lr_in"), "doc_id", "text", minLen = 3, topK = 5)
      .collect()
    assert(sql.toSeq == api.toSeq)
    assert(sql.nonEmpty)
  }

  test("table functions reject non-literal arguments loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM chi2(concat('a', rand()), 'x', 'y')").collect()
    }
    assert(e.getMessage != null)
  }
}
