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
}
