package graft

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._
import graft.core.TextAnalysis
import graft.expressions.RollingHash

/** The native codegen RollingHash expression vs its built-ins-only
  * (HOF) formulation and the scalar reference.
  */
class RollingHashExprSpec extends SparkSpec {
  import spark.implicits._

  test("native expression == HOF formulation on real document text") {
    val docs = Tables.documents(spark, Sf0001)
    val mismatches = docs
      .withColumn("a", TextAnalysis.rollingHash($"text"))
      .withColumn("b", TextAnalysis.rollingHashHof($"text"))
      .filter($"a" =!= $"b")
      .count()
    assert(mismatches == 0L)
  }

  test("scalar semantics: empty, ascii, unicode codepoints") {
    assert(RollingHash.hash("") == 0L)
    assert(RollingHash.hash("a") == 97L)
    assert(RollingHash.hash("ab") == 97L * 31 + 98)
    // astral codepoint counts once, as its codepoint value
    val g = "😀" // U+1F600
    assert(RollingHash.hash(g) == 0x1F600L)
  }

  test("native ShingleArray == HOF formulation on real document text") {
    val docs = Tables.documents(spark, Sf0001)
    val mismatches = docs
      .withColumn("a", graft.core.Dedup.shingles($"text", 3))
      .withColumn("b", graft.core.Dedup.shinglesHof($"text", 3))
      .filter(!($"a" <=> $"b"))
      .count()
    assert(mismatches == 0L)
    // short-text edge cases: fewer tokens than n, single token
    val edge = Seq("one two", "solo", " padded  spaces ").toDF("text")
    val pairs = edge.select(graft.core.Dedup.shingles($"text", 3).as("a"),
      graft.core.Dedup.shinglesHof($"text", 3).as("b")).collect()
    pairs.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r))
  }

  test("native non-distinct ShingleArray == HOF formulation, order included") {
    val docs = Tables.documents(spark, Sf0001)
    val mismatches = docs
      .withColumn("a", TextAnalysis.ngramsAll($"text", 2))
      .withColumn("b", TextAnalysis.ngramsAllHof($"text", 2))
      .filter(!($"a" <=> $"b"))
      .count()
    assert(mismatches == 0L)
    val edge = Seq("spam spam spam", "solo", "one two").toDF("text")
      .select(TextAnalysis.ngramsAll($"text", 2).as("a")).as[Seq[String]].collect()
    assert(edge(0) == Seq("spam spam", "spam spam")) // duplicates kept
    assert(edge(1) == Seq("solo"))
    assert(edge(2) == Seq("one two"))
  }

  test("SQL registration: graft_rolling_hash usable from spark.sql") {
    GraftShim.registerFunction(spark, "graft_rolling_hash",
      exprs => RollingHash(exprs.head))
    val r = spark.sql("SELECT graft_rolling_hash('abc') AS h").head().getLong(0)
    assert(r == RollingHash.hash("abc"))
  }

  test("participates in codegen over a parquet scan, and executes") {
    val df = Tables.documents(spark, Sf0001)
      .select(TextAnalysis.rollingHash($"text").as("h"))
    // "*(n)" prefixes mark WholeStageCodegen stages in simpleString
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [rollinghash"), plan)
    assert(df.filter($"h" >= 0).count() == 500L) // generated code compiles+runs
  }
}
