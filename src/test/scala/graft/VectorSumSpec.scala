package graft

import org.apache.spark.sql.functions._

import graft.core.Similarity

/** [[graft.expressions.VectorSum]] — the native whole-vector sum
  * aggregate — pinned against the built-ins-only posexplode+groupBy
  * formulation, plus its null/error contract and the plan shape that
  * justifies it (partial ObjectHashAggregate before the exchange).
  */
class VectorSumSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 200).map { i =>
    (i % 7, Array.tabulate(16)(d => math.sin(i * 31 + d) * 10))
  }.toDF("label", "vec")

  test("parity with the posexplode oracle, groups and means") {
    val native = Similarity.labelCentroidsNative(corpus, "label", "vec")
      .select($"label", $"dim", round($"mean_v", 9).as("m"), $"n")
      .as[(Int, Int, Double, Long)].collect().toSet
    val oracle = Similarity.labelCentroids(corpus, "label", "vec")
      .select($"label", $"dim", round($"mean_v", 9).as("m"), $"n")
      .as[(Int, Int, Double, Long)].collect().toSet
    assert(native == oracle)
  }

  test("null vectors are ignored; all-null group evaluates to NULL") {
    val df = Seq(
      (1, Some(Array(1.0, 2.0))), (1, None), (1, Some(Array(10.0, 20.0))),
      (2, None))
      .toDF("label", "vec")
    val out = df.groupBy($"label")
      .agg(Similarity.vectorSum($"vec").as("sv"))
      .as[(Int, Option[Seq[Double]])].collect().toMap
    assert(out(1).get == Seq(11.0, 22.0))
    assert(out(2).isEmpty)
  }

  test("dimension mismatch raises instead of silently truncating") {
    val df = Seq((1, Array(1.0, 2.0)), (1, Array(1.0, 2.0, 3.0))).toDF("label", "vec")
    val e = intercept[Exception] {
      df.groupBy($"label").agg(Similarity.vectorSum($"vec")).collect()
    }
    assert(e.getMessage != null)
  }

  test("SQL registration via extensions") {
    corpus.createOrReplaceTempView("vs_corpus")
    val viaSql = spark.sql(
      "SELECT label, round(vector_sum(vec)[3], 9) AS s3 FROM vs_corpus GROUP BY label")
      .as[(Int, Double)].collect().toSet
    val viaApi = corpus.groupBy($"label")
      .agg(round(Similarity.vectorSum($"vec")(3), 9).as("s3"))
      .as[(Int, Double)].collect().toSet
    assert(viaSql == viaApi)
  }

  test("plan: partial aggregation runs before the exchange") {
    val df = corpus.repartition(4).groupBy($"label")
      .agg(Similarity.vectorSum($"vec"))
    df.collect() // finalize the adaptive plan
    // QueryStageExec wrappers are traversal leaves — assert on the
    // rendered final plan: partial_vector_sum BELOW the label exchange,
    // final vector_sum above it
    val rendered = df.queryExecution.executedPlan.toString
    val finalPart = rendered.split("== Initial Plan ==").head
    assert(finalPart.contains("partial_vector_sum"), s"map-side combine missing:\n$rendered")
    val iPartial = finalPart.indexOf("partial_vector_sum")
    val iExchange = finalPart.indexOf("Exchange hashpartitioning(label")
    assert(iExchange >= 0 && iExchange < iPartial,
      "partial aggregate must sit below the group-key exchange")
  }
}
