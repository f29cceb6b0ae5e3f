package graft

import graft.core.Sketches
import org.apache.spark.sql.functions._

class AmsF2Spec extends SparkSpec {
  import spark.implicits._

  test("single key: every estimator is (+-f)^2 = f^2 exactly") {
    val df = (1 to 37).map(_ => "only").toDF("k")
    val got = Sketches.amsF2(df, col("k"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 37L * 37L, 37L * 37L, 0L)))
  }

  test("estimate lands near exact F2 on a skewed distribution") {
    // zipf-ish: key i repeated (200/i) times
    val rows = (1 to 50).flatMap(i => Seq.fill(200 / i)(s"k$i"))
    val got = Sketches.amsF2(rows.toDF("k"), col("k"))
      .as[(Long, Long, Long, Long)].collect().head
    val exact = (1 to 50).map(i => { val f = (200 / i).toLong; f * f }).sum
    assert(got._1 == 50L && got._2 == exact)
    // median-of-means with 5x16 estimators: generous 50% band
    assert(got._4 < 500000L, s"err_micro ${got._4}")
  }

  test("deterministic across partitionings; odd-rows guard") {
    val df = (1 to 500).map(i => s"k${i % 23}").toDF("k")
    val a = Sketches.amsF2(df, col("k")).collect().toSeq
    val b = Sketches.amsF2(df.repartition(9), col("k")).collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sketches.amsF2(df, col("k"), rows = 4)
    }
  }
}
