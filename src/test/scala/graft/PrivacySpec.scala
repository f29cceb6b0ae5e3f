package graft

import graft.core.Privacy
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audits: hand-checked class algebra,
  * NULL-as-value grouping, threshold sweeps.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI = (zip, age): classes {(10, 30): 3 rows, (10, 40): 2, (20, 30): 1}
  private def table() = Seq(
    (1L, 10, 30, "flu"), (2L, 10, 30, "flu"), (3L, 10, 30, "cold"),
    (4L, 10, 40, "flu"), (5L, 10, 40, "cold"),
    (6L, 20, 30, "flu")).toDF("id", "zip", "age", "dx")

  test("kAnonymityReport: class census, risk shares, satisfies flags") {
    val got = Privacy.kAnonymityReport(table(),
        Seq(col("zip"), col("age")), ks = Seq(2, 3))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(2L, 3L))
    val k2 = got(2L)
    assert(k2.getLong(1) == 3L && k2.getLong(2) == 6L) // classes, rows
    assert(k2.getLong(3) == 1L)                        // min class size
    assert(k2.getLong(4) == 1L && k2.getLong(5) == 1L) // the singleton
    assert(k2.getLong(6) == 166666L)                   // 1/6 micro
    assert(!k2.getBoolean(7), "a singleton breaks k=2")
    val k3 = got(3L)
    assert(k3.getLong(4) == 2L && k3.getLong(5) == 3L, // sizes 1 + 2
      k3.toString)
  }

  test("NULL is a quasi-identifier value, not a wildcard") {
    val df = Seq((1L, Some(10)), (2L, Some(10)), (3L, None: Option[Int]))
      .toDF("id", "zip")
    val got = Privacy.kAnonymityReport(df, Seq(col("zip")), ks = Seq(2))
      .head()
    // the NULL row is its own singleton class: 3 classes would be
    // wrong (2: {10,10} and {null}); min class size 1
    assert(got.getLong(1) == 2L && got.getLong(3) == 1L, got.toString)
  }

  test("lDiversityReport: homogeneous classes flagged despite k-anonymity") {
    // (10, 40) has 2 rows but 2 diagnoses (diverse); make a class
    // that is 3-anonymous yet sensitive-homogeneous
    val df = table().withColumn("dx",
      when(col("zip") === 10 && col("age") === 30, lit("flu"))
        .otherwise(col("dx")))
    val got = Privacy.lDiversityReport(df, Seq(col("zip"), col("age")),
        col("dx"), ls = Seq(2)).head()
    // classes below l=2: the homogeneous 3-row class + the 1-row class
    assert(got.getLong(4) == 2L && got.getLong(5) == 4L, got.toString)
    assert(!got.getBoolean(7))
  }
}
