package graft

import graft.core.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None), (None, Some("a"))
  ).toDF("id", "tag")

  test("profile: nulls, distincts and ranges per column in one scan") {
    val p = Profile.profile(dirty).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getAs[Long]("n_rows") == 4L)
    assert(id.getAs[Long]("n_nulls") == 1L)
    assert(id.getAs[Double]("null_frac") == 0.25)
    assert(id.getAs[Long]("n_distinct") == 2L) // nulls excluded
    assert(id.getAs[String]("min_repr") == "1" && id.getAs[String]("max_repr") == "2")
    val tag = p("tag")
    assert(tag.getAs[Long]("n_nulls") == 1L && tag.getAs[Long]("n_distinct") == 2L)
    // approx variant keeps the same shape with HLL cardinalities
    val ap = Profile.profile(dirty, approxDistinct = true).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(ap("id") >= 1L && ap("tag") >= 1L)
  }

  test("checks: complete/unique pass and fail with observed evidence") {
    val report = Profile.runChecks(dirty, Seq(
      Profile.complete("id"), Profile.unique("id"),
      Profile.complete("tag"), Profile.nonEmpty("id")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(!report(("complete", "id")))  // one null id
    assert(!report(("unique", "id")))    // duplicate id 2
    assert(!report(("complete", "tag")))
    assert(report(("non_empty", "id")))
    val clean = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val ok = Profile.runChecks(clean, Seq(Profile.complete("id"), Profile.unique("id")))
      .select("passed").as[Boolean].collect()
    assert(ok.forall(identity))
  }
}
