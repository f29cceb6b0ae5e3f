package graft

import org.apache.spark.sql.functions._

/** Plan-level pushdown proof over representative gate queries: the
  * filters and projections the 100 TB posture depends on must reach
  * the parquet scan — `PushedFilters` non-empty where a selective
  * predicate exists, `ReadSchema` pruned to the referenced columns.
  * (`.explain` by eye is how these rot; this spec makes the plan
  * shape a regression test.)
  */
class PushdownSpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val qe = df.queryExecution
    org.apache.spark.sql.execution.ExplainMode
      .fromString("formatted") match {
      case m => qe.explainString(m)
    }
  }

  test("q02 filter+project: key equality and date range land in " +
      "PushedFilters; ReadSchema carries only referenced columns") {
    val plan = formatted(
      SparkEntry.queries("q02_filter_project")(spark, Sf0001))
    assert(plan.contains("PushedFilters"), plan)
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("IsNotNull") || pushed.contains("EqualTo")
      || pushed.contains("GreaterThan"), pushed)
    // the scan must not read every events column (props is unused)
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("props"), readSchemas)
  }

  test("q184 promo share: the shipdate range is pushed to the " +
      "lineitem scan and unused fact columns are pruned") {
    val plan = formatted(SparkEntry.queries("q184_promo_share")(spark, Sf0001))
    val pushedLines = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushedLines.contains("l_shipdate")
      || pushedLines.contains("GreaterThanOrEqual"), pushedLines)
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("l_comment"), readSchemas)
    assert(!readSchemas.contains("l_tax"), readSchemas)
  }

  test("q189 part concentration: the lineitem scan reads exactly the " +
      "three referenced columns") {
    val plan = formatted(
      SparkEntry.queries("q189_part_concentration")(spark, Sf0001))
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, plan)
    // per-part scan: the three referenced columns; threshold scan:
    // prunes even l_partkey (it only sums revenue) — BOTH schemas
    // must exclude every unreferenced column
    assert(readSchemas.exists(rs => rs.contains("l_partkey")
      && rs.contains("l_extendedprice") && rs.contains("l_discount")),
      readSchemas.mkString("\n"))
    readSchemas.foreach { rs =>
      Seq("l_quantity", "l_shipdate", "l_returnflag", "l_orderkey")
        .foreach(c => assert(!rs.contains(c), s"$c not pruned: $rs"))
    }
  }

  test("q225 Q6-shape: discount band and quantity cap reach the scan; " +
      "only the four referenced columns read") {
    val plan = formatted(
      SparkEntry.queries("q225_revenue_delta")(spark, Sf0001))
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("l_discount") && pushed.contains("l_quantity"),
      pushed)
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).mkString("\n")
    Seq("l_orderkey", "l_partkey", "l_returnflag", "l_tax")
      .foreach(c => assert(!readSchemas.contains(c),
        s"$c not pruned: $readSchemas"))
  }

  test("q226/q181 star shapes: dims broadcast, facts never") {
    Seq("q226_product_profit", "q181_local_supplier_volume").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, Sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: $plan")
      assert(!plan.contains("CartesianProduct"), s"$q grew a cross join")
    }
  }
}
