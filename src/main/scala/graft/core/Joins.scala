package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Catalyst's built-ins.
  *
  * Backward as-of join: for each left row, the single most recent
  * right row with the same key and right.ts <= left.ts. Spark has no
  * native as-of join; per the custom-operator preference order
  * (compose > custom Expression > custom plan), this composes
  * built-ins: tag + union both sides, one window pass per key ordered
  * by (ts, side), carry the last right value forward, keep left rows.
  * Exactly one shuffle (hash by key) and one sort — the same physical
  * work a hand-written sort-merge as-of exec would do, but AQE/codegen
  * still apply.
  */
object Joins {

  /** `left` gains `valueCols` from the latest `right` row at or before
    * its `leftTs`. Right rows sort before left rows at equal
    * timestamps, so an exact tie matches (<= semantics).
    *
    * @param leftKey/rightKey equality keys
    * @param valueCols columns of `right` to carry (must not clash with
    *   left's column names)
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: Column, rightTs: Column,
                   valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__ts", leftTs.cast("timestamp"))
      .withColumn("__side", lit(1))
    // null placeholders must carry the OTHER side's real types or the
    // union rejects the NullType columns
    val lTagged = valueCols.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__ts", rightTs.cast("timestamp"))
      .withColumn("__side", lit(0))
    val rTagged = leftCols.foldLeft(r)((d, c) =>
      if (valueCols.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lTagged.select(("__key" +: "__ts" +: "__side" +: (leftCols ++ valueCols)).distinct.map(col): _*)
      .unionByName(rTagged.select(("__key" +: "__ts" +: "__side" +: (leftCols ++ valueCols)).distinct.map(col): _*))
    val w = Window.partitionBy("__key").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1).drop("__key", "__ts", "__side")
  }

  /** Same semantics as [[asofBackward]] through the custom plan node
    * ([[graft.plans.AsofJoin]] + AsofJoinExec): one hash exchange per
    * side, per-partition streaming merge. Registers the planner
    * strategy on the session at first use (idempotent).
    */
  def asofBackwardNative(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTs: Column, rightTs: Column,
                         valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    val lPlan = GraftShim.logicalPlan(
      left.withColumn("__lts", leftTs.cast("timestamp")))
    val rPlan = GraftShim.logicalPlan(
      right.withColumn("__rts", rightTs.cast("timestamp")))
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val plan = graft.plans.AsofJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, "__lts"), attr(rPlan, "__rts"),
      valueCols.map(c => attr(rPlan, c)))
    GraftShim.ofRows(spark, plan).drop("__lts")
  }
}
