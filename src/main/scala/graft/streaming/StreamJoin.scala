package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream equi-join with an event-time bound — the attribution
  * shape (impression ⋈ click within N minutes).
  *
  * Scale posture: a stream-stream join without a time bound keeps BOTH
  * sides' state forever; with per-side watermarks and a join condition
  * that bounds the right timestamp relative to the left, Structured
  * Streaming derives state-eviction watermarks for each side, so state
  * is bounded by (event rate × join window + lateness), not by stream
  * lifetime. Both conditions are load-bearing at 100 TB/day — omit
  * either and the job OOMs days later.
  *
  * Key columns must be distinct names on the two sides (stream-stream
  * joins resolve by name).
  */
object StreamJoin {

  /** Rows of `right` joined to `left` rows of the same key whose
    * timestamp falls in `[leftTs, leftTs + within]`.
    *
    * @param within         e.g. "10 minutes"
    * @param watermarkDelay max accepted lateness per side, e.g. "5 minutes"
    * @param joinType       "inner" or "leftOuter" (unmatched left rows
    *                       emit with nulls once the watermark closes
    *                       their window)
    */
  def timeBounded(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTsCol: String, rightTsCol: String,
                  within: String, watermarkDelay: String,
                  joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTsCol) >= col(leftTsCol) &&
        col(rightTsCol) <= col(leftTsCol) + expr(s"INTERVAL $within"),
      joinType)
  }
}
