package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.SnapshotTable

/** Exactly-once streaming ingest into a [[SnapshotTable]]:
  * `foreachBatch` + [[SnapshotTable.appendIdempotent]] keyed on
  * (writerId, batchId). Structured Streaming guarantees a batch id is
  * replayed with identical content after a failure; the table's txn
  * watermark makes the replay a no-op — so the commit is exactly-once
  * END-TO-END even though foreachBatch alone is at-least-once. This is
  * the micro-batch → lakehouse pattern (Delta's txnAppId/txnVersion)
  * on the engine's own table format.
  *
  * The exactly-once contract is scoped to ONE (writerId, checkpoint)
  * pairing — the same contract as Delta's txnAppId. Batch ids restart
  * at 0 with NEW content if the checkpoint is deleted or replaced, so
  * on a checkpoint reset the caller MUST supply a fresh `writerId`
  * (default: the query name), or the restarted stream's early batches
  * are misread as replays and silently skipped. Likewise, never share
  * one writerId between two different queries writing the same table.
  */
object SnapshotSink {

  def start(stream: DataFrame, table: String, checkpointDir: String,
            queryName: String,
            trigger: Trigger = Trigger.AvailableNow(),
            writerId: Option[String] = None): StreamingQuery = {
    val id = writerId.getOrElse(queryName)
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotTable.appendIdempotent(batch, table, id, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }
}
