package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.SnapshotTable

/** Exactly-once streaming ingest into a [[SnapshotTable]]:
  * `foreachBatch` + [[SnapshotTable.appendIdempotent]] keyed on
  * (queryName, batchId). Structured Streaming guarantees a batch id is
  * replayed with identical content after a failure; the table's txn
  * watermark makes the replay a no-op — so the commit is exactly-once
  * END-TO-END even though foreachBatch alone is at-least-once. This is
  * the micro-batch → lakehouse pattern (Delta's txnAppId/txnVersion)
  * on the engine's own table format.
  */
object SnapshotSink {

  def start(stream: DataFrame, table: String, checkpointDir: String,
            queryName: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotTable.appendIdempotent(batch, table, queryName, batchId)
        ()
      }
      .trigger(trigger)
      .start()
}
