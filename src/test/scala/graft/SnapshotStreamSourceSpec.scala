package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.sources.SnapshotTable

/** `spark.readStream.format("graft-snapshot")` — the commit-log
  * streaming source: offsets are manifest versions, each micro-batch
  * reads exactly the files newly referenced since the last committed
  * version, and a restarted query resumes from its checkpoint without
  * re-emitting (the Delta streaming-source contract on an append-only
  * table).
  */
class SnapshotStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  test("tails commits incrementally; checkpointed restart does not re-emit") {
    val root = Files.createTempDirectory("snap_stream")
    val t = root.toString + "/t"
    val ckpt = root.toString + "/ckpt"

    SnapshotTable.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)

    // memory sink cannot recover from a checkpoint; collect via
    // foreachBatch (checkpointed, restart-capable)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    def startQuery() = spark.readStream.format("graft-snapshot").load(t)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.as[(Int, String)].collect().foreach(seen.add); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

    import scala.jdk.CollectionConverters._
    // batch 1: the initial snapshot
    var q = startQuery(); q.awaitTermination()
    assert(seen.asScala.toSet == Set((1, "a"), (2, "b")))

    // two more commits while the query is down; restart picks up ONLY them
    SnapshotTable.append(Seq((3, "c")).toDF("id", "v"), t)
    SnapshotTable.append(Seq((4, "d")).toDF("id", "v"), t)
    q = startQuery(); q.awaitTermination()
    assert(seen.asScala.toSet == Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    assert(seen.size == 4, s"no row may be re-emitted on restart: ${seen.asScala.toList}")

    // no new commits -> restart emits nothing (exactly-once over the log)
    q = startQuery(); q.awaitTermination()
    assert(seen.size == 4)
  }

  test("startingVersion=latest skips history; explicit version starts mid-log") {
    val root = Files.createTempDirectory("snap_stream2")
    val t = root.toString + "/t"

    SnapshotTable.append(Seq((1, "old")).toDF("id", "v"), t) // v0
    SnapshotTable.append(Seq((2, "mid")).toDF("id", "v"), t) // v1

    import scala.jdk.CollectionConverters._
    def collectStream(startingVersion: String, ckpt: String,
                      into: java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("startingVersion", startingVersion).load(t)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(Int, String)].collect().foreach(into.add); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // explicit startingVersion=1 -> v0's file is never read
    val mid = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    collectStream("1", root.toString + "/ck1", mid)
    assert(mid.asScala.toSet == Set((2, "mid")))

    // latest -> nothing until a commit made after stream start
    val latest = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    collectStream("latest", root.toString + "/ck2", latest)
    assert(latest.isEmpty)

    SnapshotTable.append(Seq((3, "new")).toDF("id", "v"), t)
    collectStream("latest", root.toString + "/ck2", latest) // same checkpoint resumes
    assert(latest.asScala.toSet == Set((3, "new")))
  }

  test("end-to-end lakehouse loop: stream out of one table into another") {
    val root = Files.createTempDirectory("snap_stream3")
    val src = root.toString + "/src"
    val dst = root.toString + "/dst"

    SnapshotTable.append((1 to 50).map(i => (i, i * 2)).toDF("id", "n"), src)
    SnapshotTable.append((51 to 100).map(i => (i, i * 2)).toDF("id", "n"), src)

    // foreachBatch + idempotent txn append = exactly-once into the sink
    // table (graft.streaming.SnapshotSink contract, driven from the
    // DSv2 streaming source instead of a file stream)
    val q = spark.readStream.format("graft-snapshot").load(src)
      .writeStream
      .option("checkpointLocation", root.toString + "/ck")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        SnapshotTable.appendIdempotent(df, dst, "loop_writer", batchId); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(SnapshotTable.read(spark, dst).count() == 100)
    assert(SnapshotTable.read(spark, dst).agg(org.apache.spark.sql.functions.sum("n"))
      .as[Long].head() == (1 to 100).map(_ * 2).sum)
  }
}
