package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Packing
import graft.sources.SnapshotTable
import graft.streaming.PackStream

/** Continuous sequence packing: stream == batch parity over the same
  * corpus, tail continuation across batches, exactly-once replay, and
  * the foreachBatch wiring.
  */
class PackStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) = ids.map { i =>
    (i.toLong, (0 until (3 + i % 5)).map(j => (i * 10 + j).toLong))
  }

  private def encoded(ids: Range) =
    docs(ids).toDF("doc_id", "piece_ids")
      .withColumn("n_pieces", size(col("piece_ids")).cast("long"))

  private def allTokens(ids: Range): Seq[Long] =
    docs(ids).flatMap(_._2)

  test("3 micro-batches == one batch pack; the tail is the dropped partial") {
    val dir = Files.createTempDirectory("packstream").toString + "/t"
    val L = 16
    PackStream.packBatch(encoded(0 until 7), dir, L, 0L)
    PackStream.packBatch(encoded(7 until 13), dir, L, 1L)
    PackStream.packBatch(encoded(13 until 20), dir, L, 2L)
    val got = PackStream.sequences(spark, dir)
      .select(col("seq_id"), col("token_ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val exp = Packing.packIdSequences(encoded(0 until 20), "doc_id", L)
      .select(col("seq_id"), col("token_ids"))
      .as[(Long, Seq[Long])].collect().toMap
    // the stream emits every FULL sequence the batch form emits; the
    // batch form's final PARTIAL sequence is the stream's open tail
    // (more data may still arrive) — that is the one semantic delta
    assert(got == exp.filter(_._2.length == L),
      s"stream ${got.keySet} vs batch-full ${exp.filter(_._2.length == L).keySet}")
    // every emitted sequence is exactly L tokens, ids contiguous from 0
    assert(got.keySet == (0L until got.size.toLong).toSet)
    assert(got.values.forall(_.length == L))
    // the tail holds exactly the batch form's trailing partial
    val toks = allTokens(0 until 20)
    val expTail = toks.drop((toks.length / L) * L)
    assert(exp.values.find(_.length < L).contains(expTail))
    val tailIds = PackStream.tail(spark, dir)
      .select(col("token_ids")).as[Seq[Long]].collect()(0)
    assert(tailIds == expTail)
  }

  test("replayed batch id is a FULL no-op (sequences and tail)") {
    val dir = Files.createTempDirectory("packstream_replay").toString + "/t"
    val L = 8
    PackStream.packBatch(encoded(0 until 5), dir, L, 0L)
    PackStream.packBatch(encoded(5 until 9), dir, L, 1L)
    val v = SnapshotTable.currentVersion(dir)
    val before = PackStream.sequences(spark, dir).count()
    // crash-replay of batch 1: same id, same data
    PackStream.packBatch(encoded(5 until 9), dir, L, 1L)
    assert(SnapshotTable.currentVersion(dir) == v, "no new commit")
    assert(PackStream.sequences(spark, dir).count() == before)
  }

  test("foreachBatch wiring: stream increments continue a batch bootstrap") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("packstream_stream").toString + "/t"
    val L = 16
    // batch bootstrap: first half of the corpus
    PackStream.packBatch(encoded(0 until 10), dir, L, -1L)
    // stream the second half in
    val input = MemoryStream[(Long, Seq[Long])]
    val q = input.toDF().toDF("doc_id", "piece_ids")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        PackStream.packBatch(df, dir, L, id))
      .start()
    try {
      input.addData(docs(10 until 15): _*)
      q.processAllAvailable()
      input.addData(docs(15 until 20): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = PackStream.sequences(spark, dir)
      .select(col("seq_id"), col("token_ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val exp = Packing.packIdSequences(encoded(0 until 20), "doc_id", L)
      .select(col("seq_id"), col("token_ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == exp.filter(_._2.length == L))
  }

  private def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    // listener delivery is async — drain the bus rather than sleep (a
    // fixed sleep undercounts under CI load and flakes the assertion)
    try {
      body
      org.apache.spark.sql.GraftShim.drainListenerBus(spark, 30000L)
    }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  test("per-batch driver work is constant: jobs don't grow with table size, " +
      "state recovery reads only the last commit's files") {
    val dir = Files.createTempDirectory("packstream_const").toString + "/t"
    val L = 8
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    PackStream.packBatch(encoded(0 until 4), dir, L, 0L)
    val early = countJobs(PackStream.packBatch(encoded(4 until 8), dir, L, 1L))
    (2 until 10).foreach(b =>
      PackStream.packBatch(encoded(b * 4 until b * 4 + 4), dir, L, b.toLong))
    val late = countJobs(
      PackStream.packBatch(encoded(40 until 44), dir, L, 10L))
    assert(late <= early,
      s"late-batch jobs $late vs early-batch $early — per-batch driver " +
        "work must not grow with accumulated table size")
    // the mechanism: batch_id file stats confine the recovery read to
    // the last commit's files
    val pruned = SnapshotTable.read(spark, dir, prune = Seq(
      SnapshotTable.ColRange("batch_id", lower = Some(10L)))).inputFiles.length
    val all = SnapshotTable.read(spark, dir).inputFiles.length
    assert(pruned < all, s"pruned=$pruned all=$all")
    // and no cached blocks survive a batch (offsets + token caches
    // are released before packBatch returns; other specs may hold
    // their own caches in the shared session, so compare, not ==0)
    assert(spark.sparkContext.getPersistentRDDs.size <= cachedBefore,
      "packBatch must release every per-batch cache")
  }

  test("property: random batch splits reproduce the batch pack exactly") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val dir = Files.createTempDirectory(s"packstream_prop$trial")
        .toString + "/t"
      val L = 4 + rnd.nextInt(24)
      val nDocs = 8 + rnd.nextInt(20)
      // random split of [0, nDocs) into 2-4 contiguous batches
      val cuts = (Seq(0, nDocs) ++
        Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(nDocs + 1)))
        .distinct.sorted
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
        PackStream.packBatch(encoded(a until b), dir, L, i.toLong)
      }
      val got = PackStream.sequences(spark, dir)
        .select(col("seq_id"), col("token_ids"))
        .as[(Long, Seq[Long])].collect().toMap
      val exp = Packing.packIdSequences(encoded(0 until nDocs), "doc_id", L)
        .select(col("seq_id"), col("token_ids"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(got == exp.filter(_._2.length == L),
        s"trial $trial (L=$L, cuts=$cuts)")
      // stream tail + emitted sequences = the full token stream
      val tailToks = PackStream.tail(spark, dir)
        .select(col("token_ids")).as[Seq[Long]].collect()
        .headOption.getOrElse(Nil)
      val streamed = got.toSeq.sortBy(_._1).flatMap(_._2) ++ tailToks
      assert(streamed == allTokens(0 until nDocs), s"trial $trial token stream")
      // an EMPTY micro-batch (idle trigger) must be a pure tail
      // re-commit: no new sequences, tail content unchanged
      PackStream.packBatch(encoded(0 until 0), dir, L, cuts.size.toLong + 1)
      assert(PackStream.sequences(spark, dir)
        .as[(Long, Long, Long, Seq[Long])].collect().length == got.size,
        s"trial $trial: empty batch must emit no sequences")
      val tailAfter = PackStream.tail(spark, dir)
        .select(col("token_ids")).as[Seq[Long]].collect()
        .headOption.getOrElse(Nil)
      assert(tailAfter == tailToks, s"trial $trial: empty batch changed tail")
    }
  }

  test("fresh-checkpoint restart on a 50-commit table: recovery opens ONLY " +
      "the last commit's files; numbering and tail continue") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("packstream_wipe").toString + "/t"
    val L = 8
    (0 until 50).foreach(b =>
      PackStream.packBatch(encoded(b * 2 until b * 2 + 2), dir, L, b.toLong))
    val v = SnapshotTable.currentVersion(dir).get
    val expSeqs = PackStream.sequences(spark, dir).count()
    val expTail = PackStream.tail(spark, dir)
      .select(col("token_ids")).as[Seq[Long]].collect()(0)
    // destroy every data file OUTSIDE the last commit: a recovery that
    // read anything beyond it would fail the next batch outright
    val last = SnapshotTable.addedFiles(dir, v).toSet
    Files.list(java.nio.file.Paths.get(dir, "data")).iterator().asScala
      .filter(p => !last.contains(p.getFileName.toString))
      .foreach(p => Files.write(p, Array[Byte](0)))
    // checkpoint wipe: batch ids restart at 0 — a fresh checkpoint
    // must come with a fresh writer id or everything replays as no-op
    PackStream.packBatch(encoded(100 until 104), dir, L, 0L,
      writerId = "pack-stream-restart")
    assert(SnapshotTable.currentVersion(dir).get == v + 1,
      "restarted batch must commit")
    // the restarted commit CONTINUES: its rows are readable in
    // isolation via their commit_seq, numbering picks up at the old
    // high water, and the first new sequence starts with the carried
    // tail tokens
    val newRows = SnapshotTable.read(spark, dir, prune = Seq(
        SnapshotTable.ColRange("commit_seq",
          lower = Some(50L), upper = Some(50L))))
      .filter(col("kind") === "seq")
      .select(col("seq_id"), col("token_ids"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(newRows.nonEmpty)
    assert(newRows.head._1 == expSeqs,
      s"numbering must continue at $expSeqs, got ${newRows.head._1}")
    assert(newRows.head._2.startsWith(expTail),
      "first post-restart sequence must begin with the carried tail")
  }

  test("tail row carries the seq high-water mark for O(last-commit) recovery") {
    val dir = Files.createTempDirectory("packstream_hiwater").toString + "/t"
    val L = 8
    PackStream.packBatch(encoded(0 until 10), dir, L, 0L)
    val nSeqs = PackStream.sequences(spark, dir).count()
    val tailSeqId = SnapshotTable.read(spark, dir)
      .filter(col("kind") === "tail")
      .orderBy(col("batch_id").desc).limit(1)
      .select(col("seq_id")).as[Long].collect()(0)
    assert(tailSeqId == nSeqs,
      s"tail.seq_id $tailSeqId must equal the next sequence id $nSeqs")
  }
}
