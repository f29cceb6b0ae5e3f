package graft

import graft.core.Dedup
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bidx").toString + "/idx"

  test("incremental flags match a full corpus+batch LSH run") {
    val docs = Tables.documents(spark, Sf0001)
    val corpus = docs.filter($"doc_id" % 3 =!= 1)
    val batch = docs.filter($"doc_id" % 3 === 1)
    val dir = tmp()
    Dedup.writeBandIndex(corpus, "doc_id", "text", dir)
    val inc = Dedup.dedupAgainstIndex(spark, batch, dir, "doc_id", "text",
        minEstJaccard = 0.5)
      .filter($"is_dup").as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    // reference: one monolithic run over corpus+batch, keep only
    // (new, corpus) pairs, pick each new doc's best corpus match
    val newIds = batch.select("doc_id").as[Long].collect().toSet
    val full = Dedup.lshCandidates(docs, "doc_id", "text", minEstJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, j) =>
        Seq(a -> (b, j), b -> (a, j)) // both orientations
      }
      .filter { case (n, (c, _)) => newIds.contains(n) && !newIds.contains(c) }
      .groupBy(_._1)
      .map { case (n, ms) =>
        n -> ms.map(_._2).minBy { case (c, j) => (-j, c) }._1
      }
    assert(inc == full, "incremental result must equal the monolithic run")
    assert(inc.nonEmpty, "test corpus should contain cross-slice near-dups")
  }

  test("index grows by appended batches; replayed txn append is a no-op") {
    val docs = Tables.documents(spark, Sf0001)
    val dir = tmp()
    Dedup.writeBandIndex(docs.filter($"doc_id" < 100), "doc_id", "text", dir)
    val n1 = graft.sources.SnapshotTable.read(spark, dir).count()
    // second increment, idempotent: replaying the same (app, version)
    // must not double the rows
    val b2 = docs.filter($"doc_id" >= 100 && $"doc_id" < 200)
    Dedup.writeBandIndex(b2, "doc_id", "text", dir,
      txnAppId = "ingest", txnVersion = 1L)
    val n2 = graft.sources.SnapshotTable.read(spark, dir).count()
    assert(n2 > n1)
    Dedup.writeBandIndex(b2, "doc_id", "text", dir,
      txnAppId = "ingest", txnVersion = 1L)
    assert(graft.sources.SnapshotTable.read(spark, dir).count() == n2)
    // a batch-2 near-dup is now visible to batch 3
    val probe = docs.filter($"doc_id" >= 100 && $"doc_id" < 110)
      .withColumn("doc_id", $"doc_id" + 100000L)
    val flagged = Dedup.dedupAgainstIndex(spark, probe, dir, "doc_id", "text",
        minEstJaccard = 0.9)
      .filter($"is_dup")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(flagged.length == 10, "identical re-ingested docs must all flag")
    flagged.foreach { case (id, dupOf, j, _) =>
      assert(dupOf == id - 100000L && j == 1.0)
    }
  }

  test("clean new docs pass with null match columns") {
    val dir = tmp()
    Dedup.writeBandIndex(Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text"), "doc_id", "text", dir)
    val out = Dedup.dedupAgainstIndex(spark,
        Seq((2L, "one two three four five six seven")).toDF("doc_id", "text"),
        dir, "doc_id", "text", minEstJaccard = 0.25)
      .collect()
    assert(out.length == 1 && !out(0).getAs[Boolean]("is_dup"))
    assert(out(0).isNullAt(out(0).fieldIndex("dup_of")))
  }
}
