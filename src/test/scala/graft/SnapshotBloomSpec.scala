package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.{BloomIndex, ColProbe, FileEntry}

/** Manifest-level bloom file skipping: a point lookup on a scattered
  * high-cardinality key keeps only files whose manifest bloom might
  * contain the value — decided at PLAN time, zero file opens — where
  * min/max stats (every file's range spans everything) prune nothing.
  */
class SnapshotBloomSpec extends SparkSpec {
  import spark.implicits._

  // key k lands in file k % 8, so file i holds {i, i+8, ...}: every
  // file's [min,max] spans (almost) the full key range — the
  // adversarial layout where range stats cannot help a point lookup
  private def scattered = (0L until 4000L).map(i => (i, s"payload-$i"))
    .toDF("k", "payload").repartitionByRange(8, pmod(col("k"), lit(8)))

  test("probe read equals the full-scan filter; present key opens few " +
      "files, absent key opens none, range stats alone prune nothing") {
    val t = Files.createTempDirectory("graft_bloom").toString + "/t"
    SnapshotTable.appendBloomIndexed(scattered, t, Seq("k"),
      bloomBits = 8192, bloomK = 4)
    val all = SnapshotTable.filesForRead(t)
    // range-boundary sampling may merge adjacent groups; >= 6 spanning
    // files keeps the layout adversarial
    assert(all.size >= 6, s"expected >=6 files, got ${all.size}")

    for (key <- Seq(8L, 1789L, 3991L)) {
      val probed = SnapshotTable.read(spark, t,
          probes = Seq(ColProbe("k", key)))
        .filter(col("k") === key)
        .select("k", "payload").as[(Long, String)].collect().toSeq
      assert(probed == Seq((key, s"payload-$key")), s"key $key")
      val kept = SnapshotTable.filesForRead(t, probes = Seq(ColProbe("k", key)))
      assert(kept.nonEmpty && kept.size < all.size,
        s"key $key kept ${kept.size} of ${all.size}")
      // min/max alone keeps ~everything on this layout — the bloom is
      // what makes the lookup cheap
      val rangeOnly = SnapshotTable.filesForRead(t, prune = Seq(
        SnapshotTable.ColRange("k", Some(key), Some(key))))
      assert(rangeOnly.size == all.size,
        s"range stats unexpectedly pruned: ${rangeOnly.size}")
    }

    // absent keys: bloom says no everywhere (fixed data + fixed hash
    // -> deterministic), and the read is a metadata-only empty frame
    val absent = SnapshotTable.filesForRead(t,
      probes = Seq(ColProbe("k", 999999L)))
    assert(absent.isEmpty, s"absent key kept $absent")
    assert(SnapshotTable.read(spark, t,
      probes = Seq(ColProbe("k", 999999L))).isEmpty)
  }

  test("probes are conservative: files without a bloom on the column " +
      "are always kept, and Int-vs-Long probe width cannot drift") {
    val t = Files.createTempDirectory("graft_bloom2").toString + "/t"
    // plain append: no manifest blooms anywhere
    SnapshotTable.append(scattered, t)
    val all = SnapshotTable.filesForRead(t)
    // an interior key's equality range keeps every file, and with no
    // blooms the probe must not skip anything beyond that
    val kept = SnapshotTable.filesForRead(t, probes = Seq(ColProbe("k", 8L)))
    assert(kept == all, "bloom-less files must never be skipped")

    val t2 = Files.createTempDirectory("graft_bloom3").toString + "/t"
    SnapshotTable.appendBloomIndexed(scattered, t2, Seq("k"),
      bloomBits = 8192, bloomK = 4)
    // canonical-string hashing: an Int probe finds what a Long wrote
    val viaInt = SnapshotTable.read(spark, t2,
        probes = Seq(ColProbe("k", 42)))
      .filter(col("k") === 42).count()
    assert(viaInt == 1L)
  }

  test("driver-side probe hashing replays Spark's xxhash64 exactly") {
    val vals = Seq("3", "payload-17", "", "日本語", "-9223372036854775808")
    val sparkBits = vals.toDF("v")
      .select(col("v"), xxhash64(col("v")).as("h1"),
        xxhash64(col("v"), lit(1L)).as("h2"))
      .as[(String, Long, Long)].collect()
      .map { case (v, h1, h2) =>
        // mod-m before combining — the overflow-free derivation both
        // the build and the probe use
        val h1m = (h1 % 8192 + 8192) % 8192
        val h2m = (h2 % 8192 + 8192) % 8192
        v -> (0 until 4).map(i => ((h1m + i * h2m) % 8192).toInt)
      }.toMap
    vals.foreach { v =>
      val enc = BloomIndex.encodeFor(Seq(v), 8192, 4)
      // membership through the driver-built bloom proves the driver's
      // positions equal the Spark-function positions bit for bit
      val bytes = java.util.Base64.getDecoder.decode(enc.split(":", 3)(2))
      sparkBits(v).foreach { p =>
        assert((bytes(p >>> 3) & (1 << (p & 7))) != 0,
          s"driver bloom missing spark bit $p for '$v'")
      }
    }
  }

  test("blooms survive the chunk roll: synthetic entries past the " +
      "inline threshold still answer probes from chunked manifests") {
    val t = Files.createTempDirectory("graft_bloom4").toString + "/t"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    // 600 synthetic entries (> the 512 inline threshold), each blooming
    // exactly one disjoint key decade — planning-only, no data files
    val entries = (0 until 600).map { i =>
      FileEntry(s"f$i.parquet",
        stats = Map.empty, size = 1L,
        blooms = Map("k" -> BloomIndex.encodeFor(
          (i * 10 until i * 10 + 10).map(String.valueOf(_)), 4096, 4)))
    }
    SnapshotTable.appendEntries(t, entries.take(550), schema)
    SnapshotTable.appendEntries(t, entries.drop(550), schema)
    val (nChunks, _, _) = SnapshotTable.manifestShape(t)
    assert(nChunks >= 1, "expected at least one rolled chunk")
    val kept = SnapshotTable.filesForRead(t, probes = Seq(ColProbe("k", 5555)))
    assert(kept.contains("f555.parquet"), s"missing the true file: $kept")
    assert(kept.size < 20, s"chunked bloom pruning too weak: ${kept.size}")
  }

  test("compact re-indexes: the merged file answers probes as well as " +
      "the small bloomed files it replaced") {
    val t = Files.createTempDirectory("graft_bloom5").toString + "/t"
    SnapshotTable.appendBloomIndexed(scattered, t, Seq("k"),
      bloomBits = 8192, bloomK = 4)
    val before = SnapshotTable.filesForRead(t)
    // everything is small vs a huge target: all files merge
    val v = SnapshotTable.compact(spark, t, targetFileBytes = 1L << 30)
    assert(v.nonEmpty, "expected a compaction commit")
    val after = SnapshotTable.filesForRead(t)
    assert(after.size < before.size)
    // present key: found, and the absent key still prunes EVERY file —
    // only possible if the compacted output carries a rebuilt bloom
    val got = SnapshotTable.read(spark, t, probes = Seq(ColProbe("k", 1789L)))
      .filter(col("k") === 1789L).count()
    assert(got == 1L)
    assert(SnapshotTable.filesForRead(t,
      probes = Seq(ColProbe("k", 999999L))).isEmpty,
      "compacted file lost its bloom")
  }
}
