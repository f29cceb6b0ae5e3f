package graft

import java.nio.file.Files

import graft.sources.{Layout, SnapshotTable}
import org.apache.spark.sql.functions._

/** Z-order clustering + SnapshotTable stats pruning: a predicate on
  * EITHER clustered column must skip files; a single-column sort only
  * skips on its leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // two independent uniform dimensions — worst case for 1-D sort
  private def data = spark.range(20000).select(
    $"id".cast("long").as("a"),
    pmod(hash($"id"), lit(20000)).cast("long").as("b"),
    $"id".as("payload"))

  test("z-order prunes files on both dimensions; 1-D sort only on its own") {
    val base = Files.createTempDirectory("zorder").toString
    val sorted1d = s"$base/sorted_a"
    val zordered = s"$base/zorder_ab"

    SnapshotTable.append(
      data.repartitionByRange(16, $"a").sortWithinPartitions("a"), sorted1d)
    Layout.zOrderInto(spark, data, zordered, Seq("a", "b"), bitsPerCol = 4,
      nFiles = 16)

    def files(table: String, colName: String): Int =
      SnapshotTable.filesForRead(table, prune = Seq(
        SnapshotTable.ColRange(colName, Some(9000L), Some(10000L)))).size

    val total = SnapshotTable.filesForRead(sorted1d).size
    assert(total == 16)

    // leading-column predicate: both layouts prune
    assert(files(sorted1d, "a") <= 3, s"1-D sort must prune on a: ${files(sorted1d, "a")}")
    assert(files(zordered, "a") < 16, s"z-order must prune on a: ${files(zordered, "a")}")
    // second-column predicate: only z-order prunes
    assert(files(sorted1d, "b") == 16,
      "a 1-D sort cannot skip anything on the non-sorted column")
    assert(files(zordered, "b") < 12,
      s"z-order must prune on b too: ${files(zordered, "b")}/16")

    // correctness: clustered write loses no rows
    val back = SnapshotTable.read(spark, zordered)
    assert(back.count() == 20000)
    assert(back.agg(sum("payload")).head().getLong(0) ==
      data.agg(sum("payload")).head().getLong(0))
    // pruned read returns exactly the predicate's rows
    val pruned = SnapshotTable.read(spark, zordered, prune = Seq(
      SnapshotTable.ColRange("b", Some(9000L), Some(10000L))))
      .filter($"b" >= 9000L && $"b" <= 10000L)
    val full = data.filter($"b" >= 9000L && $"b" <= 10000L)
    assert(pruned.count() == full.count())
  }
}
