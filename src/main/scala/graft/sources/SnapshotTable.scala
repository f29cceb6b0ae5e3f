package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Minimal snapshot-isolated table format over plain parquet — the
  * core idea of log-structured lakehouse formats (Delta Lake, VLDB'20)
  * reduced to its essentials:
  *
  *  - data lives in immutable parquet files under `data/`;
  *  - a version's content is EXACTLY the file list in
  *    `_manifests/v{N}.json`; the current version is the highest N;
  *  - a commit writes new data files, then publishes a new manifest by
  *    ATOMIC rename — readers resolve a manifest first and only ever
  *    see a complete, committed snapshot (no partial writes, no
  *    torn directory listings);
  *  - old versions stay readable (time travel) until vacuumed.
  *
  * This upgrades `ParquetMerge`'s whole-directory swap: commits are
  * O(new data) instead of O(table), concurrent readers are never
  * blocked, and every historical version remains addressable. At
  * cloud-storage scale the manifest would also carry per-file
  * min/max stats for pruning — the commit protocol is the load-bearing
  * part and is what's implemented here.
  */
object SnapshotTable {

  private def manifestDir(table: String): Path = Paths.get(table, "_manifests")
  private def dataDir(table: String): Path = Paths.get(table, "data")

  def currentVersion(table: String): Option[Int] = {
    val md = manifestDir(table)
    if (!Files.exists(md)) None
    else {
      val vs = Files.list(md).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toInt }
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  private def readManifest(table: String, version: Int): Seq[String] = {
    val txt = Files.readString(manifestDir(table).resolve(s"v$version.json"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    (0 until node.get("files").size).map(node.get("files").get(_).asText)
  }

  private def writeManifest(table: String, version: Int, files: Seq[String]): Unit = {
    Files.createDirectories(manifestDir(table))
    val json = files.map(f => "\"" + f + "\"").mkString(
      s"""{"version": $version, "files": [""", ",", "]}")
    val tmp = manifestDir(table).resolve(s".v$version.json.tmp")
    Files.writeString(tmp, json)
    // atomic publish: the manifest appears fully-written or not at all
    Files.move(tmp, manifestDir(table).resolve(s"v$version.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Write `df` as new immutable data files; returns their names. */
  private def writeData(df: DataFrame, table: String): Seq[String] = {
    val staging = Paths.get(table, s".staging-${java.util.UUID.randomUUID()}")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    Files.createDirectories(dataDir(table))
    val moved = Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val name = s"${java.util.UUID.randomUUID()}.parquet"
        Files.move(p, dataDir(table).resolve(name))
        name
      }.toSeq
    Files.walk(staging).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    moved
  }

  /** Append: new files + manifest(previous files ++ new files). */
  def append(df: DataFrame, table: String): Int = {
    val newFiles = writeData(df, table)
    val v = currentVersion(table).getOrElse(-1) + 1
    val prev = if (v == 0) Nil else readManifest(table, v - 1)
    writeManifest(table, v, prev ++ newFiles)
    v
  }

  /** Overwrite: new files only. */
  def overwrite(df: DataFrame, table: String): Int = {
    val newFiles = writeData(df, table)
    val v = currentVersion(table).getOrElse(-1) + 1
    writeManifest(table, v, newFiles)
    v
  }

  /** Keyed MERGE (last-write-wins within `updates`, like ParquetMerge):
    * survivors of the current snapshot + deduped updates become the
    * next version's files. O(table) rewrite like any copy-on-write
    * merge, but readers keep the old snapshot until the atomic publish.
    */
  def upsert(spark: SparkSession, df: DataFrame, table: String, key: String): Int = {
    val deduped = df.dropDuplicates(key)
    val merged = currentVersion(table) match {
      case None => deduped
      case Some(v) =>
        read(spark, table, Some(v))
          .join(deduped.select(key).distinct(), Seq(key), "left_anti")
          .unionByName(deduped)
    }
    // materialize before writing: `merged` reads the files we replace
    val out = merged.localCheckpoint()
    overwrite(out, table)
  }

  /** Read the table at `version` (default: latest snapshot). */
  def read(spark: SparkSession, table: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(table))
      .getOrElse(throw new IllegalArgumentException(s"no committed version in $table"))
    val files = readManifest(table, v)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(
      files.map(f => dataDir(table).resolve(f).toString): _*)
  }

  /** Drop data files not referenced by the latest `keepVersions`
    * manifests, and the older manifests themselves.
    */
  def vacuum(table: String, keepVersions: Int = 1): Unit = {
    val latest = currentVersion(table).getOrElse(return)
    val keep = (math.max(0, latest - keepVersions + 1) to latest)
    val referenced = keep.flatMap(readManifest(table, _)).toSet
    Files.list(dataDir(table)).iterator().asScala
      .filter(p => !referenced.contains(p.getFileName.toString))
      .foreach(Files.delete)
    Files.list(manifestDir(table)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.endsWith(".json") &&
          !keep.contains(n.stripPrefix("v").stripSuffix(".json").toInt)
      }
      .foreach(Files.delete)
  }
}
