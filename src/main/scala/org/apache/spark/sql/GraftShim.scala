package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface for wrapping custom
  * Catalyst expressions as user-facing Columns (Spark 4 removed the
  * public `new Column(expr)` constructor) and registering SQL
  * functions on an existing session.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime registration on any session (the driver hands us ITS
    * session, so extension-based injection isn't available there).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Analyzed logical plan of a DataFrame (for building custom
    * logical nodes over existing frames).
    */
  def logicalPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The physical plan with the AQE wrapper unwrapped (its INITIAL
    * plan — runtime re-optimization can only merge/coalesce, never
    * introduce a new unpartitioned window), for plan-shape regression
    * tests that inspect operator nodes rather than plan strings.
    */
  def physicalPlan(df: Dataset[_]): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }

  /** DataFrame from a custom logical plan. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Fork of the session with an isolated copy of the session state
    * (confs, temp views) sharing the same SparkContext. Lets a write
    * path pin a session conf (e.g. parquet output timestamp type)
    * without mutating — or racing — the caller's session.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** DataFrame over an EXPLICIT parquet file list with KNOWN sizes:
    * the caller's (manifest-derived) file index is handed to the
    * planner as-is, so planning performs ZERO storage round-trips —
    * `spark.read.parquet(paths*)` stats every path to build its
    * InMemoryFileIndex, which is O(files) driver I/O (measured
    * ~1.7 ms/file: 16.7 s to merely PLAN a 10k-file read). This is how
    * Delta/Iceberg natively plan scans: the transaction log already
    * knows every file's size. Split planning, column pruning, filter
    * pushdown and AQE stats (sizeInBytes = manifest sum) all behave
    * exactly as with a listed index.
    */
  def manifestParquet(spark: SparkSession,
                      files: Seq[(String, Long)],
                      schema: types.StructType): DataFrame = {
    import org.apache.spark.sql.execution.datasources._
    // qualify exactly as manifestFileIndex does: against a non-local
    // defaultFS an unqualified path would resolve differently from the
    // listed-read fallback, and the two manifest paths must agree
    val hconf = spark.sessionState.newHadoopConf()
    // ONE FileSystem resolution for the whole list (a synchronized
    // cache lookup per file would serialize 1M-file planning); table
    // files share a filesystem by construction
    val fs = files.headOption.map { case (p, _) =>
      new org.apache.hadoop.fs.Path(p).getFileSystem(hconf) }
    val statuses = files.map { case (p, len) =>
      val hp = new org.apache.hadoop.fs.Path(p)
      new org.apache.hadoop.fs.FileStatus(len, false, 1, 134217728L, 0L,
        fs.get.makeQualified(hp))
    }
    val index = new FileIndex {
      override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
        statuses.map(_.getPath)
      override def listFiles(
          partitionFilters: Seq[Expression],
          dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
        Seq(PartitionDirectory(
          org.apache.spark.sql.catalyst.InternalRow.empty, statuses.toArray))
      override def inputFiles: Array[String] =
        statuses.map(_.getPath.toString).toArray
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = files.map(_._2).sum
      override def partitionSchema: types.StructType = new types.StructType()
    }
    // file-based reads always relax the schema to nullable (a file
    // written before an appended column must project it as null) —
    // DataSource.resolveRelation does this for spark.read; a direct
    // relation must do it itself
    val relation = HadoopFsRelation(index, new types.StructType(),
      schema.asNullable, None, new parquet.ParquetFileFormat(), Map.empty)(
      spark.asInstanceOf[classic.SparkSession])
    ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }

  /** Drain the async SparkListener bus (it is `private[spark]`) — for
    * tests that count jobs via a listener: a fixed sleep undercounts
    * under load, while a drain is exact.
    */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  /** [[manifestParquet]]'s index as the RICHER
    * `PartitioningAwareFileIndex` the DSv2 `ParquetScanBuilder`
    * requires — same zero-storage-round-trip contract: leaf files and
    * their lengths come straight from the caller's manifest, no
    * listing, no per-file stat.
    */
  def manifestFileIndex(spark: SparkSession, files: Seq[(String, Long)])
      : org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex = {
    import org.apache.spark.sql.execution.datasources._
    import org.apache.hadoop.fs.{FileStatus, Path => HPath}
    // PartitioningAwareFileIndex qualifies root paths through the
    // filesystem before looking them up in leafFiles/
    // leafDirToChildrenFiles — the recorded statuses must carry the
    // SAME qualified form (file:/… locally) or every lookup misses and
    // the scan silently reads nothing
    val hconf = spark.sessionState.newHadoopConf()
    // one FileSystem resolution for the list, as in manifestParquet
    val fs = files.headOption.map { case (p, _) =>
      new HPath(p).getFileSystem(hconf) }
    val statuses = files.map { case (p, len) =>
      val hp = new HPath(p)
      new FileStatus(len, false, 1, 134217728L, 0L, fs.get.makeQualified(hp))
    }
    new PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {
      // planning calls these accessors repeatedly — build both
      // collections ONCE (O(files) per call would tax exactly the
      // large-table path this index exists to speed up)
      private val cachedLeafFiles = {
        val m = scala.collection.mutable.LinkedHashMap.empty[HPath, FileStatus]
        statuses.foreach(s => m += (s.getPath -> s))
        m
      }
      private val cachedDirToChildren: Map[HPath, Array[FileStatus]] =
        statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap
      override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
      override def leafFiles
          : scala.collection.mutable.LinkedHashMap[HPath, FileStatus] =
        cachedLeafFiles
      override def leafDirToChildrenFiles: Map[HPath, Array[FileStatus]] =
        cachedDirToChildren
      override def rootPaths: Seq[HPath] = statuses.map(_.getPath)
      override def refresh(): Unit = ()
    }
  }
}
