package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.core.{Retrieval, Similarity}
import graft.sources.SnapshotTable

/** Executed-plan pruning proofs for the snapshot-table SERVING paths
  * behind q100 (IVF ANN from the persisted index) and q102 (BM25 from
  * the persisted postings index) — round-11 verdict #6. The unit specs
  * prove the pruning PRIMITIVE (filesForRead); these tests pin that the
  * prune actually REACHES the serving reads' executed plans: the index
  * is built with the gate queries' exact builder calls (two commits,
  * clusterPartitions=8 → bucket-ranged files), then a sparse probe —
  * the production point-query posture — must plan a scan over strictly
  * fewer files than the table holds. A regression that drops the
  * ColRange (or breaks footer-stats collection at write time) makes
  * these scans read the whole index and fails here, not in a bench
  * log. (The gate queries themselves probe MOST buckets by
  * construction — 8 queries / multi-term docs — so their envelopes
  * legitimately span the table; the prune's effectiveness is a
  * function of probe sparsity, which is what these serve.)
  */
class IndexPruningGateSpec extends SparkSpec {

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap(walk)

  /** File counts of every file-source scan rooted in `dir`. */
  private def indexScanFiles(df: DataFrame, dir: String): Seq[Int] =
    walk(org.apache.spark.sql.GraftShim.physicalPlan(df)).collect {
      case f: FileSourceScanExec
          if f.relation.location.inputFiles.exists(_.contains(dir)) =>
        f.relation.location.inputFiles.length
    }

  test("q100 serving path: a sparse IVF probe plans a manifest-pruned " +
      "scan (strictly fewer files than the index holds)") {
    val emb = Tables.embeddings(spark, Sf0001)
    val centroids = emb.filter(col("vec_id") % 97 === 3)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val t = java.nio.file.Files.createTempDirectory("prune_q100")
      .toString + "/ivf"
    // the gate's exact two-commit build
    Similarity.writeIvfIndexTable(
      emb.filter(col("vec_id") % 2 === 0), centroids, t,
      clusterPartitions = Some(8))
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") % 2 === 1), centroids, t,
      clusterPartitions = Some(8))
    val total = SnapshotTable.filesForRead(t).size
    assert(total >= 8, s"index should hold several files, got $total")
    // ONE query, nProbe=2 → a tight bucket envelope
    val served = Similarity.ivfTopKIndexedTable(spark,
      emb.filter(col("vec_id") === 0), t, centroids, k = 5, nProbe = 2)
    val scans = indexScanFiles(served, t)
    assert(scans.nonEmpty, "no index scan in the serving plan")
    assert(scans.forall(n => n > 0 && n < total),
      s"sparse probe scans $scans of $total files — prune not reaching " +
        "the executed plan")
    assert(served.count() > 0)
  }

  test("q102 serving path: a sparse BM25 probe plans manifest-pruned " +
      "postings + stats scans") {
    val d = Tables.documents(spark, Sf0001)
    val train = d.filter(col("doc_id") % 100 =!= 0)
    val t = java.nio.file.Files.createTempDirectory("prune_q102")
      .toString + "/postings"
    // the gate's exact two-commit build
    Retrieval.writePostingsIndex(
      train.filter(col("doc_id") % 2 === 0), t, clusterPartitions = Some(8))
    Retrieval.appendToPostingsIndex(
      train.filter(col("doc_id") % 2 =!= 0), t, clusterPartitions = Some(8))
    val total = SnapshotTable.filesForRead(t).size
    assert(total >= 8, s"index should hold several files, got $total")
    // a one-term query doc → one postings bucket + the length bucket
    import spark.implicits._
    val oneTerm = Seq((999999L, "customer")).toDF("doc_id", "text")
    val served = Retrieval.bm25TopKIndexedTable(spark, oneTerm, t, k = 10)
    val scans = indexScanFiles(served, t)
    assert(scans.size >= 2, s"expected postings + stats scans, got $scans")
    assert(scans.forall(n => n > 0 && n < total),
      s"sparse probe scans $scans of $total files — prune not reaching " +
        "the executed plan")
    assert(served.count() > 0)
  }
}
