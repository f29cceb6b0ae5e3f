package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Packing
import graft.sources.SnapshotTable

/** Stage-by-stage timing of q83's pack→shard-commit→pruned-read loop —
  * budget attribution for the r6 regression (VERDICT r6 #4: 0.79 s →
  * 1.50 s driver-measured after the chunked-manifest rewrite).
  */
object ProfileQ83 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to 3).foreach { i =>
      println(s"--- iteration $i")
      val docs = Tables.documents(spark, dir)
      val seqs = time("packSequences plan")(
        Packing.packSequences(docs, "doc_id", "text", seqLen = 512))
      time("pack execute (noop)")(
        seqs.write.format("noop").mode("overwrite").save())
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft_q83_prof")
      val table = tmpRoot.toString + "/seqs"
      try {
        time("writeShards total")(Packing.writeShards(seqs, table, shards = 8))
        time("pruned read")(
          SnapshotTable.read(spark, table, prune = Seq(
              SnapshotTable.ColRange("seq_id", upper = Some(3L))))
            .filter(col("seq_id") <= 3).write.format("noop")
            .mode("overwrite").save())
        time("full q83")(
          SparkEntry.queries("q83_pack_shards")(spark, dir)
            .write.format("noop").mode("overwrite").save())
      } finally {
        // repeated profiling runs were accumulating 3x8-shard temp
        // tables per invocation — delete each iteration's tree
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        val walk = Files.walk(tmpRoot)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally walk.close()
      }
    }
    spark.stop()
  }
}
