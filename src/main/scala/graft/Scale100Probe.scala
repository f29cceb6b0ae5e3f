package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical 100x scale probe (VERDICT r11 #5): synthesizes an sf~10
  * dataset (60M-row lineitem, 10M events, 500K docs) by replicating
  * sf0.1 a hundredfold with shifted keys, then times a battery of
  * linear-by-design gate queries at BOTH scales. The 10x ScaleProbe
  * interpolates the 100x claim; this measures one real point. The
  * battery is the relational headline set plus the CAPPED corpus
  * paths — the quadratic-by-design exact baselines (q19/q43/q80's
  * curation stage) are excluded BY DESIGN: on a 100x-replicated
  * corpus every doc gains 100 clones and their candidate pairs grow
  * ~100x on top of the data growth; their capped twins (q94/q95) ARE
  * the documented scale path and ride this battery instead.
  * Local tool; writes ~6 GB under /tmp.
  */
object Scale100Probe {
  def main(args: Array[String]): Unit = {
    val out = "/tmp/graft_sf10"
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      println("[scale100] generating 100x dataset at " + out)
      val copies = spark.range(100).select(col("id").as("copy"))
      def rep(table: String, keyShifts: Map[String, Long]): Unit = {
        val src = Tables.load(spark, "/root/testdata/sf0.1", table)
        val big = src.crossJoin(copies)
        val shifted = keyShifts.foldLeft(big) { case (d, (c, base)) =>
          d.withColumn(c, col(c) + col("copy") * base)
        }
        shifted.drop("copy").write.mode(SaveMode.Overwrite)
          .parquet(s"$out/$table.parquet")
      }
      rep("lineitem", Map("l_orderkey" -> 10000000L))
      rep("orders", Map("o_orderkey" -> 10000000L))
      rep("events", Map("event_id" -> 10000000L, "user_id" -> 10000L))
      rep("documents", Map("doc_id" -> 1000000L))
      rep("embeddings", Map("vec_id" -> 1000000L))
      Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
        Tables.load(spark, "/root/testdata/sf0.1", t)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      }
    }

    // linear-by-design battery: relational headline + capped corpus +
    // the round-12 suffix array (adjacency linear by construction)
    val battery = Seq(
      "q01_pricing_summary", "q03_region_revenue", "q06_user_daily",
      "q16_anomaly_features", "q42_asof_join", "q181_local_supplier_volume",
      "q213_shipping_priority",
      "q23_langid", "q54_pii_scrub", "q85_bpe_encode_fixed",
      "q95_jaccard_maxdf", "q107_token_budget",
      "q274_longest_repeats",
      // round-13 additions (VERDICT r12 #3): HITS is per-iteration
      // edge joins + grouped sums — linear in |E| (the 100x corpus
      // collapses replicated (cust, part) edges in the up-front
      // distinct, so |E| grows sub-100x by construction — the ratio
      // reads LOW for data-shape reasons, not plan magic); the
      // ExactSubstr rewrite is one gram window + per-doc windows —
      // linear in tokens even though the replicated corpus makes
      // EVERY gram a duplicate (worst-case marking density)
      "q289_hits", "q302_exact_substr_dedup",
      // round-13 continuation: winnowing selection is one per-doc
      // window pass + the capped pair join (boilerplate fingerprints
      // hit maxDf on the replicated corpus — the cap IS the scale
      // path); ROUGE is two per-pair gram counts + one equi-join
      "q305_winnow_pairs", "q307_rouge",
      // round-14 tail (VERDICT r13 #5): BLEU is ROUGE's staging with
      // a maxN x order fan-out (still one explode, grouped counts);
      // Hampel is per-(group, day) windows — both linear by design
      "q308_bleu_components", "q306_hampel_despike",
      // round-14 additions: ROUGE-L is a pure projection (per-pair
      // O(c·r) DP, no join); incremental winnowing is two index
      // appends + the delta join; bloom decontamination's exact join
      // only sees bloom candidates; incremental Hampel is the q306
      // lattice behind a persisted-partials table
      "q309_rouge_l", "q311_winnow_incremental", "q315_bloom_decontam",
      "q312_hampel_incremental",
      // round-15 additions (VERDICT r14 #6): the k-group tests are
      // one or two map-side-combinable grouped aggs over the corpus
      // (post-agg state = groups/blocks/lattice, never rows); span
      // decontamination is a gram semi-join + per-doc cover windows
      // (the q302 shape with the eval suite as the mark source); the
      // incremental decontam faces are index appends + key-restricted
      // probes (the q311 shape)
      "q313_anova", "q314_kruskal_wallis", "q316_friedman",
      "q317_cochran_q", "q318_decontam_scrub",
      "q319_decontam_incremental", "q320_decontam_scrub_incremental",
      // Brown-Forsythe adds one lattice-median pass to the q313
      // shape; chrF is a pure per-row projection (the ChrfMatches
      // native expression); distinct-n is one explode + grouped
      // counts; Moore-Lewis is two LM trainings + two scoring joins
      "q321_brown_forsythe", "q322_chrf", "q323_distinct_n",
      "q324_moore_lewis",
      // Luhn scrub and the loop detector are pure per-row
      // projections; q326 rides the `timed` probe below instead (its
      // eval side is model-size BY CONTRACT — replicating it 100x
      // would break the contract, not measure the plan)
      "q325_luhn_scrub", "q327_loop_detect",
      // JT is lattice aggregations + k^2/2 pair-tagged windows
      // (bounded by the lattice, never rows)
      "q328_jonckheere", "q329_page_trend")
      .filter(n => args.isEmpty || args.contains(n))
    val qs = SparkEntry.queries
    battery.foreach { name =>
      val fn = qs(name)
      def run(dir: String): Double = {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        run("/root/testdata/sf0.1") // warm codegen/classload
        val s = run("/root/testdata/sf0.1")
        val b = run(out)
        println(f"[scale100] $name%-28s sf0.1=$s%7.2fs 100x=$b%8.2fs " +
          f"ratio=${b / s}%6.1f")
      } catch {
        case e: Throwable =>
          println(s"[scale100] $name FAILED: ${e.getMessage}")
      }
    }

    // capped / fixed-parameter scale paths (the ScaleProbe `timed`
    // discipline): gates whose parameterization grows with the corpus
    // probe their production shape instead
    def timed(label: String)(mk: String => org.apache.spark.sql.DataFrame)
        : Unit = {
      // substring match: runMain splits args on whitespace, so a
      // multi-word label is selectable by any of its words
      if (args.nonEmpty && !args.exists(a => label.contains(a))) return
      def run(dir: String): Double = {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        mk(dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        run("/root/testdata/sf0.1")
        val s = run("/root/testdata/sf0.1")
        val b = run(out)
        println(f"[scale100] $label%-28s sf0.1=$s%7.2fs 100x=$b%8.2fs " +
          f"ratio=${b / s}%6.1f")
      } catch {
        case e: Throwable =>
          println(s"[scale100] $label FAILED: ${e.getMessage}")
      }
    }
    // q281's exact path multiplies posting-list pairs quadratically on
    // a replicated corpus (documented exact-baseline curve); maxDf is
    // the linear scale path — the q95 contract
    // semantic decontamination at its PRODUCTION shape: the training
    // side scales 100x, the eval suite stays the sf0.1 slice
    // (model-size by contract) — cost is one broadcast cross +
    // map-side-combinable argmax, linear in train rows
    timed("semantic decontam fixed-eval") { dir =>
      graft.core.Decontaminate.flagContaminatedEmbedding(
        Tables.embeddings(spark, dir)
          .filter(col("vec_id") % 10 =!= 0),
        Tables.embeddings(spark, "/root/testdata/sf0.1")
          .filter(col("vec_id") % 10 === 0),
        threshold = 0.42)
    }
    // the PERSISTED-index faces at their production shape (the q330/
    // q331 gates parameterize eval from the corpus; here the suite is
    // the FIXED sf0.1 slice — model-size by contract — and only the
    // training side scales 100x). Incremental = index appends + two
    // per-version screens (q330); IVF exact = every bucket probed over
    // the indexed suite, per-task state one bucket (q331). Index
    // creation is part of the timed face on purpose: the append IS
    // the incremental op's cost.
    timed("semantic incr eval=const") { dir =>
      val t = java.nio.file.Files
        .createTempDirectory("probe_semincr").toString + "/idx"
      val ev = Tables.embeddings(spark, "/root/testdata/sf0.1")
      val train = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 10 =!= 0)
      val d1 = graft.core.Decontaminate
        .flagContaminatedEmbeddingIncremental(spark, train,
          ev.filter(col("vec_id") % 20 === 0), t, threshold = 0.42)
      val d2 = graft.core.Decontaminate
        .flagContaminatedEmbeddingIncremental(spark, train,
          ev.filter(col("vec_id") % 20 === 10), t, threshold = 0.42)
      d1.unionByName(d2)
    }
    timed("semantic ivf eval=const") { dir =>
      val t = java.nio.file.Files
        .createTempDirectory("probe_semivf").toString + "/idx"
      val ev01 = Tables.embeddings(spark, "/root/testdata/sf0.1")
      graft.core.Decontaminate.writeEvalEmbeddingIndex(
        ev01.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", t)
      val cents = ev01.filter(col("vec_id") % 97 === 3)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      graft.core.Decontaminate.flagContaminatedEmbeddingIvf(spark,
        Tables.embeddings(spark, dir).filter(col("vec_id") % 10 =!= 0),
        t, cents, threshold = 0.42, nProbe = 0)
    }
    timed("editdist maxDf=64") { dir =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"),
        lower(substring(trim(col("text")), 1, 40)).as("key"))
      graft.core.Dedup.editNearDupPairs(docs, "doc_id", "key",
        k = 2, q = 3, maxDf = 64)
    }
    // q303's bucketed LOF has two tunable cost components:
    // assignment (n x B brute-force cross — the q49 artifact, probed
    // linear with fixed k in ScaleProbe) and candidate pairs
    // (n x nProbe x avg bucket). The gate's B = n/97 keeps candidates
    // linear but makes assignment n²/97; fixed B keeps assignment
    // linear but grows buckets 100x. The balanced sqrt-style point —
    // centroids from copies 0-9 only, B ~ 10x, buckets ~ 10x — bounds
    // BOTH components at ~sqrt growth, the two-level-IVF operating
    // point a 100 TB deployment would pick
    timed("lof bucketed B=sqrt") { dir =>
      val emb = Tables.embeddings(spark, dir)
      val centroids = emb
        .filter(col("vec_id") % 97 === 3 && col("vec_id") < 10000000L)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      graft.core.Similarity.lofBucketed(emb, centroids, k = 5, nProbe = 2)
    }
    // two-level assignment at 100x: coarse modulus sqrt-scales
    // (388 -> 3880), so both stages stay n·sqrt(B) where the flat
    // cross would be n x B = n²/97
    timed("hier assign C=sqrt") { dir =>
      val emb = Tables.embeddings(spark, dir)
      val m = if (dir == out) 3880L else 388L
      val fine = emb.filter(col("vec_id") % 97 === 3)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      val coarse = emb.filter(col("vec_id") % m === 3)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      graft.core.Similarity.assignBucketsHierarchical(emb, coarse, fine,
        wProbe = 2)
    }
    // the scale-safe DEFAULT parameterization (VERDICT r13 #6):
    // B ∝ n (fine modulus fixed at 97 -> expected bucket size stays
    // ~97, candidate pairs stay ~n·nProbe·97 = LINEAR), assignment
    // through the two-level prober so no n×B flat cross ever runs.
    // Contrast with "lof bucketed B=sqrt" above, whose pair count
    // deliberately grows ~n^1.5
    timed("lof two-level B∝n") { dir =>
      val emb = Tables.embeddings(spark, dir)
      val m = if (dir == out) 3880L else 388L
      val fine = emb.filter(col("vec_id") % 97 === 3)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      val coarse = emb.filter(col("vec_id") % m === 3)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      graft.core.Similarity.lofBucketedTwoLevel(emb, coarse, fine,
        k = 5, nProbe = 2, wProbe = 2)
    }
    // pair-count linearity evidence for the row above: candidate
    // pairs = Σ_b |probe(b)|·|home(b)| from the two-level probe
    // relation — reported at both scales so the LINEAR claim is a
    // measured number, not an asymptotic argument
    if (args.isEmpty || args.exists(a => "lof pairs B∝n".contains(a))) {
      def pairCount(dir: String): Long = {
        val emb = Tables.embeddings(spark, dir)
        val m = if (dir == out) 3880L else 388L
        val fine = emb.filter(col("vec_id") % 97 === 3)
          .select(col("vec_id").as("centroid_id"), col("embedding"))
        val coarse = emb.filter(col("vec_id") % m === 3)
          .select(col("vec_id").as("centroid_id"), col("embedding"))
        val ranked = graft.core.Similarity.probeBucketsHierarchical(
          emb, coarse, fine, wProbe = 2, nProbe = 2)
        val home = ranked.filter(col("rnk") === 1)
          .groupBy("cid").agg(count(lit(1)).as("h"))
        val probe = ranked.groupBy("cid").agg(count(lit(1)).as("p"))
        probe.join(home, "cid")
          .agg(sum(col("p") * col("h")).as("pairs"))
          .collect()(0).getLong(0)
      }
      val s = pairCount("/root/testdata/sf0.1")
      val b = pairCount(out)
      println(f"[scale100] lof pairs B∝n           sf0.1=$s%d pairs " +
        f"100x=$b%d pairs ratio=${b.toDouble / s}%6.1f")
    }
    spark.stop()
  }
}
