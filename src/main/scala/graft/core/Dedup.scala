package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline:
  *
  *  - exact dedup (hash group-by)
  *  - n-gram Jaccard near-dup via an inverted shingle index (NEVER a
  *    cross join: candidate pairs come from a shingle-key equi-join,
  *    which shuffles by shingle and scales linearly in total shingle
  *    instances)
  *  - MinHash + LSH banding (signature = k lexicographic minima of
  *    seeded md5s — portable across engines, unlike murmur3)
  *  - SimHash (bitwise majority of token-hash bits)
  *
  * All plans are shuffle-by-key only; nothing collects to the driver.
  * At 100 TB: exact dedup is one hash aggregate; MinHash/LSH is
  * explode -> two key-partitioned aggregates -> a self-equi-join on
  * band keys whose fan-out is controlled by the band width.
  */
object Dedup {

  /** Word n-gram shingles of a text column (default 3-grams), distinct
    * per document. Native single-pass expression
    * ([[graft.expressions.ShingleArray]]); [[shinglesHof]] is the
    * built-ins-only formulation kept as its semantic oracle.
    */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.expressions.ShingleArray(
        org.apache.spark.sql.GraftShim.expression(text), n))

  /** HOF formulation of [[shingles]] — identical semantics, but the
    * lambda re-evaluates the tokenization per window position (kept
    * only as the test oracle for the native expression).
    */
  def shinglesHof(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact dedup: group identical texts by sha2, keep the smallest id
    * as canonical. One hash aggregate; at scale the 256-bit key keeps
    * group skew at true-duplicate skew only.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Drop exact duplicates, keeping the min-id row per distinct text. */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Candidate near-dup pairs by n-gram Jaccard similarity.
    *
    * Inverted-index plan: explode distinct shingles, self-join on the
    * shingle (id_a < id_b), count common shingles per pair, then
    * |A∩B| / (|A| + |B| − |A∩B|). The shingle join replaces the O(n²)
    * cross join with a shuffle keyed on shingle text.
    */
  /** `maxDf` drops stop-shingles (document frequency above the cap)
    * from candidate generation — at web scale a shingle appearing in
    * millions of docs contributes d^2/2 combos while carrying no
    * near-dup signal. Denominators still count all shingles, so capped
    * Jaccard is a LOWER BOUND of the exact value (pairs only ever
    * drop out, never gain). Default: no cap (exact Jaccard; the
    * driver-gate oracle uses this).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = df.select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val inv = sh.select(col("doc"), col("n_sh"), explode(col("sh")).as("shingle"))
    // Single-pass inverted index instead of a self-join: group the
    // postings by shingle, emit each posting list's pair combinations
    // with an array expression, then count per pair. One exchange on
    // shingle + one on the pair key — the self-join variant scanned and
    // shingled the corpus twice and shuffled three times. Posting-list
    // skew is bounded: a stop-shingle with document frequency d emits
    // d^2/2 combos, so extreme-DF shingles should be filtered upstream
    // by the caller at web scale (maxDf hook below).
    val byShingle = inv.groupBy("shingle")
      .agg(collect_list(struct(col("doc"), col("n_sh"))).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxDf)
      .select(array_sort(col("ds")).as("ds"))
    // custom Generator: emits the d(d-1)/2 pairs of each sorted posting
    // list in one pass (the nested-transform + flatten + explode
    // formulation re-evaluated interpreted lambdas per (i,j))
    val combos = byShingle.select(
      org.apache.spark.sql.GraftShim.column(
        graft.expressions.PairCombinations(
          org.apache.spark.sql.GraftShim.expression(col("ds"))))
        .as(Seq("doc_a", "n_a", "doc_b", "n_b")))
    val pairs = combos
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .withColumn("jaccard",
        col("n_common").cast("double")
          / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Affine mixing constants for the k MinHash "permutations"
    * (h_i = (A_i·h + B_i) mod P over an md5-derived base hash). Fixed
    * and engine-portable — an external oracle reproduces them exactly.
    */
  val MinhashP = 1000000007L
  val MinhashA: Seq[Long] = Seq(1299721L, 1299743L, 1299763L, 1299791L,
    1299811L, 1299817L, 1299821L, 1299827L)
  val MinhashB: Seq[Long] = Seq(15485863L, 15485867L, 15485917L, 15485927L,
    15485933L, 15485941L, 15485959L, 15485989L)

  /** Portable base hash of a shingle: the engine's codegen'd
    * polynomial rolling hash (already in [0, P)). Replaced an
    * md5+hex-parse base hash — one cheap single-pass fold instead of a
    * digest per shingle, same portability (any engine with ascii() +
    * a list fold reproduces it).
    */
  def shingleHash(shingle: Column): Column = TextAnalysis.rollingHash(shingle)

  /** MinHash signature (Broder '97): component i = MIN over shingles of
    * (A_i·h + B_i) mod P. Output: doc, mh_0..mh_{k-1}.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, n: Int = 3): DataFrame = {
    require(k <= MinhashA.length, s"at most ${MinhashA.length} components")
    val sh = df.select(col(idCol).as("doc"), explode(shingles(col(textCol), n)).as("shingle"))
      .withColumn("h", shingleHash(col("shingle")))
    val mins = (0 until k).map(i =>
      min((col("h") * MinhashA(i) + MinhashB(i)) % MinhashP).as(s"mh_$i"))
    sh.groupBy("doc").agg(mins.head, mins.tail: _*)
  }

  /** LSH banding over MinHash signatures: rows/band consecutive
    * signature components hashed together; docs sharing any band key
    * become candidate pairs. Estimated Jaccard = fraction of equal
    * signature components. bands * rowsPerBand must equal k.
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, rowsPerBand: Int = 2, n: Int = 3,
                    minEstJaccard: Double = 0.0): DataFrame = {
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    val sigs = minhashSignatures(df, idCol, textCol, k, n)
    val bands = k / rowsPerBand
    val banded = sigs.select(
      col("doc") +:
        (0 until bands).map { b =>
          val cols = (0 until rowsPerBand)
            .map(r => col(s"mh_${b * rowsPerBand + r}").cast("string"))
          md5(concat_ws("|", cols: _*)).as(s"band_$b")
        } :+ array((0 until k).map(i => col(s"mh_$i")): _*).as("sig"): _*)
    val exploded = banded.select(col("doc"), col("sig"),
      posexplode(array((0 until bands).map(b => col(s"band_$b")): _*)).as(Seq("band_idx", "band_key")))
    val cand = exploded.as("a").join(exploded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / k)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** Connected components over near-dup candidate pairs: docs linked
    * by any pair form a duplicate cluster; every doc gets the MIN doc
    * id of its component as `cluster_id`.
    *
    * Iterative min-label propagation: each round joins current labels
    * across the edge list and keeps the minimum. Convergence is
    * O(component diameter) rounds — near-dup clusters are dense
    * (diameter 1-2 in practice), so `maxIter` rounds cover chains up to
    * `maxIter` hops; non-convergence THROWS rather than returning stale
    * labels (a large-star/small-star contraction would give O(log n),
    * at the cost of two alternating shuffles per round). Each round is
    * one shuffle on doc id — no driver-side graph.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 10,
                        driverThreshold: Long = 1000000L): DataFrame = {
    // Candidate pairs are COMPACT even for a huge corpus (near-dup
    // rate x docs, post-threshold) — when they fit comfortably on the
    // driver, path-compressed union-find beats a multi-job iterative
    // plan (each distributed round costs ~2 job launches regardless of
    // data size). The distributed loop below remains the path for
    // genuinely large edge sets.
    // One action probes AND fetches: collect up to threshold+1 edges in
    // a single job, then branch on how many came back. (An earlier
    // limit().count() probe followed by a separate collect() executed
    // the full upstream candidate pipeline twice — at q43 scale that
    // doubled the most expensive subplan in the suite.)
    val spark = pairs.sparkSession
    import spark.implicits._
    val edgePairs = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
    val es = edgePairs.limit((driverThreshold + 1).toInt).as[(Long, Long)].collect()
    if (es.length <= driverThreshold) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val labels = parent.keys.map(k => (k, find(k))).toSeq
      return labels.toDF("doc", "cluster_id")
    }
    // Large edge set: persist the pair pipeline once so the iterative
    // loop's repeated scans don't re-run candidate generation per round.
    val cached = edgePairs.toDF("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // undirected edge list, both directions
    val edges = cached.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(cached.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
    val nodes = edges.select(col("src").as("doc")).distinct()
    var labels = nodes.withColumn("cluster_id", col("doc"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node adopts the min label among itself and its neighbors
      val neighborLabels = edges
        .join(labels.withColumnRenamed("doc", "src")
          .withColumnRenamed("cluster_id", "nl"), "src")
        .groupBy(col("dst").as("doc"))
        .agg(min(col("nl")).as("nl"))
      val updated = labels.join(neighborLabels, Seq("doc"), "left")
        .select(col("doc"),
          least(col("cluster_id"), coalesce(col("nl"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint() // truncate the growing iterative lineage
      val changed = updated.as("u")
        .join(labels.as("l"), "doc")
        .filter(col("u.cluster_id") =!= col("l.cluster_id"))
        .limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    cached.unpersist()
    if (!converged)
      // Min-label propagation converges in O(component diameter)
      // rounds; a chain longer than maxIter hops would exit here with
      // stale labels. Surface it rather than silently returning wrong
      // cluster ids.
      throw new IllegalStateException(
        s"duplicateClusters: label propagation did not converge in $maxIter " +
          "rounds (a component's diameter exceeds maxIter); raise maxIter")
    labels
  }

  /** Resolve near-dup clusters to survivors: every doc mapped to its
    * cluster's canonical (min-id) doc; docs in no pair survive as
    * themselves.
    */
  def resolveSurvivors(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = duplicateClusters(pairs)
      .withColumnRenamed("doc", idCol)
    df.join(clusters, Seq(idCol), "left")
      .withColumn("survivor_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("is_survivor", col("survivor_id") === col(idCol))
      .drop("cluster_id")
  }

  /** SimHash (Charikar '02): 32-bit fingerprint where bit i is the
    * majority vote of bit i across all token rolling-hashes. Built
    * entirely from higher-order array expressions — no UDF, no shuffle
    * beyond the final projection's parent plan.
    */
  /** Per-doc 32-bit SimHash as explode -> one grouped aggregation.
    *
    * Each token's rolling hash is computed exactly once on its own row
    * (an earlier array-lambda formulation re-evaluated every token
    * hash once per bit — a measured 10x slowdown, because nested
    * higher-order-function lambdas re-evaluate their input per outer
    * iteration and CollapseProject inlines single-use projections).
    * The 32 bit-votes are plain literal-shift aggregates, so the whole
    * thing is two codegen'd stages: scan+explode+hash, then
    * partial/final HashAggregate keyed by doc — shuffle only carries
    * 32 longs per doc.
    */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .withColumn("__h", TextAnalysis.rollingHash(col("__tok")))
    val votes = (0 until 32).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"__v$i")
    }
    val simhash = (0 until 32).map { i =>
      when(col(s"__v$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    tok.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), simhash.as("simhash"))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
