package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom node (SURVEY custom-operator preference (c)):
  * backward as-of join as a first-class plan — logical node, planner
  * strategy, and a sort-merge physical exec.
  *
  * Semantics: for each left row, attach the single most recent right
  * row with equal key and right.ts <= left.ts (nulls when none) —
  * identical to `Joins.asofBackward` (the composed form, which the
  * driver-gate q42 uses and DuckDB's native ASOF JOIN verifies); the
  * equivalence of the two implementations is asserted in tests.
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * by (key, ts); one streaming merge pass per partition carrying the
  * latest right row — the same exchange+sort cost as the composed
  * union+window form, but with no union row-widening and no window
  * buffer.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTs: Expression, rightTs: Expression,
                    rightValues: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        rightValues: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val rVals = rightValues.map(a => BindReferences.bindReference(a: Expression, right.output))
    val nRight = rightValues.length
    val keyType = leftKey.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd projections/orderings are NOT serializable —
      // generate them per partition, on the executor
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(keyType))
      val keyProjL = UnsafeProjection.create(Seq(lKey))
      val keyProjR = UnsafeProjection.create(Seq(rKey))
      val valProj = UnsafeProjection.create(rVals)
      // bind against NULLABLE right attrs: the carried side is null on
      // no-match rows even when the source column was non-nullable
      // (a non-nullable binding would skip null checks and read 0.0)
      val outProj = UnsafeProjection.create(output,
        left.output ++ rightValues.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill(nRight)(null))

      val rBuf = rIter.buffered
      var carriedKey: org.apache.spark.sql.catalyst.expressions.UnsafeRow = null
      var carriedVal: InternalRow = null

      lIter.map { lRow =>
        val lk = keyProjL(lRow)
        val lt = lTs.eval(lRow).asInstanceOf[Long]
        // drop carried state from a previous (smaller) key
        if (carriedKey != null && keyOrd.compare(carriedKey, lk) != 0) {
          carriedKey = null; carriedVal = null
        }
        // advance the right side through keys < lk, and through rows
        // with key == lk and ts <= lt, carrying the latest value
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val rk = keyProjR(head)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0) { rBuf.next() }
          else if (cmp == 0) {
            val rt = rTs.eval(head).asInstanceOf[Long]
            if (rt <= lt) {
              carriedKey = rk.copy()
              carriedVal = valProj(rBuf.next()).copy()
            } else advancing = false
          } else advancing = false
        }
        val rightPart =
          if (carriedKey != null && keyOrd.compare(carriedKey, lk) == 0) carriedVal
          else nullRight
        outProj(joined(lRow, rightPart))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: register via `spark.experimental.extraStrategies`
  * (runtime, any session) or `GraftExtensions` (at session build).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, rv) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

/** SparkSessionExtensions entry point: sessions built with
  * `.withExtensions(new GraftExtensions)` (or started with
  * `spark.sql.extensions=graft.plans.GraftExtensions`) get the as-of
  * strategy AND the engine's native expressions as SQL functions —
  * `rolling_hash(text)`, `shingles(text, n)`, `dot_product(a, b)`,
  * `pair_combinations(arr)` — so pure-SQL users reach the same
  * codegen/one-pass-per-row implementations the DataFrame API uses.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def fn(name: String, clazz: Class[_], arity: Int,
                 build: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity argument(s)")
        build(args)
      })

  /** Table-valued function wrapping a whole-DataFrame operator: every
    * argument must be a foldable literal — table names resolve through
    * the active session's catalog, column arguments are SQL expression
    * strings, numerics are ints. This is how the Eval/Retrieval
    * table-shaped entry points reach pure-SQL users (VERDICT r11 #7):
    * `SELECT * FROM chi2('events_view', 'flag_a', 'flag_b')`.
    */
  private def tableFn(name: String, arity: Int,
                      build: Seq[String] => org.apache.spark.sql.DataFrame) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity argument(s)")
        val lits = args.map { a =>
          require(a.foldable, s"$name: all arguments must be literals")
          String.valueOf(a.eval())
        }
        build(lits).queryExecution.logical
      })

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    e.injectOptimizerRule(_ => RollupRewrite)
    e.injectFunction(fn("rolling_hash",
      classOf[graft.expressions.RollingHash], 1,
      args => graft.expressions.RollingHash(args.head)))
    e.injectFunction(fn("dot_product",
      classOf[graft.expressions.DotProduct], 2,
      args => graft.expressions.DotProduct(args.head, args(1))))
    e.injectFunction(fn("pair_combinations",
      classOf[graft.expressions.PairCombinations], 1,
      args => graft.expressions.PairCombinations(args.head)))
    e.injectFunction(fn("vector_sum",
      classOf[graft.expressions.VectorSum], 1,
      args => graft.expressions.VectorSum(args.head)))
    e.injectFunction(fn("adc_score",
      classOf[graft.expressions.AdcScore], 2,
      args => graft.expressions.AdcScore(args.head, args(1))))
    // table-valued SQL surface for the table-shaped Eval/Retrieval
    // operators — same implementations the Scala API calls
    def active = org.apache.spark.sql.SparkSession.active
    def ex(s: String) = org.apache.spark.sql.functions.expr(s)
    e.injectTableFunction(tableFn("chi2", 3, a =>
      graft.core.Eval.chiSquare(active.table(a(0)), ex(a(1)), ex(a(2)))))
    e.injectTableFunction(tableFn("mann_whitney", 6, a =>
      graft.core.Eval.mannWhitneyU(active.table(a(0)), ex(a(1)), ex(a(2)),
        ex(a(3)), a(4), a(5))))
    e.injectTableFunction(tableFn("log_rank", 5, a =>
      graft.core.Eval.logRank(active.table(a(0)), ex(a(1)), ex(a(2)),
        ex(a(3)), ex(a(4)))))
    e.injectTableFunction(tableFn("bm25_topk", 3, a =>
      graft.core.Retrieval.bm25TopK(active.table(a(0)), active.table(a(1)),
        k = a(2).toInt)))
    e.injectTableFunction(tableFn("retrieval_map", 3, a =>
      graft.core.Retrieval.mapAtK(active.table(a(0)), active.table(a(1)),
        k = a(2).toInt)))
    e.injectTableFunction(tableFn("longest_repeats", 5, a =>
      graft.core.SuffixArray.longestRepeats(active.table(a(0)),
        a(1), a(2), minLen = a(3).toInt, topK = a(4).toInt)))
    // round-12 operator families on the SQL surface
    e.injectTableFunction(tableFn("shapley", 4, a =>
      graft.core.Eval.shapleyAttribution(active.table(a(0)),
        ex(a(1)), ex(a(2)), ex(a(3)))))
    e.injectTableFunction(tableFn("conformal", 4, a =>
      graft.core.Eval.conformalCalibrate(active.table(a(0)),
        ex(a(1)), ex(a(2)), ex(a(3)))))
    e.injectTableFunction(tableFn("wasserstein1", 4, a =>
      graft.core.Profile.wasserstein1(active.table(a(0)), a(1),
        ex(a(2)), ex(a(3)))))
    e.injectTableFunction(tableFn("skyline2d", 4, a =>
      graft.core.Skyline.skyline2d(active.table(a(0)),
        ex(a(1)), ex(a(2)), ex(a(3)))))
    e.injectTableFunction(tableFn("edit_neardup", 5, a =>
      graft.core.Dedup.editNearDupPairs(active.table(a(0)), a(1), a(2),
        k = a(3).toInt, q = a(4).toInt)))
    e.injectTableFunction(tableFn("hits", 4, a =>
      graft.core.GraphOps.hits(active.table(a(0)), a(1), a(2),
        iters = a(3).toInt)))
    e.injectTableFunction(tableFn("interval_islands", 4, a =>
      graft.core.TimeSeries.intervalIslands(active.table(a(0)), a(1),
        ex(a(2)), ex(a(3)))))
    e.injectTableFunction(tableFn("ams_f2", 2, a =>
      graft.core.Sketches.amsF2(active.table(a(0)), ex(a(1)))))
    e.injectTableFunction(tableFn("lof", 2, a =>
      graft.core.Similarity.lof(active.table(a(0)), k = a(1).toInt)))
    e.injectTableFunction(tableFn("randomized_response", 5, a =>
      graft.core.Privacy.randomizedResponse(active.table(a(0)),
        ex(a(1)), ex(a(2)), ex(a(3)), flipMicro = a(4).toLong)))
    e.injectTableFunction(tableFn("quantile_normalize", 4, a =>
      graft.core.Profile.quantileNormalize(active.table(a(0)),
        a(1), a(2), a(3))))
    // round-12 completion sweep (VERDICT r12 #8) + round-13 operators
    e.injectTableFunction(tableFn("apportion", 4, a =>
      graft.core.Placement.apportion(active.table(a(0)),
        ex(a(1)), ex(a(2)), budget = a(3).toLong)))
    e.injectTableFunction(tableFn("mann_kendall", 4, a =>
      graft.core.TimeSeries.mannKendall(active.table(a(0)),
        a(1), a(2), a(3))))
    e.injectTableFunction(tableFn("krippendorff_alpha", 3, a =>
      graft.core.Eval.krippendorffAlpha(active.table(a(0)),
        ex(a(1)), ex(a(2)))))
    e.injectTableFunction(tableFn("anova", 3, a =>
      graft.core.Eval.anovaOneWay(active.table(a(0)),
        ex(a(1)), ex(a(2)))))
    e.injectTableFunction(tableFn("kruskal_wallis", 3, a =>
      graft.core.Eval.kruskalWallis(active.table(a(0)),
        ex(a(1)), ex(a(2)))))
    e.injectTableFunction(tableFn("friedman", 4, a =>
      graft.core.Eval.friedman(active.table(a(0)),
        ex(a(1)), ex(a(2)), ex(a(3)))))
    e.injectTableFunction(tableFn("cochran_q", 4, a =>
      graft.core.Eval.cochranQ(active.table(a(0)),
        ex(a(1)), ex(a(2)), ex(a(3)))))
    e.injectTableFunction(tableFn("bloom_decontam", 6, a =>
      graft.core.Decontaminate.flagContaminatedBloom(active.table(a(0)),
        active.table(a(1)), a(2), a(3), n = a(4).toInt,
        minHits = a(5).toInt)))
    e.injectTableFunction(tableFn("set_cover", 4, a =>
      graft.core.Sampling.greedySetCover(active.table(a(0)), a(1), a(2),
        k = a(3).toInt)))
    e.injectTableFunction(tableFn("ransac_line", 5, a =>
      graft.core.TimeSeries.ransacLine(active.table(a(0)), a(1), a(2),
        k = a(3).toInt, epsY = a(4).toLong)))
    e.injectTableFunction(tableFn("fd_discovery", 2, a =>
      graft.core.Profile.functionalDependencies(active.table(a(0)),
        a(1).split(",").toSeq.map(_.trim))))
    e.injectTableFunction(tableFn("exact_substr_dedup", 4, a =>
      graft.core.SuffixArray.exactSubstrDedup(active.table(a(0)),
        a(1), a(2), minLen = a(3).toInt)))
    e.injectTableFunction(tableFn("lof_bucketed", 4, a =>
      graft.core.Similarity.lofBucketed(active.table(a(0)),
        active.table(a(1)), k = a(2).toInt, nProbe = a(3).toInt)))
    e.injectTableFunction(tableFn("lof_two_level", 6, a =>
      graft.core.Similarity.lofBucketedTwoLevel(active.table(a(0)),
        active.table(a(1)), active.table(a(2)), k = a(3).toInt,
        nProbe = a(4).toInt, wProbe = a(5).toInt)))
    e.injectTableFunction(tableFn("assign_buckets", 2, a =>
      graft.core.Similarity.assignBucketsL2(active.table(a(0)),
        active.table(a(1)))))
    e.injectTableFunction(tableFn("hier_assign", 4, a =>
      graft.core.Similarity.assignBucketsHierarchical(active.table(a(0)),
        active.table(a(1)), active.table(a(2)), wProbe = a(3).toInt)))
    e.injectTableFunction(tableFn("winnow_fingerprints", 5, a =>
      graft.core.Dedup.winnowFingerprints(active.table(a(0)), a(1), a(2),
        k = a(3).toInt, w = a(4).toInt)))
    e.injectTableFunction(tableFn("winnow_pairs", 5, a =>
      graft.core.Dedup.winnowMatchPairs(active.table(a(0)), a(1), a(2),
        k = a(3).toInt, w = a(4).toInt)))
    e.injectTableFunction(tableFn("rouge_n", 5, a =>
      graft.core.Eval.rougeN(active.table(a(0)), a(1),
        ex(a(2)), ex(a(3)), n = a(4).toInt)))
    e.injectTableFunction(tableFn("rouge_l", 4, a =>
      graft.core.Eval.rougeL(active.table(a(0)), a(1),
        ex(a(2)), ex(a(3)))))
    e.injectFunction(fn("lcs_length",
      classOf[graft.expressions.LcsLength], 2,
      args => graft.expressions.LcsLength(args.head, args(1))))
    e.injectTableFunction(tableFn("bleu_components", 5, a =>
      graft.core.Eval.bleuComponents(active.table(a(0)), a(1),
        ex(a(2)), ex(a(3)), maxN = a(4).toInt)))
    // round-15 stragglers (VERDICT r14 #10): the Hampel and
    // span-decontamination operators had gates but no SQL face
    e.injectTableFunction(tableFn("hampel_despike", 6, a =>
      graft.core.TimeSeries.hampelDespike(active.table(a(0)), a(1),
        ex(a(2)), ex(a(3)), window = a(4).toInt, nMad = a(5).toInt)))
    e.injectTableFunction(tableFn("decontam_flag", 6, a =>
      graft.core.Decontaminate.flagContaminated(active.table(a(0)),
        active.table(a(1)), a(2), a(3), n = a(4).toInt,
        minHits = a(5).toInt)))
    e.injectTableFunction(tableFn("scrub_spans", 5, a =>
      graft.core.Decontaminate.scrubSpans(active.table(a(0)),
        active.table(a(1)), a(2), a(3), n = a(4).toInt)))
    // persisted-index faces: arg 1 is the SnapshotTable index dir
    e.injectTableFunction(tableFn("decontam_flag_indexed", 6, a =>
      graft.core.Decontaminate.flagContaminatedIndexed(active,
        active.table(a(0)), a(1), a(2), a(3), n = a(4).toInt,
        minHits = a(5).toInt)))
    e.injectTableFunction(tableFn("scrub_spans_indexed", 5, a =>
      graft.core.Decontaminate.scrubSpansIndexed(active,
        active.table(a(0)), a(1), a(2), a(3), n = a(4).toInt)))
    // round-15 operators
    e.injectTableFunction(tableFn("brown_forsythe", 3, a =>
      graft.core.Eval.brownForsythe(active.table(a(0)), ex(a(1)),
        ex(a(2)))))
    e.injectTableFunction(tableFn("chrf", 6, a =>
      graft.core.Eval.chrF(active.table(a(0)), a(1), ex(a(2)),
        ex(a(3)), maxN = a(4).toInt, beta = a(5).toInt)))
    e.injectTableFunction(tableFn("distinct_n", 4, a =>
      graft.core.TextAnalysis.distinctN(active.table(a(0)), ex(a(1)),
        ex(a(2)), n = a(3).toInt)))
    e.injectTableFunction(tableFn("moore_lewis", 5, a =>
      graft.core.LanguageModel.mooreLewis(active.table(a(0)),
        graft.core.LanguageModel.trainBigram(active.table(a(1)), a(4)),
        graft.core.LanguageModel.trainBigram(active.table(a(2)), a(4)),
        a(3), a(4))))
    e.injectTableFunction(tableFn("scrub_cards", 2, a =>
      graft.core.TextAnalysis.scrubCards(active.table(a(0)), a(1))))
    e.injectTableFunction(tableFn("jonckheere", 3, a =>
      graft.core.Eval.jonckheereTerpstra(active.table(a(0)), ex(a(1)),
        ex(a(2)))))
    e.injectTableFunction(tableFn("page_trend", 4, a =>
      graft.core.Eval.pageTrend(active.table(a(0)), ex(a(1)), ex(a(2)),
        ex(a(3)))))
    e.injectTableFunction(tableFn("loop_detect", 5, a =>
      graft.core.TextAnalysis.loopDetect(active.table(a(0)), a(1), a(2),
        maxPeriod = a(3).toInt, minRepeats = a(4).toInt)))
    e.injectTableFunction(tableFn("semantic_decontam", 4, a =>
      graft.core.Decontaminate.flagContaminatedEmbedding(
        active.table(a(0)), active.table(a(1)),
        threshold = a(3).toDouble, idCol = a(2))))
    e.injectTableFunction(tableFn("semantic_decontam_indexed", 4, a =>
      graft.core.Decontaminate.flagContaminatedEmbeddingIndexed(active,
        active.table(a(0)), a(1), threshold = a(3).toDouble,
        idCol = a(2))))
    e.injectFunction(fn("chrf_matches",
      classOf[graft.expressions.ChrfMatches], 3,
      args => {
        require(args(2).foldable,
          "chrf_matches(cand, ref, maxN): maxN must be an integer literal")
        val n = args(2).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"chrf_matches: bad maxN $other")
        }
        graft.expressions.ChrfMatches(args(0), args(1), n)
      }))
    e.injectFunction(fn("char_grams",
      classOf[graft.expressions.CharGramArray], 2,
      args => {
        require(args(1).foldable,
          "char_grams(text, q): q must be an integer literal")
        val q = args(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"char_grams(text, q): q must be an integer literal, got $other")
        }
        graft.expressions.CharGramArray(args.head, q)
      }))
    e.injectFunction(fn("shingles",
      classOf[graft.expressions.ShingleArray], 2,
      args => {
        val n = args(1) match {
          case l if l.foldable => l.eval() match {
            case i: Int => i
            case i: Long => i.toInt
            case other => throw new IllegalArgumentException(
              s"shingles(text, n): n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "shingles(text, n): n must be a literal")
        }
        graft.expressions.ShingleArray(args.head, n)
      }))
  }
}
