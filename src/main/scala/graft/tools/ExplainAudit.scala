package graft.tools

import graft.{Graft, SparkEntry}

/** Prints formatted physical plans for representative queries and greps
  * the scan nodes for pushdown evidence — the "is this the plan you'd
  * want at 100 TB" gate. Dev utility: tools/run.sh graft.tools.ExplainAudit [sfDir]
  */
object ExplainAudit {
      // red-flag scan over the whole inventory: quadratic join strategies
      // where a broadcast of a *large* side or a true cross product would
      // hide; queries that intentionally broadcast a small side are
      // allow-listed with the reason.
      private val intended = Map(
        "q43_knn_brute" -> "BNLJ broadcasts the tiny query set (by design)",
        "q45_ivf_ann" -> "BNLJ broadcasts tiny centroids/queries (by design)",
        "q62_ivf_trained" -> "BNLJ broadcasts the k trained centroids (by design)",
        "q86_ivf_persisted" -> "BNLJ broadcasts the k persisted centroids (by design)",
        "q80_tfidf_terms" -> "BNLJ broadcasts the 1-row corpus-size aggregate (by design)",
        "q129_centroid_classify" -> "BNLJ broadcasts the per-label centroid table (by design)",
        "q138_chi2_independence" -> "BNLJ broadcasts the 1-row total-count aggregate (by design)",
        "q144_pair_lift" -> "BNLJ broadcasts the 1-row corpus-size aggregate (by design)",
        "q164_bm25" -> "BNLJ broadcasts the 1-row corpus-stats aggregate (by design)",
        "q170_mixture_weights" -> "BNLJ broadcasts the 1-row weight-total aggregate (by design)",
        "q171_cluster_quality" -> "BNLJ broadcasts the per-label centroid table (by design, as q129)",
        "q181_pareto_frontier" -> "BNLJ dominance anti-join on the supplier-cardinality aggregate (by design)",
        "q173_quantile_norm" -> "BNLJ broadcasts the 1-row global count onto the 101-point grid (by design)",
        "q152_ann_recall" -> "BNLJ from bruteForceTopK's tiny query-set broadcast (by design, as q43)",
        "q175_decay_score" -> "BNLJ broadcasts the 1-row max(ts) aggregate (by design, as q80/q164)",
        "q189_equidepth_hist" -> "BNLJ broadcasts the 1-row collected edge array (by design, as q80)",
        "q191_sketch_set_ops" -> "BNLJ crossJoins of three 1-row estimate frames (by design, as q80)",
        "q192_semdedup" -> "BNLJ broadcasts the k trained centroids (by design, as q62)",
        "q206_embed_quantize" -> "BNLJ broadcasts the 1-row packed lo/hi dimension-stats arrays (by design, as q189)",
        "q213_pq_recall" -> "BNLJ from l2TopK's tiny query-set broadcast (by design, as q43/q152)",
        "q217_mixture_apply" -> "BNLJ broadcasts the 1-row sqrt-weight total aggregate (by design, as q80/q170)",
        "q221_lsh_tuning" -> "BNLJ crossJoins of three 1-row count frames per config (by design, as q191)",
        "q222_mmr_rerank" -> "BNLJ from bruteForceTopK's tiny query-set broadcast (by design, as q43)",
        "q223_dsir_score" -> "BNLJ broadcasts the 1-row token-total onto the 64-bucket dist (by design, as q80)",
        "q230_basket_rules" -> "BNLJ broadcasts the 1-row basket-count aggregate (by design, as q144)",
        "q233_conversion_curve" -> "BNLJ broadcasts the 1-row signup-total aggregate (by design, as q80)",
        "q239_class_weights" -> "BNLJ broadcasts the 1-row label-total aggregate (by design, as q80)",
        "q241_geo_rollup_shares" -> "BNLJ broadcasts the 1-row grand-total aggregate (by design, as q80)",
        "q245_zipf_coverage" -> "BNLJ broadcasts the 1-row token-total aggregate (by design, as q80)",
        "q253_tfidf_terms" -> "BNLJ broadcasts the 1-row corpus-count aggregate (by design, as q80)",
        "q263_cluster_terms" -> "BNLJ broadcasts the k trained centroids (by design, as q62/q192)",
        "q264_rrf_fusion" -> "BNLJ from bruteForceTopK's 1-query broadcast + q164's 1-row corpus stats (by design, as q43/q164)",
        "q268_bpe_vocab" -> "BNLJ broadcasts the 1-row rank-ordered merge array onto the vocab table (by design, as q189)",
        "q269_bpe_doc_tokens" -> "BNLJ broadcasts the 1-row merge array onto the vocab table (by design, as q268)",
        "q271_kneser_ney" -> "BNLJ broadcasts the 1-row bigram-type-count aggregate (by design, as q80)",
        "q274_naive_bayes" -> "BNLJ broadcasts the |langs|-row (tot, v) model header + 1-row doc total (by design, as q129/q80)",
        "q297_nb_calibration" -> "q274's score chain verbatim (shared nbScores helper): the same |langs|-row header + 1-row total cross-broadcast",
        "q275_apriori_triples" -> "BNLJ broadcasts the 1-row basket-count aggregate (by design, as q230/q144)",
        "q282_tokenizer_fertility" -> "BNLJ broadcasts the 1-row merge array onto the vocab table (by design, as q268/q269)",
        "q283_epoch_plan" -> "BNLJ broadcasts the 1-row (isq_tot, B) budget aggregate onto the |sources|-row table (by design, as q170)",
        "q286_sales_opportunity" -> "BNLJ broadcasts the 1-row positive-balance average (by design, as q80)")
      // single-partition windows — the OTHER classic scale-killer a
      // string grep can't see reliably; detected on the optimized plan
      // (empty partitionSpec) and allow-listed only where the window's
      // input is provably bounded
      private val globalWinOk = Map(
        "q147_quality_sweep" -> "cumulative window over the BUCKET table (~range/10 rows), not the corpus",
        "q148_token_budget" -> "phase-1 cumulative window over the q_milli bucket table (<=1001 rows)",
        "q189_equidepth_hist" -> "global rank over the deterministic half-sample, not the full scan",
        "q233_conversion_curve" -> "cumulative window over the day-offset table (<= corpus span in days), not the corpus",
        "q245_zipf_coverage" -> "rank/cumulative windows over the VOCABULARY-bounded agg, not the token stream")
      // loop-invariant expensive computation inside a HOF lambda — the
      // THIRD ungreppable scale-killer (r11): CollapseProject inlines a
      // projected alias into a lambda body, so a tokenizer/digest that
      // was written once-per-row re-evaluates once-per-ELEMENT (the
      // q219 winnow stall: O(tokens²) per doc; q41/q72/q93/q154 paid
      // the same tax). Detected on the optimized plan: an expensive
      // expression under a LambdaFunction that references NO lambda
      // variable is loop-invariant, i.e. re-computed per element for
      // no reason. No allow-list entries exist — the fix is always to
      // fuse (functions.TextNative) or project before the HOF.
      private val invariantLambdaOk = Map.empty[String, String]

  /** Scan every inventory query's plan for the three structural
    * scale-killers (quadratic join strategies; single-partition
    * windows; loop-invariant expensive lambda bodies) and return one
    * line per finding, annotated `[OK: reason]`
    * when allow-listed and `[REVIEW]` otherwise. A query whose
    * CONSTRUCTION throws yields an `ERROR` line — a scan that silently
    * skips queries would pass vacuously. Called by the main below AND
    * by ScaleSpec, which asserts zero [REVIEW]/ERROR lines on every
    * `sbt test` so allow-list drift fails CI loudly. */
  def scan(spark: org.apache.spark.sql.SparkSession, d: String)
      : Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      try {
        val df = fn(spark, d)
        val plan = df.queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        val joinLine =
          if (flags.nonEmpty)
            Seq(s"$n: ${flags.mkString(",")}" +
              intended.get(n).map(r => s"  [OK: $r]").getOrElse("  [REVIEW]"))
          else Seq.empty
        val hasGlobalWin = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.nonEmpty
        val winLine =
          if (hasGlobalWin)
            Seq(s"$n: GlobalWindow" +
              globalWinOk.get(n).map(r => s"  [OK: $r]").getOrElse("  [REVIEW]"))
          else Seq.empty
        val invariants = invariantLambdaExprs(df)
        val invLine =
          if (invariants.nonEmpty)
            Seq(s"$n: InvariantLambdaExpr(${invariants.mkString(",")})" +
              invariantLambdaOk.get(n).map(r => s"  [OK: $r]")
                .getOrElse("  [REVIEW]"))
          else Seq.empty
        joinLine ++ winLine ++ invLine
      } catch { case e: Throwable => Seq(s"$n: ERROR ${e.getMessage}") }
    }

  /** The loop-invariant-lambda detector, exposed for ScaleSpec's
    * detector-regression case: distinct prettyNames of expensive
    * expressions that sit inside a lambda body yet reference no lambda
    * variable (so they re-evaluate per element) in `df`'s OPTIMIZED
    * plan — i.e. after CollapseProject has had its chance to inline. */
  def invariantLambdaExprs(df: org.apache.spark.sql.DataFrame)
      : Seq[String] =
    df.queryExecution.optimizedPlan.flatMap { node =>
      node.expressions.flatMap(_.collect {
        case lf: org.apache.spark.sql.catalyst.expressions.LambdaFunction =>
          lf.function.collect {
            case e if isExpensive(e) && e.collect {
              case v: org.apache.spark.sql.catalyst.expressions
                .NamedLambdaVariable => v
            }.isEmpty => e.prettyName
          }
      }.flatten)
    }.distinct

  /** Per-element re-evaluation of one of these is never acceptable:
    * each walks (at least) a whole row-level string/array input. Cheap
    * per-element builtins (arithmetic, substr, element_at, md5 of a
    * loop-variant scalar) are fine and not listed. */
  private def isExpensive(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import graft.functions._
    e match {
      case _: TokensExpr | _: NgramsExpr | _: ShinglesExpr |
           _: MinHashSigExpr | _: WinnowExpr | _: SimHashExpr |
           _: RollingHashExpr | _: LshSigExpr | _: LongArrayDot => true
      case m: org.apache.spark.sql.catalyst.expressions.Md5 =>
        // md5 of a loop-invariant expression is expensive exactly when
        // its input is non-trivial (an attribute-bearing subtree, e.g.
        // the whole text column) — md5(lit) folds away anyway
        m.references.nonEmpty
      case hof: org.apache.spark.sql.catalyst.expressions
        .HigherOrderFunction => hof.references.nonEmpty
      case _ => false
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.session(master = "local[8]", appName = "graft-explain",
      shufflePartitions = 8)
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    if (args.length > 1 && args(1) == "--scan") {
      scan(spark, d).foreach(println)
    } else {
      val names = if (args.length > 1) args.drop(1).toSeq else Seq(
        "q02_filter", "q05_groupby_sum", "q07_join_inner",
        "q16_sort_topk", "q27_demo_pipeline", "q43_knn_brute")
      names.foreach { n =>
        println(s"\n========== $n ==========")
        val df = SparkEntry.queries(n)(spark, d)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
