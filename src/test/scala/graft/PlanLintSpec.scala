package graft

/** Whole-registry plan lint: every driver query's PHYSICAL plan is
  * checked for the two join shapes that kill 100 TB jobs when they
  * appear by accident:
  *
  *   - `CartesianProductExec` — both sides large, no broadcast: never
  *     acceptable; nothing in the registry may plan one.
  *   - `BroadcastNestedLoopJoin` — legitimate ONLY when the broadcast
  *     side is provably tiny (a collected aggregate, a literal range, a
  *     bounded seed/query set). Every query that plans one must appear
  *     in the allowlist below WITH its justification, so a new query
  *     that accidentally turns a key join into a nested loop (e.g. by
  *     losing an equi-condition) fails this spec instead of shipping.
  *
  * Plans are built at sf0.001 — planning exercises the same Catalyst
  * rules as any scale; eager driver steps inside query construction
  * (codebook training collects, CC fixpoints) run on the tiny tables.
  */
class PlanLintSpec extends SparkSpec {

  private val bnljAllowed: Map[String, String] = Map(
    "q10_outliers_zscore" -> "broadcast per-group mean/stddev aggregate (rows = #groups)",
    "q12_trailing_count" -> "broadcast 1-row max-timestamp aggregate",
    "q15_watermark_filter" -> "broadcast per-key max-watermark aggregate, non-equi ts bound",
    "q24_knn_exact" -> "broadcast bounded query set, =!= self-match exclusion",
    "q31_knn_ivf" -> "knnExact recall reference (q24's broadcast bounded query set) + crossJoin of two broadcast 1-row recall-contract aggregates",
    "q160_logistic_calibrator" -> "crossJoins of the broadcast 1-row first-iterate and row-count relations (nano-noise tolerance for the improvement contract)",
    "q224_dsir_weights" -> "crossJoin against the broadcast 1-row target/raw token-total aggregate (q110/q163 shape)",
    "q202_retrieval_mrr" -> "knnExactAgg's broadcast bounded query set (q24's shape); label joins are equi",
    "q206_bigram_pmi" -> "crossJoin against the broadcast 1-row totals aggregate (q110/q163 shape)",
    "q209_simpson_paradox" -> "crossJoin against the broadcast 1-row pooled-slope aggregate (q110/q163 shape)",
    "q213_emd_lengths" -> "crossJoin against the broadcast 1-row bounds aggregate (q97/q139 bucket-grid shape)",
    "q214_quality_ztest" -> "inequality pair join over the broadcast |groups|-row aggregate (q134's shape)",
    "q219_threshold_sweep" -> "crossJoin of two broadcast 1-row aggregates (q110/q163 shape)",
    "q220_srm_check" -> "crossJoin against the broadcast 1-row total aggregate (q110/q163 shape)",
    "q221_markov_stationary" -> "crossJoins against broadcast 1-row dangling/state-count aggregates per unrolled iteration (q155 shape)",
    "q102_hard_negatives" -> "broadcast bounded query set, =!= self-match + label-inequality conditions",
    "q25_embedding_near_dup" -> "exact all-pairs baseline BY DESIGN; the scale path is q25b's banded LSH",
    "q41_merge_upsert" -> "broadcast updates batch (deltas << base)",
    "q58_tfidf" -> "broadcast 1-row corpus-size aggregate (crossJoin N)",
    "q128_sparse_cosine" -> "broadcast 1-row corpus-size aggregate (crossJoin N, q58's idf)",
    "q130_conversion_lag" -> "broadcast 1-row histogram-total aggregate (crossJoin share denominator)",
    "q131_benford" -> "broadcast 1-row digit-total aggregate (crossJoin share denominator)",
    "q134_welch_ttest" -> "inequality pair join over the |groups|-row moment aggregate (3 rows broadcast)",
    "q62_lm_score" -> "broadcast 1-row vocabulary-size aggregate (crossJoin V)",
    "q109_perplexity_buckets" -> "inherits q62's broadcast 1-row vocabulary-size aggregate (crossJoin V)",
    "q110_unigram_kl" -> "broadcast 1-row corpus-token-total aggregate (crossJoin N)",
    "q81_snapshot_diff" -> "broadcast 1-row snapshot-cut scalar; the diff itself is a null-safe equi join",
    "q115_naive_bayes" -> "broadcast L-row class-prior relation (crossJoin labels; L = #classes)",
    "q122_heldout_perplexity" -> "broadcast 1-row TRAIN-vocabulary-size aggregate (crossJoin V, the q62 shape)",
    "q137_vocab_growth" -> "broadcast 1-row max-doc-id aggregate (bucket bounds)",
    "q139_psi_drift" -> "broadcast 1-row bounds and totals aggregates (crossJoin min/max and N)",
    "q163_mutual_information" -> "assembly crossJoin of three 1-row aggregates (MI + two entropies)",
    "q167_cohens_kappa" -> "assembly crossJoin of two 1-row aggregates (agreement total + chance numerator)",
    "q168_acf" -> "broadcast 1-row (n, S) and denominator aggregates over the hour grid (crossJoin centering/normalization)",
    "q169_cusum" -> "broadcast 1-row (n, T) and peak aggregates over the day grid (crossJoin centering/peak flag)",
    "q175_isotonic_calibration" -> "non-equi range joins over the broadcast ≤10-row bin grid (minimax closed form)",
    "q177_rfm_segments" -> "broadcast 1-row max-date aggregate (recency anchor)",
    "q179_kaplan_meier" -> "broadcast 1-row subject-total and max-ts aggregates (at-risk base, censoring horizon)",
    "q180_chi_square" -> "marginal-grid crossJoin |A|x|B| (contingency cells incl. zero-observed; both sides are class-count aggregates)",
    "q182_ks_test" -> "broadcast 1-row (n1, n2) totals and max-deviation aggregates over the score grid",
    "q183_seasonality_profile" -> "broadcast 24-row hour spine and 1-row totals against the 7-row weekday aggregate",
    "q192_source_concentration" -> "broadcast 1-row token-total aggregate (crossJoin share denominator)",
    "q198_inventory_abc" -> "broadcast 1-row revenue-total aggregate (crossJoin classification denominator)",
    "q186_fano_burstiness" -> "broadcast 1-row hour-span aggregate against the |types|-row moment aggregate",
    "q187_lead_lag" -> "broadcast 1-row (n, Sx, Sy) and denominator aggregates over the hour grid (q168's shape for two series)",
    "q230_rrf_fusion" -> "knnExactAgg's broadcast bounded query set (q24's =!= shape) feeding the vector list",
    "q231_hll_sketch_merge" -> "crossJoin against the broadcast 1-row exact-distinct aggregate (q110/q163 shape)",
    "q236_fk_orphans" -> "assembly crossJoins of broadcast 1-row audit aggregates per relationship (q163 shape)",
    "q237_theil_sen" -> "inequality pair join over the broadcast calendar-day aggregate + assembly crossJoins of 1-row count/median aggregates (q134's shape)",
    "q238_js_divergence" -> "group-inequality join against the broadcast |sources|-row totals aggregate (pair fan-out over the bounded source set, q134's shape)",
    "q244_nelson_aalen" -> "q179's shape: broadcast 1-row subject-total and max-ts aggregates (risk-set base, censoring horizon)",
    "q245_cuped" -> "crossJoin against the broadcast 1-row pooled-moment aggregate (q110/q163 shape)",
    "q246_poisson_bootstrap" -> "crossJoins of broadcast 1-row full-mean and CI-bound aggregates (q110/q163 shape)",
    "q249_log_rank" -> "q179's shape: broadcast 1-row group-total and max-ts aggregates (risk-set base, censoring horizon)",
    "q256_matryoshka_recall" -> "knnExactAgg's broadcast bounded query set (q24's shape) per truncation sweep",
    "q259_binary_quant_recall" -> "knnExactAgg's broadcast bounded query set + broadcast query-signature set (q24's shape), =!= self-match exclusion",
    "q260_expectations_audit" -> "crossJoin against the broadcast 1-row table-total aggregate (q110/q163 shape)",
    "q261_write_audit_publish" -> "crossJoin of the 2-row batch-verdict literals against the broadcast 1-row live-content aggregate",
    "q262_split_leakage" -> "crossJoin of two broadcast 1-row count aggregates (doc totals × pair classes)",
    "q267_mann_kendall" -> "inequality pair join over the broadcast calendar-day aggregate + assembly crossJoins of 1-row aggregates (q237's shape)",
    "q268_seasonal_decompose" -> "crossJoin against the broadcast 1-row seasonal-centering aggregate (calendar-grid relation, q110/q163 shape)",
    "q271_bh_fdr" -> "crossJoins of broadcast 1-row m-count and i-star aggregates over the |segments|-row grid (q110/q163 shape)",
    "q276_conformal_interval" -> "crossJoin against the broadcast 1-row calibration-quantile aggregate (holdout grid, q110/q163 shape)",
    "q277_seasonal_anomalies" -> "crossJoins against the broadcast 1-row residual-moment and seasonal-centering aggregates (calendar grid, q110/q163 shape)",
    "q278_kruskal_wallis" -> "crossJoin against the broadcast 1-row rank-square aggregate (q110/q163 shape)",
    "q282_woe_iv" -> "crossJoins against the broadcast 1-row pos/neg-total and IV-total aggregates (q110/q163 shape)",
    "q283_target_encoding" -> "crossJoin against the broadcast 1-row global-moment aggregate (q110/q163 shape)",
    "q286_quantile_sketch" -> "crossJoins of the broadcast |quantiles|-row sketch-probe set and the 1-row total aggregate over the distinct-value grid (q24's bounded-probe shape)",
    "q288_huber_location" -> "crossJoins of the broadcast 1-row median/iterate/total aggregates per unrolled IRLS pass (q110/q163 shape)",
    "q292_mad_outliers" -> "crossJoins of the broadcast 1-row median/MAD/total aggregates over the distinct-value grid (q110/q163 shape)",
    "q293_durbin_watson" -> "crossJoins of the broadcast 1-row min-date and OLS-moment aggregates over the calendar day grid (q110/q163 shape)",
    "q294_levene_bf" -> "assembly crossJoins of broadcast 1-row k/N-total and SS-term aggregates over the |groups|-row grid (q163 shape)",
    "q297_brier_decomposition" -> "crossJoins against the broadcast 1-row bin-total aggregate over the ≤bins-row grid (q110/q163 shape)",
    "q298_effect_sizes" -> "inequality pair join over the broadcast |groups|-row moment aggregate (q134's shape)",
    "q295_ljung_box" -> "inherits q168's broadcast 1-row (n, S) and denominator aggregates over the hour grid (crossJoin centering/normalization)",
    "q303_hll_intersection" -> "inequality pair join over the broadcast |groups|-row sketch aggregate (q134's shape)",
    "q304_ivf_pq" -> "knnExactAgg's broadcast bounded query set (q24's =!= shape) + crossJoin of the broadcast 1-row recall totals (q31's gate shape)",
    "q307_snapshot_retention" -> "crossJoin of two broadcast 1-row version-count aggregates (q262's shape)",
    "q312_bradley_terry" -> "per-MM-iteration crossJoin against the broadcast 1-row strength-total normalizer over the |items|-row grid (q110/q163 shape)",
    "q315_jackknife_ratio" -> "crossJoins of broadcast 1-row total/theta-bar/deviation aggregates over the 32-row bucket grid (q110/q163 shape)",
    "q316_salt_planner" -> "crossJoin against the broadcast 1-row row-total aggregate (q110/q163 shape)",
    "q319_mi_ranking" -> "per-feature crossJoins against the broadcast 1-row bin-bounds aggregate plus q163's three 1-row MI assembly aggregates",
    "q320_seasonal_strength" -> "inherits q268's crossJoin against the broadcast 1-row seasonal-centering aggregate (calendar-grid relation)",
    "q321_holm" -> "crossJoin against the broadcast 1-row m-count aggregate over the |segments|-row grid (q271's shape)",
    "q317_ivf_recall_curve" -> "knnExactAgg's broadcast bounded query set per probe level + crossJoins of the broadcast 1-row recall totals (q31's gate shape)",
    "q308_sliding_distinct" -> "crossJoins against the broadcast 1-row max-day bound (q110/q163 shape)",
    "q309_ess" -> "crossJoin against the broadcast 1-row max-log-weight aggregate (q110/q163 shape)",
    "q299_changepoint" -> "crossJoin against the broadcast 1-row total-moment aggregate over the calendar day grid (q169's shape)",
    "q324_newey_west" -> "crossJoins of broadcast 1-row total/gamma0/kernel-sum aggregates over the calendar day grid (q169's shape)",
    "q326_permutation_test" -> "crossJoins of broadcast 1-row observed-statistic and exceedance-count aggregates (q110/q163 shape)",
    "q329_ndcg" -> "knnExactAgg's broadcast bounded query set (q24's =!= shape) for both the truncated ranking and the relevance pool",
    "q330_rbo" -> "knnExactAgg's broadcast bounded query set (q24's =!= shape) for both rankings",
    "q331_fleiss_kappa" -> "crossJoin against the broadcast 1-row category-total aggregate (q110/q163 shape)",
    "q333_good_turing" -> "crossJoin against the broadcast 1-row token-total aggregate (q110/q163 shape)",
    "q334_segmented_regression" -> "crossJoin of the two broadcast 1-row segment-moment aggregates (q262's shape)",
    "q335_krippendorff_alpha" -> "crossJoins of broadcast 1-row margin-total and D_e aggregates (q110/q163 shape)",
    "q337_rmst" -> "q179's broadcast 1-row subject-total and max-ts aggregates + the broadcast 1-row head-interval aggregate",
    "q338_token_dispersion" -> "dense grid: broadcast 25-row top-token set crossJoined with the |parts|-row totals (both bounded aggregates) + the 1-row corpus total",
    "q341_hurst" -> "crossJoins of the broadcast 1-row day-count total against the calendar-grid fan-out and the 4-row regression aggregate (q169's shape)",
    "q342_rank_drift" -> "rboAtK's |queries|-row (here 1-row) left join against the per-depth term aggregate (q330's shape)",
    "q346_periodogram" -> "crossJoin against the broadcast 1-row (n, T) centering aggregate over the calendar day grid (q169's shape)",
    "q348_friedman" -> "crossJoins of broadcast 1-row treatment-count / moment / numerator aggregates (q110/q163 shape)",
    "q352_cochran_q" -> "user spine crossJoined with the broadcast |event-types|-row (5-row) treatment relation, plus the 1-row block/treatment moment crossJoin",
    "q355_by_fdr" -> "q271's crossJoins of broadcast 1-row m-count / harmonic / i-star aggregates over the |segments|-row grid",
    "q356_jonckheere" -> "distinct-value spine crossJoined with the broadcast |groups|-row (5-row) tier relation (q234's bounded-grid argument), plus the 1-row J2/moment assembly crossJoin",
    "q358_kendall_w" -> "friedmanTest's crossJoins of broadcast 1-row treatment-count / moment / numerator aggregates (q348's shape)",
    "q360_anderson_darling" -> "q182's crossJoin against the broadcast 1-row (n1, n2) totals over the distinct-value score grid")

  /** Queries allowed to plan a GLOBAL window (no partition columns, or a
    * constant partition) — each must window over a provably BOUNDED
    * relation (per-group aggregates, a top-k cap), never a corpus-scale
    * one: a global window moves every input row into one task, the
    * single-partition sort that killed q97's first percentileGate shape.
    */
  private val globalWindowAllowed: Map[String, String] = Map(
    "q70_weighted_sample" -> "ranks the k survivors AFTER TakeOrderedAndProject's limit(k) — a k-row window",
    "q96_token_budget" -> "water-filling closed form over per-source aggregates (one row per source)",
    "q98_temperature_mix" -> "micro-weight normalizing sum over per-source aggregates (one row per source)",
    "q104_length_histogram" -> "share-of-total window over the BINNED aggregate (≤ max_len/16 rows)",
    "q120_repetition_schedule" -> "q96's water-fill closed form over per-source aggregates (one row per source)",
    "q124_funnel" -> "lag over the 3-row staged-count aggregate (one row per funnel stage)",
    "q137_vocab_growth" -> "cumulative sums over the nBuckets-row bucket aggregate (10 rows)",
    "q140_quantile_normalize" -> "CDF windows over DISTINCT-score count grids (q97's bounded-grid argument), incl. the merged as-of grid",
    "q158_pareto_frontier" -> "running cross-bucket max over the per-bucket aggregate (≤ max_tokens/64 rows); the corpus itself sees only bucket-partitioned windows",
    "q165_roc_auc" -> "negatives-below cumulation over the DISTINCT-score count grid (q97's bounded-grid argument)",
    "q169_cusum" -> "running prefix over the day grid (calendar-bounded — tens of thousands of rows at any corpus scale)",
    "q170_skew_gini" -> "rank window over the per-key count grid (dimension cardinality, not corpus size)",
    "q175_isotonic_calibration" -> "cumulative window over the ≤10-row calibration-bin grid",
    "q177_rfm_segments" -> "strictly-below cumulations over distinct-value count grids (recency calendar-bounded, frequency basket-bounded, monetary cent-quantized)",
    "q179_kaplan_meier" -> "at-risk/survival cumulations over the duration-day grid (calendar-bounded)",
    "q182_ks_test" -> "CDF cumulations over the merged DISTINCT-score count grid (q97's bounded-grid argument)",
    "q192_source_concentration" -> "rank/cumulative windows over the per-source aggregate (one row per source)",
    "q198_inventory_abc" -> "rank/cumulative windows over the per-part revenue aggregate (part-dimension grid, not the fact table)",
    "q230_rrf_fusion" -> "rank windows over the ≤50-row retrieval lists (upstream limit(k) — the q70 bounded-input argument)",
    "q234_mann_whitney" -> "cumulative window over the DISTINCT-value count grid (q97's bounded-grid argument)",
    "q237_theil_sen" -> "rank window over the calendar-bounded pairwise-slope grid (≤ days² rows at any corpus scale)",
    "q242_compaction_plan" -> "cumulative window over the unit grid (file/partition count, never data rows)",
    "q243_page_hinkley" -> "running prefix windows over the calendar day grid (q169's calendar-bounded argument)",
    "q244_nelson_aalen" -> "risk-set/hazard cumulations over the duration-day grid (q179's calendar-bounded argument)",
    "q246_poisson_bootstrap" -> "rank window over the reps-row replicate-mean grid (64 rows by construction)",
    "q249_log_rank" -> "at-risk prefix cumulations over the duration-day grid (q179's calendar-bounded argument)",
    "q263_forecast_backtest" -> "lag window over the calendar day grid (q169's calendar-bounded argument)",
    "q268_seasonal_decompose" -> "centered moving-average window over the calendar day grid (q169's calendar-bounded argument)",
    "q271_bh_fdr" -> "rank window over the |segments|-row test grid (bounded by segment cardinality)",
    "q276_conformal_interval" -> "rank windows over the <= holdoutDays-row backtest grid (calendar-bounded)",
    "q277_seasonal_anomalies" -> "centered moving-average window over the calendar day grid (q268's argument)",
    "q278_kruskal_wallis" -> "cumulative window over the DISTINCT-value count grid (q234's bounded-grid argument)",
    "q281_granger_lag" -> "lag window over the calendar day grid (q169's calendar-bounded argument)",
    "q288_huber_location" -> "median cumulation over the DISTINCT-value count grid (q234's bounded-grid argument)",
    "q289_forecast_mase" -> "lag windows over the calendar day grid (q263's calendar-bounded argument)",
    "q292_mad_outliers" -> "median cumulations over the DISTINCT-value and deviation count grids (q234's bounded-grid argument)",
    "q293_durbin_watson" -> "lag window over the calendar day grid (q169's calendar-bounded argument)",
    "q299_changepoint" -> "prefix-sum and argmin-rank windows over the calendar day grid (q169's calendar-bounded argument)",
    "q317_ivf_recall_curve" -> "monotonicity lag window over the |probes|-row curve (5 rows by construction)",
    "q320_seasonal_strength" -> "q268's centered moving-average window over the calendar day grid (q169's calendar-bounded argument)",
    "q321_holm" -> "rank + running-max windows over the |segments|-row test grid (q271's bounded argument)",
    "q325_runs_test" -> "lag windows over the calendar day grid (q169's calendar-bounded argument)",
    "q336_cliffs_delta" -> "q234's cumulative window over the DISTINCT-value count grid (bounded-grid argument)",
    "q337_rmst" -> "q179's prefix windows + one lead window over the duration-day grid (calendar-bounded argument)",
    "q342_rank_drift" -> "rank windows over the two single-query top-25 customer rankings (rboAtK with query_id constant -> |ranking| rows, aggregate-bounded)",
    "q347_wilcoxon_signed_rank" -> "midrank cumulation over the DISTINCT-|d| count grid (q234's bounded-grid argument)",
    "q355_by_fdr" -> "rank window over the |segments|-row test grid (q271's bounded argument)",
    "q360_anderson_darling" -> "CDF cumulations over the DISTINCT-value score grid (q182/q234's bounded-grid argument)")

  test("no query plans a global window over an unbounded relation") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(p: SparkPlan): Seq[WindowExec] = p match {
      case a: AdaptiveSparkPlanExec => globalWindows(a.executedPlan)
      case w: WindowExec =>
        (if (w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable))
          Seq(w) else Nil) ++ w.children.flatMap(globalWindows)
      case other => other.children.flatMap(globalWindows)
    }
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val gw =
          try globalWindows(fn(spark, sfDir).queryExecution.executedPlan)
          finally CacheScope.releaseAll()
        if (gw.nonEmpty) Some(name) else None
    }
    info(s"global-window queries: ${offenders.mkString(", ")}")
    val unexplained = offenders.filterNot(globalWindowAllowed.contains)
    assert(unexplained.isEmpty,
      s"global window without allowlist justification: ${unexplained.mkString(", ")}")
  }

  test("no query plans a cartesian product; nested-loop joins are " +
      "allowlisted with a tiny broadcast side") {
    val sfDir = "/root/testdata/sf0.001"
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        finally CacheScope.releaseAll()
      (name, plan.contains("CartesianProduct"),
        plan.contains("BroadcastNestedLoopJoin"))
    }
    val cartesians = findings.collect { case (n, true, _) => n }
    val bnlj = findings.collect { case (n, _, true) => n }
    info(s"BNLJ queries: ${bnlj.mkString(", ")}")
    assert(cartesians.isEmpty,
      s"CartesianProduct planned by: ${cartesians.mkString(", ")}")
    val unexplained = bnlj.filterNot(bnljAllowed.contains)
    assert(unexplained.isEmpty,
      s"BroadcastNestedLoopJoin without allowlist justification: ${unexplained.mkString(", ")}")
  }
}
