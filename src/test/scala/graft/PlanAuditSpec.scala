package graft

import org.apache.spark.sql.functions._

/** Plan audits: assert the physical plans actually have the scale
  * properties the operator docs claim — filters/projection pushed to the
  * parquet scan, dimension joins broadcast, typed map aggregations
  * partial+final — so regressions in plan shape fail CI, not the
  * 100 TB run. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString()

  test("q01: filter and projection reach the parquet scan") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_tax"), read)
  }

  test("q12: dimension join is a broadcast hash join") {
    val p = plan("q12_join_broadcast_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q49: map-monoid aggregation runs partial then final") {
    val p = plan("q49_map_union_sum")
    val aggs = p.linesIterator.count(l => l.contains("ObjectHashAggregate") || l.contains("SortAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregate pair:\n$p")
  }

  test("q56: hashed tf is one explode + one shuffle keyed on (id, bucket)") {
    val p = plan("q56_text_hashed_tf")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1, p)
  }

  // Queries whose plan legitimately funnels through a single partition:
  // a global statistics fit (mean/variance/percentile/idf/drift) ends in
  // a two-phase aggregate whose FINAL step is one partition holding one
  // row per upstream partition — bounded by partition count, not data.
  private val singlePartitionOk = Set(
    "q30_impute_indicator", "q31_standard_scale", "q33_percentile",
    "q39_raw_feature_filter", "q40_min_variance_filter", "q41_sanity_check",
    "q42_cramers_v", "q43_histogram_drift", "q57_text_tfidf",
    "q58_smart_text_decide", "q75_sanity_feature_corr",
    "q108_curation_lm_surprisal", "q116_curation_dsir_weights",
    // q128/q130: global sketch aggregations reduce to ONE bounded
    // buffer (<= ceil(1/phi) counters / k hashes) — a single-partition
    // final merge of per-partition sketches plus a broadcast of the
    // 1-row total / exact-count frame
    "q128_heavy_hitters", "q130_kmv_distinct",
    // q133/q134: global profile/drift fits — the final aggregate is one
    // row (per profiled column / one PSI scalar); q134's BNLJ broadcasts
    // the 1-row bucket-total frame against a <= `buckets`-row join
    "q133_column_profile", "q134_psi_drift",
    // q258: JS divergence — q134's exact shape (1-row bucket-total
    // frame broadcast against the <= `buckets`-row histogram join)
    "q258_js_divergence",
    // q267: each FD pair reduces its (already aggregated, LHS-sized)
    // violation counts to ONE row — a per-pair readout, like q134
    "q267_fd_check",
    // q269: the column scoreboard is ONE aggregated row exploded back
    // to a row per tracked column
    "q269_snapshot_column_diff",
    // q275: each dup profile reduces its digest-group counts to one row
    "q275_dup_row_profile",
    // q277: delta-method lift crosses two 1-row arm sufficient-stat
    // frames, the q198/q259 shape
    "q277_ratio_lift",
    // q135/q136: BM25 — same shape as q57's idf fit: the corpus size /
    // total-token scalars are 1-row frames crossJoin-broadcast into the
    // scoring join
    "q135_text_bm25", "q136_bm25_topk",
    // q333: the df-cutoff corpus-size scalar is a 1-row frame
    // broadcast-joined (non-equi, so BNLJ) over the token aggregates —
    // q135's corpus-scalar shape
    "q333_inverted_index",
    // q359: the richness readout reduces the frequency-of-frequencies
    // to ONE sufficient-stats row — q198's shape
    "q359_chao1_richness",
    // q563: the Zipf-alpha readout reduces the (already aggregated)
    // word-frequency table to ONE sufficient-stats row — q359's shape
    "q563_vocab_zipf_alpha",
    // q572: the name-column fit reduces each analyzed column to ONE
    // sufficient-stats row (guard counts + strategy m/f/o counts) via
    // partial+final aggregation — the single partition merges 32
    // per-partition partials, q133's per-column-profile shape
    "q572_name_column_detect",
    // q577: the gold-fixture gate runs the SAME per-column 1-row
    // partial+final fit as q572, over five 12-row literal columns —
    // the funnel carries <= 32 partials per column
    "q577_name_gold",
    // q367: the revenue-total scalar is a 1-row frame crossJoin-
    // broadcast over the part classes; the prefix-sum offsets collect
    // is O(#partitions) (cumulativeByValue contract, q160's shape)
    "q367_abc_xyz",
    // q365 was allowlisted here until r12: it now materializes its
    // 2-row readout eagerly (localCheckpoint(true), releasing the t/e
    // caches at the library surface — r11 ADVICE item), so the returned
    // plan is an RDD scan and the funnel moved to the EAGER path the
    // sweep bounds by runtime row evidence.
    // q360: the corpus totals (N, M) are 1-row frames crossJoin-
    // broadcast into the PMI scoring join — q135's corpus-scalar shape
    "q360_word_pmi_topk",
    // q139: target-encoding fit — the global-prior scalar is a 1-row
    // frame crossJoin-broadcast over the encoded rows
    "q139_target_encode",
    // q369: the positive-average-balance scalar is a 1-row frame
    // crossJoin-broadcast over the customers — q139's shape
    "q369_idle_rich_customers",
    // q142: the node-count scalar (rank normalization) is a 1-row frame
    // crossJoin-broadcast over the rank rows
    "q142_pagerank",
    // q144: OOF target encoding — the global-prior scalar is a 1-row
    // frame crossJoin-broadcast, like q139
    "q144_target_encode_oof",
    // q145/q147: global stats fits — the KS totals / robust-scale
    // percentile frames are 1 row, crossJoin-broadcast (q31/q33 shape)
    "q145_ks_drift", "q147_robust_scale",
    // q151: MI — contingency total / marginal-entropy frames are 1 row,
    // crossJoin-broadcast
    "q151_mutual_info",
    // q153: the control and treatment aggregates are 1-row frames
    // crossJoin-broadcast into the readout row
    "q153_ab_lift",
    // q154: the entity-count scalar is a 1-row frame crossJoin-broadcast
    // over the O(types^2) pair rows
    "q154_cooccurrence_lift",
    // q164: the corpus-size scalar (draw modulus) is a 1-row frame
    // crossJoin-broadcast over the anchors
    "q164_negative_sample",
    // q525: the lang-count total and the temperature-weight total are
    // 1-row frames crossJoin-broadcast over the <= #languages rows —
    // q198's scalar shape twice
    "q525_lang_temperature_mix",
    // q166/q168: percent-rank / skew-report totals are 1-row frames
    // crossJoin-broadcast; both ride cumulativeByValue like q145
    "q166_quantile_rank", "q168_skew_report",
    // q169: the integrity readout is one final row + the 1-row
    // dim-key-count frame
    "q169_referential_integrity",
    // q170: the percentile-fence fit is a 1-row frame, q147's shape
    "q170_winsorize",
    // q175: chunk-level BM25 retrieval — inherits q135/q136's 1-row
    // corpus-scalar crossJoin-broadcast shape
    "q175_rag_retrieve",
    // q197/q198/q213: test statistics assemble 1-row sufficient-stat
    // frames (marginal counts, per-group moments, digit totals) via
    // crossJoin-broadcast — the single partition holds O(1) rows
    "q197_chi_square", "q198_welch_ttest", "q213_benford",
    // q346: assortativity reduces the edge-endpoint moments to ONE
    // sufficient-stats row — q198's shape
    "q346_degree_assortativity",
    // q208: the corpus doc-count scalar is a 1-row frame
    // crossJoin-broadcast into the tf-idf scoring
    "q208_keyword_extract",
    // q212: rolling correlation of ONE pre-aggregated bucket series —
    // the global window runs over O(#buckets) rows (the raw rows were
    // reduced by the daily aggregation before any window)
    "q212_rolling_corr",
    // q219: the bin total is a 1-row frame crossJoin-broadcast
    "q219_calibration_ece",
    // q353: the grand-total window runs over the 25-row nation frame
    // (reduced by the groupBy before any window) — q178's readout scale
    "q353_pct_of_parent",
    // q354: the pooled-corr scalar is a 1-row frame crossJoin-broadcast
    // over the 5 rollup rows — q198's sufficient-stats shape
    "q354_simpsons_paradox",
    // q221/q222: ordered passes over DOMAIN-bounded frames — the gains
    // window over 10 deciles, the Zipf rank over the vocabulary — each
    // reduced by an aggregation before the window
    "q221_gains_table", "q222_zipf_fit",
    // q220/q341/q406: survival estimators ride the ADAPTIVE prefix sum
    // (cumulativeByValueAuto): the dispatch count() proves the duration
    // domain <= 10k rows before choosing the windowed plan, so the
    // SinglePartition exchange here is bounded BY CONSTRUCTION (the
    // machine-check below re-verifies from runtime metrics); past the
    // bound the plan falls back to the two-level prefix sum and this
    // pattern disappears. Plus the usual 1-row cutoff/grand-total
    // frames and q406's 1-row chi2 readout — q145's exact shape
    "q220_kaplan_meier", "q341_nelson_aalen", "q406_logrank",
    // q408: the train/test cutoff is a 1-row max-date frame
    // crossJoin-broadcast into both splits, and the per-type quantile
    // fit broadcasts a key-domain-sized frame — q139's fit shape
    "q408_pinball_loss",
    // q215: MI / marginal-entropy frames are 1 row, q151's exact shape
    "q215_theils_u",
    // q216: the node-count scalar (rank normalization) + the broadcast
    // seed-set membership join, q142's shape
    "q216_personalized_pagerank",
    // q325: HITS's final hub/auth normalizations ride lazily on the
    // half-iteration checkpoints (r12: the cut moved BEFORE the
    // normalization so the heavy subtree computes once) — each is a
    // 1-row L2-norm aggregate (SinglePartition by construction)
    // crossJoin-broadcast over the node frame, q198's scalar shape
    "q325_hits",
    // q217: the replica means reduce to `replicas` rows; the point-mean
    // and CI aggregates are 1-row frames crossJoin-broadcast
    "q217_bootstrap_ci",
    // q225/q226: impute/outlier fits — the global-median fallback and
    // the sufficient-stat moment frames are 1 row, crossJoin-broadcast
    // (q30/q31's fit shape)
    "q225_group_impute", "q226_mahalanobis",
    // q229: three percent-rank fits (max-date scalar + the
    // cumulativeByValue offsets), q166's shape per dimension
    "q229_rfm",
    // q231: the conversion-timing readout is one final row
    "q231_conversion_time",
    // q233: cumulativeByValue offsets + the 1-row revenue-total frame
    "q233_pareto",
    // q237: the isotropy readout is one final row over 2000 pair scores
    "q237_embedding_isotropy",
    // q250: the DiD readout reduces 4 cell means to one row
    "q250_did",
    // q288: cumulativeByValue offsets + the 1-row total frame + the
    // 10-row decile window (domain-bounded, q221's gains-table shape)
    "q288_lorenz_curve",
    // q292: the ANOVA readout reduces k group-stat rows to one row
    "q292_anova",
    // q402/q403: 2x2-concordance / trend-test readouts reduce the
    // sufficient-stats rows to ONE final row — q292's shape
    "q402_mcnemar", "q403_cochran_armitage",
    // q417: the balance/migration readout crosses two 1-row aggregate
    // frames (8-shard stats x moved count) — q323's shape
    "q417_rendezvous_shards",
    // q427: the basket-count scalar (lift denominator) is a 1-row
    // frame crossJoin-broadcast into the bounded brand-pair rules
    "q427_association_rules",
    // q447/q449 were allowlisted here until r11: they now materialize
    // their 1-row readout eagerly (to release the cached projection),
    // so the returned plan is an RDD scan and the funnel moved to the
    // EAGER path, which the sweep bounds by runtime row evidence — the
    // stale-entry check prunes them per its own contract.
    // q436: the transition-total scalar is a 1-row frame
    // crossJoin-broadcast into the state-domain (5-row) readout
    "q436_markov_entropy",
    // q437: the two-segment moment frame and the Mann-Whitney readout
    // are both 1-row frames crossed for the final row — q292's shape
    "q437_effect_sizes",
    // q428: the (total, interval, offset) frame is ONE row
    // crossJoin-broadcast over the prefix rows — q166's
    // cumulativeByValue offsets + q198's scalar shape
    "q428_monetary_unit_sampling",
    // q531: the bigram-type count is a 1-row frame crossJoin-broadcast
    // into the vocabulary-keyed surprisal join — q108's scalar shape
    "q531_kn_bigram_surprisal",
    // q538: the distinct-user count is a 1-row frame
    // crossJoin-broadcast over the (type², bounded) pattern rows
    "q538_seq_pattern_support",
    // q540: the (corpus tokens, vocab size) totals are a 1-row frame
    // crossJoin-broadcast into the vocab-keyed KL grid
    "q540_source_vocab_kl",
    // q544: the total-bigram count is a 1-row frame crossJoin-broadcast
    // over the 100²-bounded collocation rows; the top-100 filter is a
    // TakeOrdered frame feeding two broadcast semi-joins
    "q544_pmi_collocations",
    // q545: the source-domain frame (bounded) and the 1-row corpus
    // total cross the value-domain grid — q540's scalar shape; the
    // cumulatives are source-partitioned windows
    "q545_wasserstein_length",
    // q546: cumulativeByValueAuto's machine-bounded fast path over the
    // score domain, plus the 1-row total / max-J / threshold frames
    // crossJoin-broadcast back — q166 + q198's scalar shapes
    "q546_youden_threshold",
    // q547: the 20-bin range frame crosses the type-domain (bounded)
    // stats frame — q411's tiny-grid shape
    "q547_psi_drift",
    // q549: two cumulativeByValueAuto prefix sums over the md5 hash
    // domain — the machine-bounded fast path / two-level fallback
    "q549_epoch_shuffle",
    // q554: the three 1-row triad/edge-count frames cross for the
    // single readout row — q437's scalar shape
    "q554_preference_cycles",
    // q557: the 1-row cluster-stats and corpus-total frames cross for
    // the single readout row — q437's scalar shape
    "q557_dedup_savings",
    // q429: the largest-remainder rank runs over the 25-row BRAND
    // frame (bounded domain) with its 1-row denominator — q221's
    // gains-table shape
    "q429_neyman_allocation",
    // q300: ANOVA tail on the |x - median| deviations, q292's shape
    "q300_brown_forsythe",
    // q301: the global cell-count mean/std is a 1-row sufficient-stat
    // frame crossed over the cell-domain-sized hotspot rows
    "q301_geo_hotspot",
    // q306: the EM param frames are 1-row aggregates crossed over the
    // 8-row agreement-pattern table each iteration
    "q306_fs_linkage_em",
    // q312: the histogram total is a 1-row frame crossed over the
    // bin-domain-sized grid
    "q312_hist2d",
    // q320: the cumulative sweep window runs over the 11-bucket
    // threshold domain (q221's gains-table shape)
    "q320_dedup_threshold_curve",
    // q322: the reach window runs over the weeks domain
    "q322_cumulative_reach",
    // q323: the leakage readout crosses two 1-row count frames
    "q323_split_leakage",
    // q328: the vocab-size / doc-total scalars are 1-row frames crossed
    // into the 5-row class-stats table, which broadcasts over the
    // per-token scoring join
    "q328_nb_classify",
    // q378: the fusion rank windows run over two bounded (<= k = 50 row)
    // rank lists — q320's bounded-domain window shape
    "q378_rrf_fusion",
    // q388: the jackknife folds run on the 16-row bucket frame and cross
    // two 1-row sufficient-stat frames — q198/q259's shape
    "q388_jackknife_se",
    // q392: the cumulative-weight window and as-of union run over the
    // bounded vocabulary (corpus-scalar fit, q57's idf shape); the
    // weight total is a 1-row frame crossJoin-broadcast into the draws
    "q392_negative_sampler",
    // q393/q394: the percent-rank decile fit is q221's gains-table shape
    // (cumulativeByValue prefix collect + 1-row n frame broadcast), and
    // q394's Qini window runs over the 10-row decile frame
    "q393_psm_att", "q394_qini_uplift",
    // q395: the global-mean prior is a 1-row frame crossJoin-broadcast
    // over the bounded type frame — q139's shape
    "q395_hier_target_encode",
    // q397: each format digest reduces to ONE sufficient-stats row and
    // crosses the 1-row parquet reference digest — q198's shape
    "q397_multi_format_consistency",
    // q400: the value-domain prefix runs two-level — the global window
    // orders only the 4096-wide BUCKET frame (price domain / 4096, a few
    // dozen rows), and the 1-row (n1,n2) totals frame crossJoin-broadcasts
    // into the terms — q198's scalar shape over q320's bounded domain
    "q400_wasserstein",
    // q401: the method-of-moments Beta prior is ONE sufficient-stats row
    // (from the bounded brand frame) crossJoin-broadcast into the
    // per-brand readout — q139/q198's shape
    "q401_eb_shrinkage",
    // q461: the BH step-up runs entirely on the 35-row hypothesis frame
    // (5 event types x 7 weekdays, an aggregation output): the rank
    // self-join is a broadcast over those 35 rows and the k-max
    // threshold is a 1-row frame crossJoin-broadcast — q198's
    // sufficient-stats shape; the raw events reduce in the first
    // groupBy and never see a window or nested loop
    "q461_bh_fdr",
    // q466: after the transition groupBy reduces the events to the
    // (channels+3)² chain frame, the base-conversion scalar and the
    // removal-effect total are 1-row frames crossJoin-broadcast over
    // the 4-channel readout — q198's sufficient-stats shape
    "q466_markov_removal",
    // q480: the corpus-total scalar is a 1-row frame crossJoin-broadcast
    // into the SOURCE-domain item frame (~20 rows), and the knapsack DP
    // folds over one collected source array — bounded by the source
    // vocabulary, q198's scalar shape
    "q480_knapsack_select",
    // q493: the value-domain prefix window runs over the BUCKET frame
    // (price/1000, a few hundred rows post-agg) with a 1-row totals
    // frame crossJoin-broadcast — q400's exact Wasserstein shape
    "q493_energy_distance",
    // q494/q495: the whole answer is ONE sufficient-stats row (global
    // moment aggregation) — q198's scalar shape
    "q494_covariance_matrix", "q495_pca2_closed_form",
    // q497: the survival prefix rides cumulativeByValue (no domain
    // window); the 1-row grand-total frame and the one-sufficient-
    // stats-row Weibull fit remain — q145's shape; q499: the index
    // numbers are one cross-term row (q198's scalar shape after the
    // per-part rollup)
    "q497_weibull_fit", "q499_price_indices",
    // q505: the Heaps regression reduces the corpus to ONE (lnN, lnV)
    // point per source (~20 rows) and then one sufficient-stats row —
    // q198's scalar shape
    "q505_heaps_law",
    // q507: the grand-mean frame is ONE row crossJoin-broadcast into
    // the demeaning pass (entity/time means ride broadcast equi-joins);
    // the readout is one sufficient-stats row — q198's scalar shape
    "q507_twfe_regression",
    // q509: the item-agreement and category-marginal frames each reduce
    // to ONE sufficient-stats row crossed for the kappa readout; q510:
    // the ICC is one mean-squares row off the nation rollup — q198's
    // scalar shape
    "q509_fleiss_kappa", "q510_icc",
    // q514: the coincidence-diagonal and category-marginal frames are
    // 1-row sufficient-stats rows crossed for the alpha readout —
    // q509's exact shape; q515: the B-cubed term sums and the doc/
    // cluster totals are 1-row frames crossed for the P/R/F1 readout
    "q514_krippendorff_alpha", "q515_bcubed_cluster_eval",
    // q516: each register set folds to ONE (buckets_set, sum) row and
    // the exact union/intersect is one count row — four 1-row frames
    // crossed for the inclusion-exclusion readout, q198's scalar shape
    "q516_hll_union_algebra",
    // q518: the padding bill is ONE global sufficient-stats row
    // (count + 5 sums) exploded into 3 scheme rows — q198's shape
    "q518_padding_waste",
    // q519: the corpus-total and the two EG normalization sums are
    // 1-row frames crossJoin-broadcast over the ~20-source frame —
    // q135's corpus-scalar shape
    "q519_doremi_reweight")

  // Queries that intentionally use a broadcast nested-loop join: a
  // provably tiny broadcast side (single-row stats frame, query set,
  // codebook) joined without an equi-key. Bounded by the broadcast
  // threshold; never a shuffle of the big side.
  private val bnljOk = singlePartitionOk ++ Set(
    "q26_sim_bruteforce_topk", "q84_sim_pq_topk",
    // q527 is q26's banded variant — same broadcast-query-set scan
    "q527_hard_negatives",
    // q149/q155 evaluate the SRP list against the brute-force truth, so
    // they inherit q26's broadcast-query-set scan
    // q268 inherits the same broadcast-query-set scan as q149/q155
    "q149_ann_ndcg", "q155_ann_recall", "q268_ann_mrr",
    // q548 evaluates the int8 ranking against the brute truth — two
    // broadcast-query-set scans, q155's shape
    "q548_int8_recall",
    // q561 evaluates two prefix-dim brute rankings against the full-dim
    // truth — three broadcast-query-set scans, q155's shape
    "q561_dim_ablation_recall",
    // q327 inherits q26's broadcast-query-set brute scan
    "q327_knn_classify",
    // q456: the 3x3 grid-offset frame (NINE rows) crossJoin-broadcasts
    // over the point frame to build the cell probes — the bounded
    // replicate-by-constant shape; the eps-ball join itself is an
    // equi-join on the cell key
    "q456_point_dbscan",
    // q454: the series-pair frame is a (series x series) crossJoin of
    // the GROUP-count frame (5 rows each side) — q427's tiny-grid
    // shape; all DP work is row-local folds after the pairing
    "q454_dtw_distance",
    // q453: the trial grid is a (group-count x 8-trial) crossJoin of
    // two bounded frames — q427's tiny-grid shape; the scoring passes
    // are broadcast equi-joins on the group key
    "q453_ransac_line",
    // q451 re-ranks q26's top-10 lists, so it inherits the same
    // broadcast-query-set brute scan; the MMR rounds themselves are
    // equi-joins over k-bounded candidate frames
    "q451_mmr_rerank",
    // q378's semantic arm inherits q26's broadcast-query-set brute scan
    "q378_rrf_fusion",
    // q411: the zero-filled grid crosses the group-domain frame with
    // the BUCKET-domain frame (both aggregation outputs, ~125 x 6
    // rows) — a bounded-domain broadcast, never a shuffle of rows
    "q411_t_closeness",
    // q432: the 4-channel frame crosses the 16-row subset-value grid
    // — a 64-row bounded-domain broadcast, never a shuffle of rows
    "q432_shapley_attribution",
    // q441: the 10-row RBO depth-weights frame crosses the bounded
    // top-10 rank lists — a bounded-domain broadcast
    "q441_rbo",
    // q382 evaluates every zone against the bounded month-predicate
    // dimension (<= data-span months, ~100 rows broadcast) — the zone
    // stream stays distributed, so the BNLJ is a tiny-broadcast scan
    "q382_zonemap_audit",
    // q541: q472's bounded-probe-set pair cross (doc_id % 29 sample);
    // the LCS DP is a row-local nested fold after the pairing
    "q541_rouge_l",
    // q472: the alignment pair frame crosses the BOUNDED probe set
    // (doc_id % 37, ~1/37th of docs capped by the broadcast threshold)
    // with itself — q454's tiny-grid shape; the DP fold is row-local
    "q472_needleman_wunsch",
    // q517: the PDP (dim, grid) cell frame is 20 rows crossJoin-
    // broadcast over the embeddings — a bounded-domain broadcast
    "q517_pdp_profile")

  // Queries where a CartesianProduct is the algorithm, not an accident:
  // ALS recommendForAllUsers scores ALL user x item pairs by design —
  // Spark implements it as a cartesian of FACTOR BLOCKS (each a bounded
  // blockSize x rank matrix, multiplied with level-3 BLAS), so the
  // cross-product is over O(n/blockSize) tiny matrices, never raw rows.
  private val cartesianOk = Set("q194_als_recommend")

  // Walk the EXECUTED physical tree, descending through the adaptive
  // wrapper, materialized query stages, and subquery plans — the places
  // runtime row-count metrics live after a run.
  private def flattenExec(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: (kids ++ p.subqueries).flatMap(flattenExec)
  }

  private val rowBound = 10000L

  // Row counts moved through SinglePartition exchanges, read from the
  // runtime metrics of an EXECUTED tree; only populated metrics count.
  private def singlePartitionRows(
      nodes: Seq[org.apache.spark.sql.execution.SparkPlan]): Seq[Long] = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    nodes.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        e.metrics.get("shuffleRecordsWritten").map(_.value)
          .orElse(e.child.metrics.get("numOutputRows").map(_.value))
    }.flatten
  }

  // BNLJ build-side broadcast row counts (the branch an allowlist entry
  // excuses — a nested equi-join's broadcast under the same subtree is
  // the planner's own size-thresholded choice, not ours to bound).
  private def bnljBuildRows(
      nodes: Seq[org.apache.spark.sql.execution.SparkPlan]): Seq[Long] = {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    nodes.collect {
      case j: BroadcastNestedLoopJoinExec =>
        val buildPlan = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          case _ => j.left
        }
        flattenExec(buildPlan)
          .collectFirst { case b: BroadcastExchangeExec => b }
          .flatMap(_.metrics.get("numOutputRows").map(_.value))
    }.flatten
  }

  /** Run `body` with a QueryExecutionListener attached, returning its
    * result plus every QueryExecution the closure triggered EAGERLY
    * (collects inside fits, scaffold writes, …). These executions never
    * appear in the returned frame's plan — the r7 audit blind spot: a
    * side-effect action inside a query lambda could hide a global sort
    * from both the pattern sweep and the row-bound check. The listener
    * bus is drained before reading the capture (delivery is async). */
  private def withCapturedExecutions[T](body: => T)
      : (T, Seq[org.apache.spark.sql.execution.QueryExecution]) = {
    import scala.jdk.CollectionConverters._
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.QueryExecution]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = buf.add(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = buf.add(qe)
    }
    spark.listenerManager.register(l)
    try {
      val r = body
      org.apache.spark.GraftSparkAccess.flushListenerBus(spark.sparkContext)
      (r, buf.asScala.toSeq)
    } finally spark.listenerManager.unregister(l)
  }

  test("allowlist entries carry MACHINE-CHECKED bounds: every " +
    "single-partition exchange and BNLJ broadcast side in an allowlisted " +
    "query moves <= 10k rows at sf0.001") {
    // Comment-only justification does not scale to 500 queries: an
    // entry whose "bounded domain" silently becomes row-sized (e.g. a
    // ms-resolution duration) must FAIL CI, not hide behind an old
    // allowlist comment. Execute each allowlisted query and read the
    // runtime metrics of exactly the branches the allowlist excuses.
    val offenders = (singlePartitionOk ++ bnljOk).toSeq.sorted.flatMap { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      df.queryExecution.toRdd.count()
      val nodes = flattenExec(df.queryExecution.executedPlan)
      singlePartitionRows(nodes).filter(_ > rowBound)
        .map(v => s"$n: SinglePartition exchange carries $v rows") ++
        bnljBuildRows(nodes).filter(_ > rowBound)
          .map(v => s"$n: BNLJ broadcast side carries $v rows")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("eager-execution capture is LIVE: a side-effect action inside a " +
    "closure is seen, and its single-partition funnel is measurable") {
    // Positive control for the sweep below — if listener registration,
    // bus drain, or metric reads silently break, the sweep would pass
    // vacuously; this test fails instead. The probe closure mimics the
    // r7 q521 scaffold: an eager global-sort action whose plan never
    // reaches the returned frame.
    val (_, captured) = withCapturedExecutions {
      spark.range(0, 500).toDF("id")
        .orderBy(col("id")).agg(sum(col("id"))).collect()
      42
    }
    assert(captured.nonEmpty, "listener captured no executions")
    val sp = captured.map(qe => singlePartitionRows(flattenExec(qe.executedPlan)))
    assert(sp.exists(_.nonEmpty),
      s"no measurable SinglePartition exchange in ${captured.size} captures")
  }

  test("global sweep: no cartesian products; single-partition exchanges " +
    "and nested-loop joins only in allowlisted stats fits; no STALE " +
    "allowlist entries") {
    val sp = scala.collection.mutable.Set.empty[String]
    val bnlj = scala.collection.mutable.Set.empty[String]
    val cart = scala.collection.mutable.Set.empty[String]
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val (df, captured) =
        withCapturedExecutions(SparkEntry.queries(n)(spark, sf))
      val p = df.queryExecution.executedPlan.toString
      if (p.contains("Exchange SinglePartition")) sp += n
      if (p.contains("BroadcastNestedLoopJoin")) bnlj += n
      if (p.contains("CartesianProduct")) cart += n
      // EAGER executions the closure ran while building the frame (fit
      // collects, scaffold writes): these already executed, so bound
      // them by RUNTIME EVIDENCE rather than a name allowlist — any
      // single-partition funnel or BNLJ build side must move <= rowBound
      // rows, and cartesian products are forbidden outright. This closes
      // the r7 blind spot where a side-effect global sort was invisible.
      val eager = captured.flatMap { qe =>
        val nodes = flattenExec(qe.executedPlan)
        val cartHit = nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
        (if (cartHit && !cartesianOk(n))
          Seq(s"$n: CartesianProduct in EAGER execution") else Nil) ++
          singlePartitionRows(nodes).filter(_ > rowBound).map(v =>
            s"$n: EAGER SinglePartition exchange carries $v rows") ++
          bnljBuildRows(nodes).filter(_ > rowBound).map(v =>
            s"$n: EAGER BNLJ broadcast side carries $v rows")
      }
      eager ++ Seq(
        if (cart(n) && !cartesianOk(n))
          Some(s"$n: CartesianProduct") else None,
        if (sp(n) && !singlePartitionOk(n))
          Some(s"$n: unexpected SinglePartition exchange") else None,
        if (bnlj(n) && !bnljOk(n))
          Some(s"$n: unexpected BroadcastNestedLoopJoin") else None).flatten
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
    // An allowlist entry whose plan no longer shows the excused pattern
    // is dead weight that could silently excuse a FUTURE regression —
    // prune it when the query improves (as the survival family did).
    val staleSp = singlePartitionOk.filterNot(n => sp(n) || bnlj(n))
    val staleBnlj = (bnljOk -- singlePartitionOk).filterNot(bnlj)
    val staleCart = cartesianOk.filterNot(cart)
    assert(staleSp.isEmpty && staleBnlj.isEmpty && staleCart.isEmpty,
      s"stale allowlist entries — singlePartitionOk: $staleSp, " +
        s"bnljOk: $staleBnlj, cartesianOk: $staleCart")
  }
}
