"""Physical-plan regression tests: the scale properties SURVEY §2/§7.3.6
promises must be visible in the executed plan, not just hoped for.

A query can be value-correct and still carry a plan that dies at 100 TB
(full sort instead of top-k, sort-merge join against a 25-row dim, a scan
reading all 11 columns for a 4-column projection). These tests pin the
plan shape so a future edit that silently regresses the physics fails CI.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.registry import all_queries

QUERIES = all_queries()


def plan_of(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: (struct<[^>]*>?)", plan)


def test_scan_prunes_and_pushes(spark, sf_dir):
    """Predicates and the 4-column projection must reach the parquet scan."""
    plan = plan_of(spark, sf_dir, "filter_pushdown_project")
    assert "PushedFilters: [" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    # NB: toString truncates long pushed-filter lists — match the prefix
    assert "GreaterThan(l_discount" in plan
    # column pruning: the scan reads only the 4 projected + 1 filter column
    (rs,) = read_schemas(plan)
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs


def test_dim_joins_broadcast(spark, sf_dir):
    """Star joins against ≤10k-row dims must be broadcast hash joins —
    never a shuffle of the fact side (SURVEY §7.3.6)."""
    plan = plan_of(spark, sf_dir, "join_broadcast_dims")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    # dim scans are pruned to join key + payload
    for rs in read_schemas(plan):
        assert "p_retailprice" not in rs  # unused part column never read


def test_topk_avoids_full_sort(spark, sf_dir):
    """orderBy().limit(k) must plan as TakeOrderedAndProject (heap top-k),
    not a global Sort — the difference between O(n log k) per partition
    and a full-shuffle range sort at 100 TB."""
    plan = plan_of(spark, sf_dir, "join_multiway_topk")
    assert "TakeOrderedAndProject" in plan


def test_agg_is_partial_final(spark, sf_dir):
    """groupBy aggregates must map-side combine: two HashAggregate levels
    around exactly one HASH exchange, with the date filter pushed to the
    scan. At the test SF the narrow-input guard (helpers.spread_narrow,
    r14 optimization) additionally inserts one REBALANCE round-robin
    exchange below the partial aggregate — that exchange must NOT exist
    in the keyed position (the agg still costs exactly one hash
    partitioning), and at scale the guard is a no-op."""
    plan = plan_of(spark, sf_dir, "pricing_summary")
    assert plan.count("HashAggregate") == 2
    assert plan.count("hashpartitioning") == 1
    assert plan.count("Exchange") <= 2
    assert "LessThanOrEqual(l_shipdate" in plan


def test_latest_per_group_single_shuffle(spark, sf_dir):
    """The window dedup must cost exactly one hash partitioning by key."""
    plan = plan_of(spark, sf_dir, "latest_per_group")
    assert plan.count("Exchange") == 1


def test_exact_dedup_single_shuffle(spark, sf_dir):
    """Hash dedup is one shuffle on the digest; the text column must not
    survive past the scan projection into the shuffle."""
    plan = plan_of(spark, sf_dir, "exact_dedup")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial+final over the hash


def test_summary_pipeline_broadcasts_items(spark, sf_dir):
    """The IR summary read path joins fact⋈items via broadcast (J1/J4):
    the item dim is bounded at ~10k rows by design."""
    plan = plan_of(spark, sf_dir, "ir_summary_pipeline")
    assert "BroadcastHashJoin" in plan


def test_partition_pruning(spark, tmp_path):
    """A filter on the partition column must prune directories at planning
    time (PartitionFilters), reading one fiscal_year of a table laid out
    like the silver fact table — the on-disk analogue of the reference's
    (company_id, fiscal_year) index (SURVEY §4)."""
    base = spark.range(100).selectExpr(
        "CAST(2020 + id % 4 AS STRING) AS fiscal_year", "id AS v"
    )
    path = str(tmp_path / "facts")
    base.write.partitionBy("fiscal_year").parquet(path)
    df = spark.read.parquet(path).filter(F.col("fiscal_year") == "2023")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(fiscal_year" in plan
    assert df.count() == 25


def test_regional_revenue_plan(spark, sf_dir):
    """The 6-table Q5-shape chain must broadcast every dim (nation/region
    at least) and never sort-merge against them."""
    plan = plan_of(spark, sf_dir, "regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("HashAggregate") == 2  # partial+final rollup


def test_shipping_priority_plan(spark, sf_dir):
    """Q3 shape: both date filters pushed to the scans, the filtered
    customer keys broadcast, and the top-10 via heap top-k — no global
    sort of the per-order rollup."""
    plan = plan_of(spark, sf_dir, "shipping_priority_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_returned_item_report_aggregates_before_join(spark, sf_dir):
    """Q10 shape: the per-customer rollup must complete (partial+final
    HashAggregate) before the customer join, so the join input is one row
    per customer, not every returned lineitem."""
    plan = plan_of(spark, sf_dir, "returned_item_report")
    assert "EqualTo(l_returnflag,R)" in plan  # predicate at the scan
    assert plan.count("HashAggregate") >= 2
    # the aggregate feeds the join build/stream side, not vice versa: the
    # plan string nests children below parents, so the join appears above
    # the final HashAggregate
    assert plan.index("Join") < plan.rindex("HashAggregate")


def test_variant_ops_scan_only(spark, sf_dir):
    """Variant extraction is a pure projection: zero exchanges, and the
    scan reads only the two referenced columns."""
    plan = plan_of(spark, sf_dir, "variant_json_ops")
    assert "Exchange" not in plan
    (rs,) = read_schemas(plan)
    assert "props" in rs and "user_id" not in rs


def test_bpe_pair_counts_heap_topk_partial_agg(spark, sf_dir):
    """The tokenizer pair count must map-side combine (partial+final
    HashAggregate around one exchange) and take the top-50 as a heap, not
    a global sort of the pair distribution."""
    plan = plan_of(spark, sf_dir, "bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1


def test_ann_ivf_centroids_broadcast(spark, sf_dir):
    """IVF assignment must score corpus×centroids via a BROADCAST nested
    loop (centroids are |corpus|/stride); a shuffled CartesianProduct here
    is the plan that dies at scale."""
    plan = plan_of(spark, sf_dir, "ann_ivf_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["ann_ivf_topk", "ann_ivfpq_topk", "kmeans_assign", "knn_classify_ivf"]
)
def test_nearest_assignment_aggregates_not_windows(spark, sf_dir, name):
    """The corpus-sized nearest-centroid assignment (r14 optimization)
    must be a partial/final min- or max-aggregate, never a row_number
    window: the window shape shuffles and sorts the full corpus×nlist
    scored frame, the aggregate ships one pre-combined row per key. The
    bounded probe/vote windows (query set × nlist, k·|test| votes) are
    allowed; what must NOT appear is a window whose partition key is the
    corpus-row id (vec_id) — that is the straggler at 10^9 vectors."""
    plan = plan_of(spark, sf_dir, name)
    # map-side combine of the argmin/argmax struct is present
    assert "partial_max(sc" in plan or "partial_min(sc" in plan
    # no window partitioned by the corpus id survives anywhere
    for m in re.finditer(r"Window .*?windowspecdefinition\((\w+)#", plan):
        assert m.group(1) not in ("vec_id", "cid"), plan[m.start() : m.start() + 200]


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set must reach the containment join as a
    broadcast build side; the corpus side must never sort-merge for it."""
    plan = plan_of(spark, sf_dir, "benchmark_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stratified_sample_no_shuffle(spark, sf_dir):
    """Deterministic quota sampling is a pure scan+filter: zero exchanges."""
    plan = plan_of(spark, sf_dir, "stratified_sample")
    assert "Exchange" not in plan


@pytest.mark.parametrize(
    "name", ["window_ranking", "window_running_frames", "window_sessionize"]
)
def test_windows_shuffle_once_per_partitioning(spark, sf_dir, name):
    """Window families reuse one partitioning: no repeated exchanges on the
    same keys stacked back-to-back."""
    plan = plan_of(spark, sf_dir, name)
    assert plan.count("Exchange") <= 2


def test_repetition_metrics_codegen_no_hof(spark, sf_dir):
    """Bigram construction must stay in codegen (positional element_at),
    never an interpreted zip_with/transform lambda; both gram paths must
    map-side combine (partial aggregate before their shuffle)."""
    plan = plan_of(spark, sf_dir, "repetition_metrics")
    assert "lambdafunction" not in plan.lower()
    assert "zip_with" not in plan.lower()
    assert plan.count("partial_count") >= 2  # unigram + bigram paths
    assert "element_at" in plan


def test_corpus_mixture_no_token_explode(spark, sf_dir):
    """Token counts come from size(split(...)) — the plan must contain NO
    Generate (explode) node and only the cell-level aggregation shuffles."""
    plan = plan_of(spark, sf_dir, "corpus_mixture")
    assert "Generate" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_aqe_skew_join_split_fires(spark):
    """SCALE.md names AQE skew-split as the runtime backstop for join
    skew; this pins that it actually FIRES, not merely that the conf is
    set. A 90%-hot-key join under tightened skew thresholds must show
    ``skew=true`` on the sort-merge join in the final adaptive plan —
    proof AQE detected the oversized partition and split it."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # hot key 0 holds 90% of rows; sha2 payload resists shuffle
        # compression so the hot partition's bytes clear the threshold
        left = spark.range(60_000).select(
            F.when(F.col("id") % 10 > 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        # execute through the SAME DataFrame whose plan is inspected —
        # .count() would build a separate query execution and leave this
        # one unexecuted (isFinalPlan=false)
        assert len(joined.collect()) == 60_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan[:1500]}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_join_pushdown_fires(spark):
    """Runtime row-level join filtering (the engine's answer to 'the
    probe side scans 100 TB to join a selective build side'): with the
    size thresholds scaled to test data, a selective join must inject a
    BloomFilter aggregate on the build side and a ``might_contain``
    probe-side predicate — rows that cannot join die at the scan, before
    the shuffle. At production scale the default thresholds gate this to
    genuinely large probe sides; the mechanism is what's pinned here."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # broadcast would
        # subsume the bloom filter's job
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        import tempfile

        d = tempfile.mkdtemp(prefix="bloom_")
        spark.range(200_000).selectExpr(
            "id AS k", "sha2(CAST(id AS STRING), 256) AS payload"
        ).write.mode("overwrite").parquet(f"{d}/probe")
        spark.range(200_000).selectExpr(
            "id AS k", "id * 2 AS w"
        ).write.mode("overwrite").parquet(f"{d}/build")
        probe = spark.read.parquet(f"{d}/probe")
        # the injection heuristic wants a LIKELY-SELECTIVE predicate on
        # the creation side IN THE PLAN (that's what makes the bloom
        # filter worth building) — filter at read, not at write
        build = spark.read.parquet(f"{d}/build").filter("k % 997 = 0")
        joined = probe.join(build, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, (
            f"runtime bloom filter not injected:\n{plan[:2000]}"
        )
        assert joined.count() == 201
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_gapfill_grid_from_broadcast_scalar(spark, sf_dir):
    """The dense hour grid must come from the broadcast min/max scalar row
    (grid construction O(output)), and the hourly aggregate must partial-
    aggregate before its shuffle."""
    plan = plan_of(spark, sf_dir, "timeseries_gapfill")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # span, type list, and fill all derive from the materialized hourly
    # aggregate — the fact table is scanned exactly once
    assert plan.count("events.parquet") <= 1


def test_disjunctive_pushdown_reaches_both_scans(spark, sf_dir):
    """Q19-shape OR-of-ANDs: Catalyst must CNF-extract the per-column
    disjunctions and push them into BOTH parquet scans (the quantity bands
    to lineitem, the brand/size bands to part), keeping the cross-table
    residual as a single join condition — never a 3-way union of scans or
    an unfiltered fact scan."""
    plan = plan_of(spark, sf_dir, "disjunctive_pushdown")
    # lineitem scan carries the OR'd quantity envelope
    assert re.search(
        r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_quantity,1\.0\)", plan
    )
    # part scan carries the OR'd brand/size bands (toString truncates the
    # filter list — match the prefix inside the PushedFilters clause)
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(p_brand", plan)
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 2


def test_market_share_posture(spark, sf_dir):
    """Q8 shape: tiny dims broadcast; the ASIA-customer restriction reaches
    the fact as a semi-join (no customer payload duplicated through the
    fact), and the share ratio computes in one aggregate pass (no second
    scan of lineitem for the denominator)."""
    plan = plan_of(spark, sf_dir, "market_share")
    assert "LeftSemi" in plan
    assert plan.count("lineitem.parquet") == 1
    # The three explicit dim broadcasts (supplier⋈nation, customer⋈nation,
    # ⋈region) must survive as broadcast hash joins…
    assert plan.count("BroadcastHashJoin") >= 3
    # …and a dropped broadcast hint shows up as an EXTRA sort-merge join:
    # only the genuinely large fact-side joins may SMJ (an `x or y`
    # disjunct here would pass for any plan with ≥1 BHJ — tautology).
    assert plan.count("SortMergeJoin") <= 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_steps_checkpointed_single_scan(spark, sf_dir):
    """Each funnel step frame is eagerly checkpointed, so the final
    assembly replays one-row-per-user RDDs instead of re-running the
    filtered fact scan per consumer (without this: 6 fact scans)."""
    plan = plan_of(spark, sf_dir, "funnel_conversion")
    assert plan.count("Scan parquet") <= 1


def test_cohort_frames_checkpointed_single_scan(spark, sf_dir):
    """The cohort frame is eagerly checkpointed before joining back to
    events, so the final plan replays the checkpointed RDD instead of
    scanning events.parquet a second time (SCALE.md documents this for
    BOTH funnel and cohort — this is the cohort half of that pin)."""
    plan = plan_of(spark, sf_dir, "cohort_retention")
    assert plan.count("Scan parquet") <= 1


def test_volume_shipping_posture(spark, sf_dir):
    """Q7 shape: both nation dims pre-filter to the 2 candidate names
    BEFORE broadcasting (PushedFilters carries the In(n_name,…)), the
    two-direction OR stays ONE residual filter (never a union of two
    plans), and no join degrades to a nested loop."""
    plan = plan_of(spark, sf_dir, "volume_shipping")
    assert re.search(r"PushedFilters: \[[^\]]*In\(n_name", plan)
    assert "Union" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_promo_stock_suppliers_nested_semi_joins(spark, sf_dir):
    """Q20 shape: the nested IN chain must lower to two stacked semi-joins
    (supplier ⋉ heavy-shippers ⋉ red-parts) — a per-supplier re-execution
    of the subquery would show up as extra scans or a nested loop."""
    plan = plan_of(spark, sf_dir, "promo_stock_suppliers")
    assert plan.count("LeftSemi") == 2
    assert "BroadcastNestedLoopJoin" not in plan
    # supplier + lineitem + part: one scan each
    assert plan.count("Scan parquet") == 3


def test_customer_order_distribution_outer_preserved(spark, sf_dir):
    """Q13 shape: the 2001 filter lives in the JOIN CONDITION, so the
    left-outer join must SURVIVE planning (a WHERE-side filter would let
    Catalyst rewrite it to inner and silently drop the c_count=0
    bucket)."""
    plan = plan_of(spark, sf_dir, "customer_order_distribution")
    assert "LeftOuter" in plan


def test_session_paths_heap_topk(spark, sf_dir):
    """The path report must take its top-20 as a heap, never a global
    sort of the path distribution."""
    plan = plan_of(spark, sf_dir, "session_paths_topk")
    assert "TakeOrderedAndProject" in plan


def test_rfm_windows_never_single_partition(spark, sf_dir):
    """The three ntile windows are PARTITIONED by acquisition cohort — a
    global ntile would appear as an `Exchange SinglePartition` feeding a
    Window, the single-task sort that dies at real user counts."""
    plan = plan_of(spark, sf_dir, "user_rfm_segments")
    # every ntile window carries the cohort partition spec...
    ntile_windows = re.findall(r"Window \[ntile[^\n]*", plan)
    assert len(ntile_windows) == 3
    assert all("cohort_day" in w for w in ntile_windows)
    # ...sharing ONE cohort hash exchange (the sorts chain shuffle-free);
    # the only SinglePartition is the one-row max(ts) scalar broadcast
    assert plan.count("Exchange hashpartitioning(cohort_day") == 1


def test_transition_matrix_single_fact_shuffle(spark, sf_dir):
    """The lag window and the pair rollup must not re-scan events: one
    scan, and the only exchanges are the user_id hash for the window, the
    pair-count agg, and the tiny grid normalization."""
    plan = plan_of(spark, sf_dir, "event_transition_matrix")
    assert plan.count("Scan parquet") == 1


def test_lateral_topk_decorrelates_to_window_rank(spark, sf_dir):
    """LATERAL (…ORDER BY…LIMIT 2) must decorrelate into ONE ranked
    window over customer (partitioned by the correlation key) joined to
    the dim — never a per-nation re-scan (extra Scans) or a nested
    loop."""
    plan = plan_of(spark, sf_dir, "lateral_topk_per_group")
    assert "row_number()" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # nation + customer: one scan each
    assert plan.count("Scan parquet") == 2


def test_recursive_chain_is_native_recursion(spark, sf_dir):
    """WITH RECURSIVE must plan as Spark 4.1's native UnionLoop operator
    (the recursion executes inside the engine), not fall back to some
    driver-side emulation. The loop body's subplan is not printed by
    explain, so scan placement can't be text-asserted — the
    data-proportional work staying outside the loop is covered by the
    recursion operating on the ~28-row aggregated series (row counts
    pinned in the vacuity guard)."""
    plan = plan_of(spark, sf_dir, "recursive_inventory_chain")
    assert "UnionLoop" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sql_udf_inlines_into_plan(spark, sf_dir):
    """SQL UDFs must INLINE: the physical plan is plain column arithmetic
    with a partial/final hash aggregate — no eval operator, no Python
    worker, no serialization boundary. That inlining is what makes a SQL
    function library free at scale, unlike Python UDFs."""
    plan = plan_of(spark, sf_dir, "sql_udf_pricing")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert re.search(r"PushedFilters: \[[^\]]*LessThan\(l_quantity", plan)


def test_pipe_syntax_plans_like_nested_sql(spark, sf_dir):
    """Pipe syntax is pure sugar: the status filter must push to the scan
    and the aggregate must be partial/final — identical physics to the
    nested-SQL restatement."""
    plan = plan_of(spark, sf_dir, "pipe_syntax_rollup")
    assert plan.count("HashAggregate") >= 2
    assert re.search(r"PushedFilters: \[[^\]]*Not\(EqualTo\(o_orderstatus", plan)


def test_outlier_iqr_broadcasts_fences(spark, sf_dir):
    """The 5-row fence table must broadcast back onto the event scan —
    a shuffled join keyed on event_type would move the whole stream for
    a dim of single-digit rows."""
    plan = plan_of(spark, sf_dir, "outlier_iqr_flags")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", ["embedding_quantize_int8", "doc_chunking"])
def test_projection_ops_no_shuffle(spark, sf_dir, name):
    """Per-row projection operators (quantization, chunking) must plan as
    a single scan with zero exchanges — any shuffle here is a bug."""
    plan = plan_of(spark, sf_dir, name)
    assert "Exchange" not in plan


def test_ivfpq_codebook_and_lut_broadcast(spark, sf_dir):
    """IVF-PQ's scale contract in the plan: the codebook reaches the
    encode join and the per-query LUT reaches the ADC join as BROADCAST
    build sides (both are bounded: ≤256 codewords × 8 subspaces, 5 query
    LUT rows), the coarse centroid scoring is a broadcast nested loop,
    and nothing falls back to a shuffled CartesianProduct — the shapes
    that die at 10^9 vectors."""
    plan = plan_of(spark, sf_dir, "ann_ivfpq_topk")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_bpe_encode_vocab_broadcast_single_corpus_agg(spark, sf_dir):
    """The tokenizer-apply trick must be visible in the plan: documents
    resolve token → symbol count through a BROADCAST join of the encoded
    vocabulary (never a sort-merge of the exploded corpus against it),
    and the per-doc rollup is a partial/final hash aggregate — map-side
    combine before the one doc_id shuffle."""
    plan = plan_of(spark, sf_dir, "bpe_encode_corpus")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()


def test_h264_header_parse_map_only(spark, sf_dir):
    """The H.264 surface is pure per-row header triage: one parquet
    scan, two Arrow python stages (synthesize, parse), and NOT ONE
    Exchange or Join — the shape a KB-header pass over a 100 TB media
    column must keep."""
    plan = plan_of(spark, sf_dir, "h264_header_parse")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert len(re.findall(r"ArrowEvalPython|EvalPython|MapInPandas", plan)) == 2


def test_mp4_h264_headers_map_only(spark, sf_dir):
    """The container route keeps the same shape as the bare-avcC
    surface: one parquet scan, three Arrow python stages (synthesize
    container / extract avcC / parse headers — the middle one IS the
    shipped operator), zero Exchange/Join."""
    plan = plan_of(spark, sf_dir, "mp4_h264_headers")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert len(re.findall(r"ArrowEvalPython|EvalPython|MapInPandas", plan)) == 3


def test_approx_sketches_bound_distinct_split_from_sketches(spark, sf_dir):
    """r14: count_distinct must NOT share a groupBy with the
    ObjectHashAggregate-buffered percentile/sketch functions — Spark
    plans a mixed distinct via a (l_returnflag, l_partkey)-keyed first
    aggregation and drags every heavyweight buffer through that ~200k
    group expansion (measured 17 s vs 2.8 s at sf0.1). Pin the split
    shape: the two chains meet in a BroadcastHashJoin on the 3-row
    key, and no aggregate carries a percentile buffer next to a
    partkey grouping key."""
    plan = plan_of(spark, sf_dir, "approx_sketches_bound")
    assert "BroadcastHashJoin" in plan
    # the expanded distinct keying must not carry sketch buffers:
    # no single aggregate line mentions both l_partkey (as a key) and
    # a percentile buffer
    for line in plan.splitlines():
        if "partial_percentile" in line or "partial_approx" in line:
            assert "keys=[l_returnflag" in line and "l_partkey" not in (
                line.split("functions=")[0]
            )
