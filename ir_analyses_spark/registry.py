"""Central query registry: merges every module's (queries, oracles) pair.

``__spark_entry__.py`` (the driver contract) is a thin shim over this module.
Each ops/queries/llm/streaming module exports

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-runnable ANSI SQL twins; a query
  without an oracle entry gets the driver's weaker rows-only check (reserved
  for genuinely non-SQL-expressible ops: sketches, LSH, streaming state).

Names must be globally unique; the merge asserts it.
"""
# (registry count r6: 150 — ann_ivfpq_topk and bpe_encode_corpus live in
# their own modules llm/pq.py and llm/tokenize.py so no certified query's
# module changed; txn_maintenance_sql joins io/txn_queries.py, whose
# queries are ALL in the r6 window and re-certify this round anyway)

from __future__ import annotations

from collections.abc import Callable
from functools import cache

from pyspark.sql import DataFrame, SparkSession

from .io import txn_queries
from .llm import (
    dedup,
    multimodal,
    pq,
    sampling,
    similarity,
    textstats,
    tokenize,
    training,
)
from .ops import (
    aggregates,
    collections,
    events,
    fuzzy,
    graph,
    joins,
    macros,
    relational,
    skew,
    sqlfn,
    subqueries,
    udfs,
    windows,
)
from .queries import ir_demo
from .streaming import pipeline as streaming_pipeline

_MODULES = [
    aggregates,
    events,
    joins,
    relational,
    subqueries,
    windows,
    collections,
    macros,
    skew,
    sqlfn,
    udfs,
    fuzzy,
    graph,
    dedup,
    similarity,
    pq,
    textstats,
    tokenize,
    sampling,
    training,
    multimodal,
    streaming_pipeline,
    ir_demo,
    txn_queries,
]

#: Explicit registry order. The driver's correctness sweep has a bounded
#: budget (each round records rows for exactly the first 50 registry
#: entries), so ordering is part of the verification contract.
#:
#: Round-6 rotation — the CERTIFICATION round VERDICT r4 item 1 called
#: for (round 5 was cut short before it could rotate, so its window
#: re-certified the r4 head instead):
#:
#: - Positions 0–36: every query that has NEVER had a driver row — the
#:   r4 tail additions (TPC-H closure shapes, SQL-surface block, graph
#:   tier, events analytics, txn consumer/metadata/DataSource tier, the
#:   new LLM/analytics ops). Until now their only evidence was the
#:   in-repo 147-query DuckDB sweep + bare-session sf0.01 replays.
#: - Positions 37–49: the 13 highest-risk STALE entries (defining module
#:   changed after their last green row): all six ``llm/dedup.py``
#:   queries (the module took a semantic change in r5 — the LSH-vs-exact
#:   edge gate for the chained-dedup oracles — so their r3 rows certify
#:   retired code), ``pricing_summary`` (flagship TPC-H Q1; r3 row,
#:   ``ops/aggregates.py`` changed in r4), ``regional_revenue`` (bench
#:   headline; r1 row!, ``ops/macros.py`` changed r3+r4),
#:   ``window_sessionize``/``timeseries_gapfill`` (r3 rows,
#:   ``ops/windows.py`` changed in r4), ``cube_agg`` (same),
#:   ``json_extract_ops`` (r1 row, ``ops/relational.py`` changed since),
#:   and ``media_codec_features`` (r5-green but ``llm/multimodal.py``
#:   takes the ADVICE r5 fix this round: mvhd n_samples int→bigint — a
#:   schema change, so the r5 row cannot certify it).
#: - The tail leads with the next-rotation stale set (r7's window head),
#:   then entries whose newest green row is not older than their
#:   defining module's last change.
_ORDER = [
    # ---- never-driver-checked tier (37): first rows ----
    # ops/subqueries.py: TPC-H Q2/Q22-style pair siblings + closure shapes
    "lateral_topk_per_group",
    "recursive_inventory_chain",
    "top_supplier_revenue",
    "supplier_part_variety",
    "large_volume_customers",
    "promo_stock_suppliers",
    # ops/sqlfn.py: SQL-surface block
    "sql_udf_pricing",
    "pipe_syntax_rollup",
    "collated_string_ops",
    "pivot_sql_clause",
    # ops/macros.py: remaining TPC-H shapes
    "promo_revenue_ratio",
    "forecast_revenue_change",
    "volume_shipping",
    "late_shipment_priority",
    "customer_order_distribution",
    # ops/aggregates.py + ops/windows.py additions
    "outlier_iqr_flags",
    "ewma_forecast",
    # ops/graph.py: iterative-graph tier
    "trade_pagerank",
    "trade_triangles",
    "trade_bfs_hops",
    # ops/events.py: product-analytics tier
    "funnel_conversion",
    "cohort_retention",
    "event_transition_matrix",
    "session_paths_topk",
    "user_rfm_segments",
    # ops/fuzzy.py / llm additions
    "fuzzy_name_pairs",
    "token_topk_sketch",
    "bpe_train_merges",
    "doc_chunking",
    "token_length_histogram",
    "embedding_quantize_int8",
    "dataset_split",
    # io/txn_queries.py: txn consumer/metadata/DataSource tier
    "txn_change_feed",
    "txn_change_apply",
    "txn_history",
    "txn_pyds_write",
    "stream_txn_sink",
    # ---- stale-evidence tier (13): re-certification ----
    # llm/dedup.py changed in r4 AND r5 (LSH-vs-exact edge gate) after
    # these queries' r3 rows
    "exact_dedup",
    "minhash_lsh_nearup",
    "simhash_nearup",
    "dedup_components",
    "neardup_dedup_pipeline",
    "ngram_jaccard_nearup",
    # flagship TPC-H Q1 (r3 row; ops/aggregates.py changed in r4)
    "pricing_summary",
    # bench headline (r1 row; ops/macros.py changed in r3+r4)
    "regional_revenue",
    # ops/windows.py changed in r4 after these r3 rows
    "window_sessionize",
    "timeseries_gapfill",
    # ops/aggregates.py changed in r4 after the r3 row
    "cube_agg",
    # r6 review fix CHANGED ITS VALUES (the Q17 correlated predicate was
    # an inner-scope tautology — both engine and oracle computed the
    # global average; now truly correlated on p_partkey): its r5 row
    # certifies retired semantics, so it takes the window slot
    # json_extract_ops held (r1-green, unchanged values, to the tail head)
    "small_quantity_revenue",
    # llm/multimodal.py takes the r5 ADVICE schema fix this round
    "media_codec_features",
    # ---- 50-query window boundary (driver budget) ----
    # tail head: new in r6 (first row due in r7 — lives in its OWN module
    # llm/pq.py precisely so adding it does not stale similarity.py's
    # r5-green rows), then the remaining stale set = round-7's window head
    "ann_ivfpq_topk",
    "bpe_encode_corpus",
    "txn_maintenance_sql",
    # displaced from the window by the Q17 value fix: r1-green with
    # unchanged values — next rotation re-greens it
    "json_extract_ops",
    "pivot_coalesce_priority",
    "order_priority_counts",
    "top_unshipped_parts",
    "shipping_priority_topk",
    "returned_item_report",
    "grouping_sets_agg",
    "unpivot_melt",
    "minmax_extremes",
    "window_range_interval",
    "corpus_clean_pipeline",
    "repetition_metrics",
    "corpus_mixture",
    "bpe_pair_counts",
    "doc_frequency",
    "pii_scrub",
    "stream_sliding_batch",
    "approx_sketches",  # rows-only by design (error-bound test in-repo)
    "hll_mergeable_rollup",  # rows-only by design
    "ann_ml_brp_lsh",  # rows-only by design (recall-bounded vs exact twin)
    # multimodal siblings of the in-window codec query: same module takes
    # the r6 ADVICE fix, but their values are provably untouched by it
    # (the fix widens the MP4 n_samples column type and guards a fixture
    # encoder; these three never read that column) — documented stale
    "multimodal_features",
    "media_resize",
    "media_frame_sample",
    # io/txn.py takes the r6 ADVICE history() fix; txn_history is in the
    # window, these r5-green siblings don't read history() — documented
    "txn_snapshot_merge",
    "txn_exactly_once_rollup",
    "txn_time_travel",
    # r5-green, modules unchanged since
    "ir_summary_pipeline",
    "summary_chart_frame",
    "guarded_ratio_margin",
    "stream_incremental_rollup",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "stream_tumbling_batch",
    "stream_session_batch",
    "stateful_user_totals",
    "stream_dedup_watermark",
    "kmeans_assign",
    "semantic_dedup",
    "cheapest_supplier_per_part",
    "idle_customer_balances",
    "suppliers_with_waiting_orders",
    "concentrated_part_types",
    "text_stats",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_nearup",
    "vocab_oov_rate",
    "negative_sampling",
    "rollup_agg",
    "column_profile",
    "distinct_agg",
    "pivot_agg",
    "dedup_by_key",
    "latest_per_group",
    "exact_median",
    "window_ranking",
    "window_lag_lead",
    "window_running_frames",
    "pandas_udf_vectorized",
    "market_share",
    "product_profit",
    "disjunctive_pushdown",
    "containment_nearup",
    "tfidf_top_terms",
    # r1/r2-green, modules unchanged since their rows
    "string_predicates",
    "string_functions",
    "null_semantics",
    "regexp_extract_ops",
    "date_functions",
    "math_functions",
    "join_broadcast_dims",
    "join_multiway_topk",
    "set_operations",
    "map_ops",
    "explode_tokens",
    "join_left_outer",
    "join_semi_anti",
    "join_theta_bands",
    "join_range_window",
    "join_asof",
    "join_full_outer",
    "filter_pushdown_project",
    "array_agg_ops",
    "case_conditional",
    "python_udtf_expand",
    "pandas_grouped_agg_udf",
    "apply_in_pandas_topk",
    "salted_twophase_agg",
    "salted_skew_join",
    "sequence_packing",
    "variant_json_ops",
    "benchmark_decontaminate",
    "stratified_sample",
]


def _with_engine_conf(fn: Callable) -> Callable:
    """Queries must behave identically on ANY session the caller supplies
    (the driver harness builds its own); retrofit the engine's runtime SQL
    confs before the plan is constructed."""
    from functools import wraps

    from .session import ensure_engine_conf

    @wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(ensure_engine_conf(spark), sf_dir)

    return wrapped


@cache
def _merge() -> tuple[dict[str, Callable], dict[str, str]]:
    # invariants raise REAL exceptions, never assert: under ``python -O``
    # a stripped assert would let an unlisted query silently drop out of
    # the verification sweep, or a duplicate name silently overwrite
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise RuntimeError(f"duplicate query name: {name}")
            queries[name] = _with_engine_conf(fn)
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in mod.QUERIES:
                raise RuntimeError(f"oracle without query: {name}")
            oracles[name] = sql
    # _ORDER is the verification contract: every registered query must have
    # an explicit position, and vice versa (tested in test_oracle_parity).
    if set(_ORDER) != set(queries):
        raise RuntimeError(
            f"registry order out of sync: "
            f"missing={set(queries) - set(_ORDER)} stale={set(_ORDER) - set(queries)}"
        )
    queries = {name: queries[name] for name in _ORDER}
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # defensive copy: _merge() is @cache'd, so handing out the cached dict
    # would let one caller's mutation (a test monkeypatching an entry)
    # silently corrupt the registry for every later caller
    return dict(_merge()[0])


def all_oracles() -> dict[str, str]:
    return dict(_merge()[1])
