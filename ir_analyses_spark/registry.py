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
#: Round-7 rotation (VERDICT r6 item 1, rotated at round START per the
#: ledger discipline): 53 queries lacked a current row at the end of r6
#: — 3 that have NEVER had a driver row (the r6 tail-head additions) and
#: 50 whose defining module changed after their newest green row. The
#: window takes the 3 first-row queries at positions 0-2 and the 47
#: oldest/highest-risk stale entries; the 3 spilled to the r8 head are
#: the multimodal trio (`multimodal_features`, `media_resize`,
#: `media_frame_sample`) — the lowest-risk choice: their staleness cause
#: is the r6 ADVICE type-widening of an MP4 column none of the three
#: reads (values provably unchanged), and round 7 freezes
#: ``llm/multimodal.py`` (the round's MP4 extension lives in the new
#: module ``llm/media_mp4.py``) so the documented value-neutrality
#: still holds at round end.
#:
#: Round-7 module freeze: certified modules take ZERO source edits this
#: round; all new capability (ingest CLI, TOML config source, MP4
#: audio/sample-table decode, VACUUM RETAIN HOURS) lands in new files.
#: The only certified-module-adjacent edit is ``io/txn_maint.py``
#: (ADVICE ZORDER grammar + RETAIN HOURS), whose sole dependent query
#: ``txn_maintenance_sql`` sits at window position 2 and gets its first
#: row on the post-edit tree.
_ORDER = [
    # ---- first-row tier (3): never driver-checked (added r6) ----
    "ann_ivfpq_topk",
    "bpe_encode_corpus",
    "txn_maintenance_sql",
    # ---- stale-evidence tier (47): re-certification ----
    # ops/relational.py changed r1+ after these r1 rows (oldest evidence
    # in the ledger)
    "json_extract_ops",
    "pivot_coalesce_priority",
    # ops/macros.py changed r3+ after these r1/r3 rows
    "order_priority_counts",
    "top_unshipped_parts",
    "shipping_priority_topk",
    "returned_item_report",
    # ops/aggregates.py changed r5+ (sql_dsum dedup) after these r3/r5 rows
    "grouping_sets_agg",
    "unpivot_melt",
    "minmax_extremes",
    "rollup_agg",
    "column_profile",
    "distinct_agg",
    "pivot_agg",
    "dedup_by_key",
    "latest_per_group",
    "exact_median",
    # ops/windows.py changed r5+ (sessionize value fix) after these rows
    "window_range_interval",
    "window_ranking",
    "window_lag_lead",
    "window_running_frames",
    # llm/textstats.py changed r3+ after these r3 rows
    "corpus_clean_pipeline",
    "repetition_metrics",
    "corpus_mixture",
    "bpe_pair_counts",
    "doc_frequency",
    "pii_scrub",
    # streaming/pipeline.py changed r3+ after the r3 row
    "stream_sliding_batch",
    # rows-only-by-design sketch/LSH entries (module changed r5+): the
    # driver re-records their rows-only evidence on the current tree
    "approx_sketches",
    "hll_mergeable_rollup",
    "ann_ml_brp_lsh",
    # io/txn.py took the r6 history() fix after these r5 rows
    "txn_snapshot_merge",
    "txn_exactly_once_rollup",
    "txn_time_travel",
    # llm/similarity.py took r5/r6 review cleanups after these r5 rows
    "kmeans_assign",
    "semantic_dedup",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_nearup",
    # ops/subqueries.py changed r5+ (Q17 fix) after these r5 rows
    "cheapest_supplier_per_part",
    "idle_customer_balances",
    "suppliers_with_waiting_orders",
    "concentrated_part_types",
    # llm/dedup.py changed r5+ after the r5 row
    "containment_nearup",
    # llm/sampling.py changed r5+ (shuffle elimination) after these r3 rows
    "sequence_packing",
    "benchmark_decontaminate",
    "stratified_sample",
    # ---- 50-query window boundary (driver budget) ----
    # tail head = round-8's window head: the 3 documented value-neutral
    # spills (see rotation note above)
    "multimodal_features",
    "media_resize",
    "media_frame_sample",
    # r6-green (certified by CORRECTNESS_r06 on the final r6 tree;
    # modules frozen in r7)
    "lateral_topk_per_group",
    "recursive_inventory_chain",
    "top_supplier_revenue",
    "supplier_part_variety",
    "large_volume_customers",
    "promo_stock_suppliers",
    "sql_udf_pricing",
    "pipe_syntax_rollup",
    "collated_string_ops",
    "pivot_sql_clause",
    "promo_revenue_ratio",
    "forecast_revenue_change",
    "volume_shipping",
    "late_shipment_priority",
    "customer_order_distribution",
    "outlier_iqr_flags",
    "ewma_forecast",
    "trade_pagerank",
    "trade_triangles",
    "trade_bfs_hops",
    "funnel_conversion",
    "cohort_retention",
    "event_transition_matrix",
    "session_paths_topk",
    "user_rfm_segments",
    "fuzzy_name_pairs",
    "token_topk_sketch",
    "bpe_train_merges",
    "doc_chunking",
    "token_length_histogram",
    "embedding_quantize_int8",
    "dataset_split",
    "txn_change_feed",
    "txn_change_apply",
    "txn_history",
    "txn_pyds_write",
    "stream_txn_sink",
    "exact_dedup",
    "minhash_lsh_nearup",
    "simhash_nearup",
    "dedup_components",
    "neardup_dedup_pipeline",
    "ngram_jaccard_nearup",
    "pricing_summary",
    "regional_revenue",
    "window_sessionize",
    "timeseries_gapfill",
    "cube_agg",
    "small_quantity_revenue",
    "media_codec_features",
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
    "text_stats",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "vocab_oov_rate",
    "negative_sampling",
    "pandas_udf_vectorized",
    "market_share",
    "product_profit",
    "disjunctive_pushdown",
    "tfidf_top_terms",
    # r1/r2/r3-green, modules unchanged since their rows
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
    "variant_json_ops",
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
