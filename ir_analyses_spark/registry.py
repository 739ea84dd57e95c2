"""Central query registry: merges every module's (queries, oracles) pair.

``__spark_entry__.py`` (the driver contract) is a thin shim over this module.
Each ops/queries/llm/streaming module exports

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-runnable ANSI SQL twins; a query
  without an oracle entry gets the driver's weaker rows-only check (reserved
  for genuinely non-SQL-expressible ops: sketches, LSH, streaming state).

Names must be globally unique; the merge asserts it.
"""
# (registry count r8: 166 — the r7 freeze at 150 is lifted per the r7
# VERDICT; the 14 curation additions live in the new module
# llm/curation_queries.py and the 2 mixture additions (tail head, r9's
# window head) in llm/mixture.py, so no certified query's module
# changed)

from __future__ import annotations

from collections.abc import Callable
from functools import cache

from pyspark.sql import DataFrame, SparkSession

from .io import txn_queries
from .llm import (
    curation_queries,
    dedup,
    mixture,
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
    curation_queries,
    mixture,
    streaming_pipeline,
    ir_demo,
    txn_queries,
]

#: Explicit registry order. The driver's correctness sweep has a bounded
#: budget (each round records rows for exactly the first 50 registry
#: entries), so ordering is part of the verification contract.
#:
#: Round-8 rotation (VERDICT r7 "Next round" items 1-3, rotated at
#: round START per the ledger discipline). The freeze is LIFTED:
#: registry grows 150 -> 164 with the crawl-curation surface
#: (``llm/curation_queries.py`` — first driver rows for the round-7
#: modules io/warc, llm/html_extract, llm/quality_rules, llm/url_ops,
#: llm/robots, llm/textnorm, llm/linedup, llm/lm_score, llm/curate,
#: llm/export). Window composition (50): 3 multimodal spills (the
#: r7-documented value-neutral staleness, positions 0-2) + 14 new
#: curation queries + 9 txn re-certs (io/txn.py gained the
#: keep_from_version vacuum floor and the gap-boundary history()
#: message; io/txn_maint.py RETAIN HOURS now passes the floor — r7
#: VERDICT item 2) + 2 llm/training.py re-certs (dataset_split's split
#: cell switched to pmod, r7 ADVICE; negative_sampling stales with its
#: module) + the 22 oldest remaining rows (r1-r3 evidence). The 4
#: legacy rows that did not fit lead the tail for the r9 window.
#:
#: Round-8 module edits staling certified rows: io/txn.py,
#: io/txn_maint.py (both re-certified in this window), llm/training.py
#: (both queries in this window). The r8 curation fixes (robots
#: wildcard reduction, WARC body transfer-decoding, linedup adaptive
#: anti-join, CharLM unpersist, export pmod) all land BEFORE these
#: queries' first driver rows, so the rows certify the fixed tree.
_ORDER = [
    # ---- r8 window (50): see rotation note above ----
    # multimodal trio: the r7-documented value-neutral spills (first rows
    # on the current tree close the ledger's last staleness)
    "multimodal_features",
    "media_resize",
    "media_frame_sample",
    # crawl-curation surface (llm/curation_queries.py): FIRST driver
    # rows for the round-7 modules (r7 VERDICT item 1)
    "warc_roundtrip_parse",
    "html_extract_text",
    "quality_signals",
    "gopher_quality_flags",
    "url_canonicalize",
    "url_domain_caps",
    "robots_wildcard_rules",
    "unicode_clean_text",
    "line_dedup_global",
    "span_dedup_c4",
    "charlm_gram_counts",
    "charlm_scoring_stats",
    "curation_funnel_counts",
    "training_export_layout",
    # txn family: io/txn.py keep_from_version floor + history() message
    # and io/txn_maint.py RETAIN HOURS floor landed r8 -> re-certify
    "txn_snapshot_merge",
    "txn_exactly_once_rollup",
    "txn_time_travel",
    "txn_change_feed",
    "txn_change_apply",
    "txn_history",
    "txn_pyds_write",
    "stream_txn_sink",
    "txn_maintenance_sql",
    # llm/training.py dataset_split switched to pmod (r7 ADVICE) -> both
    # of the module's queries re-certify
    "dataset_split",
    "negative_sampling",
    # oldest remaining evidence (r1-r3 rows, modules unchanged since):
    # refreshed while the window has room
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
    # ---- 50-query window boundary (driver budget) ----
    # tail head = round-9's window head: first the r8 tail additions
    # (never driver-checked; differential-verified bare-session in-repo
    # this round — see COVERAGE.md), then the 4 legacy rows that did
    # not fit the r8 window
    "temperature_mixture_sample",
    "token_budget_subset",
    "apply_in_pandas_topk",
    "salted_twophase_agg",
    "salted_skew_join",
    "variant_json_ops",
    # r5/r6-green (modules unchanged since their rows)
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
    "pandas_udf_vectorized",
    "market_share",
    "product_profit",
    "disjunctive_pushdown",
    "tfidf_top_terms",
    # r7-green (certified by CORRECTNESS_r07 on the final r7 tree;
    # freshest evidence in the ledger)
    "ann_ivfpq_topk",
    "bpe_encode_corpus",
    "json_extract_ops",
    "pivot_coalesce_priority",
    "order_priority_counts",
    "top_unshipped_parts",
    "shipping_priority_topk",
    "returned_item_report",
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
    "window_range_interval",
    "window_ranking",
    "window_lag_lead",
    "window_running_frames",
    "corpus_clean_pipeline",
    "repetition_metrics",
    "corpus_mixture",
    "bpe_pair_counts",
    "doc_frequency",
    "pii_scrub",
    "stream_sliding_batch",
    "approx_sketches",
    "hll_mergeable_rollup",
    "ann_ml_brp_lsh",
    "kmeans_assign",
    "semantic_dedup",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_nearup",
    "cheapest_supplier_per_part",
    "idle_customer_balances",
    "suppliers_with_waiting_orders",
    "concentrated_part_types",
    "containment_nearup",
    "sequence_packing",
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
