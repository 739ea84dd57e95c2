"""Central query registry: merges every module's (queries, oracles) pair.

``__spark_entry__.py`` (the driver contract) is a thin shim over this module.
Each ops/queries/llm/streaming module exports

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-runnable ANSI SQL twins; a query
  without an oracle entry gets the driver's weaker rows-only check (reserved
  for genuinely non-SQL-expressible ops: sketches, LSH, streaming state).

Names must be globally unique; the merge asserts it.
"""
# (registry count r9: 169 — the 2 winnowing substring-dedup queries
# live in the new module llm/substring_queries.py and the quantized
# classifier gate in llm/clf_gate.py, per the new-ops-in-new-modules
# ledger rule)

from __future__ import annotations

from collections.abc import Callable
from functools import cache

from pyspark.sql import DataFrame, SparkSession

from .io import txn_queries
from .llm import (
    clf_gate,
    curation_queries,
    dedup,
    mixture,
    multimodal,
    pq,
    sampling,
    similarity,
    substring_queries,
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
    substring_queries,
    clf_gate,
    streaming_pipeline,
    ir_demo,
    txn_queries,
]

#: Explicit registry order. The driver's correctness sweep has a bounded
#: budget (each round records rows for exactly the first 50 registry
#: entries), so ordering is part of the verification contract.
#:
#: Round-9 rotation (VERDICT r8 "Next round" items 1, 2, 5, rotated at
#: round START per the ledger discipline). Registry grows 166 -> 169:
#: the winnowing substring-dedup pair (``llm/substring_queries.py``)
#: and the quantized classifier gate (``llm/clf_gate.py``). Window
#: composition (50): the 6 tail-head queries the r8 VERDICT queued
#: (mixture pair — first driver rows — plus the 4 legacy r3 rows) + 3
#: new queries + 2 llm/training.py re-certs + 14 curation re-certs +
#: the 20 oldest remaining rows (r5 evidence) + 5 headline r6 rows.
#: The 39 remaining r6 rows lead the tail as round-10's window head.
#:
#: Round-9 module edits staling certified rows (all re-certified in
#: this window): llm/training.py + llm/export.py (split cell
#: pre-reduces doc_id mod 100 before the KNUTH multiply, r8 ADVICE —
#: stales dataset_split, negative_sampling, training_export_layout,
#: and the mixture pair via the whitespace_token_count/_KNUTH imports),
#: llm/curation_queries.py (its TRAINING_EXPORT_SQL oracle carries the
#: same fix — stales all 14 of the module's queries), io/warc.py
#: (repeated-header merge — stales warc_roundtrip_parse and
#: curation_funnel_counts), llm/curate.py (optional substring-dedup
#: funnel stage), and vendor/pbshim (wire-type validation — covered by
#: stateful_user_totals' tws path among the r5 re-certs).
_ORDER = [
    # ---- r9 window (50): see rotation note above ----
    # mixture pair: FIRST driver rows (r8 tail head, oracles hardened
    # this round: IS NOT DISTINCT FROM join)
    "temperature_mixture_sample",
    "token_budget_subset",
    # the 4 legacy rows that did not fit the r8 window (latest evidence
    # r3; modules unchanged since)
    "apply_in_pandas_topk",
    "salted_twophase_agg",
    "salted_skew_join",
    "variant_json_ops",
    # NEW: winnowing substring-dedup surface (llm/substring_queries.py,
    # portable polynomial k-gram hash) and the quantized classifier
    # gate (llm/clf_gate.py) — r8 VERDICT items 2 and 5
    "winnow_fingerprints_select",
    "substring_dedup_rebuild",
    "quality_classifier_gate",
    # llm/training.py re-certs: split cell pre-reduces doc_id mod 100
    # before the KNUTH multiply (r8 ADVICE)
    "dataset_split",
    "negative_sampling",
    # llm/curation_queries.py re-certs: the module's oracle constant
    # TRAINING_EXPORT_SQL changed (same pre-reduction), io/warc.py
    # gained the repeated-header merge (stales warc_roundtrip_parse +
    # curation_funnel_counts via llm/curate.py), and llm/curate.py
    # gains the substring-dedup funnel stage this round — the
    # module-granular staleness rule re-certifies all 14
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
    # oldest remaining evidence (r5 rows) — refreshed while the window
    # has room; stateful_user_totals also covers the vendored pbshim's
    # new wire-type validation on the tws path
    "disjunctive_pushdown",
    "doc_fingerprint",
    "guarded_ratio_margin",
    "ir_summary_pipeline",
    "language_id",
    "market_share",
    "pandas_udf_vectorized",
    "product_profit",
    "quality_score",
    "stateful_user_totals",
    "stream_dedup_watermark",
    "stream_incremental_rollup",
    "stream_session_batch",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "stream_tumbling_batch",
    "summary_chart_frame",
    "text_stats",
    "tfidf_top_terms",
    "vocab_oov_rate",
    # 5 of the r6 rows: the headline bench set first (the rest of the
    # r6 vintage leads the tail as round-10's window head)
    "exact_dedup",
    "minhash_lsh_nearup",
    "pricing_summary",
    "regional_revenue",
    "window_sessionize",
    # ---- 50-query window boundary (driver budget) ----
    # tail head = round-10's window head: the 39 remaining r6 rows
    # (oldest evidence after this round), then r7, then r8 (freshest)
    "bpe_train_merges",
    "cohort_retention",
    "collated_string_ops",
    "cube_agg",
    "customer_order_distribution",
    "dedup_components",
    "doc_chunking",
    "embedding_quantize_int8",
    "event_transition_matrix",
    "ewma_forecast",
    "forecast_revenue_change",
    "funnel_conversion",
    "fuzzy_name_pairs",
    "large_volume_customers",
    "late_shipment_priority",
    "lateral_topk_per_group",
    "media_codec_features",
    "neardup_dedup_pipeline",
    "ngram_jaccard_nearup",
    "outlier_iqr_flags",
    "pipe_syntax_rollup",
    "pivot_sql_clause",
    "promo_revenue_ratio",
    "promo_stock_suppliers",
    "recursive_inventory_chain",
    "session_paths_topk",
    "simhash_nearup",
    "small_quantity_revenue",
    "sql_udf_pricing",
    "supplier_part_variety",
    "timeseries_gapfill",
    "token_length_histogram",
    "token_topk_sketch",
    "top_supplier_revenue",
    "trade_bfs_hops",
    "trade_pagerank",
    "trade_triangles",
    "user_rfm_segments",
    "volume_shipping",
    "ann_brute_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "ann_ml_brp_lsh",
    "approx_sketches",
    "benchmark_decontaminate",
    "bpe_encode_corpus",
    "bpe_pair_counts",
    "cheapest_supplier_per_part",
    "column_profile",
    "concentrated_part_types",
    "containment_nearup",
    "corpus_clean_pipeline",
    "corpus_mixture",
    "dedup_by_key",
    "distinct_agg",
    "doc_frequency",
    "embedding_cosine_nearup",
    "exact_median",
    "grouping_sets_agg",
    "hll_mergeable_rollup",
    "idle_customer_balances",
    "json_extract_ops",
    "kmeans_assign",
    "latest_per_group",
    "minmax_extremes",
    "order_priority_counts",
    "pii_scrub",
    "pivot_agg",
    "pivot_coalesce_priority",
    "repetition_metrics",
    "returned_item_report",
    "rollup_agg",
    "semantic_dedup",
    "sequence_packing",
    "shipping_priority_topk",
    "stratified_sample",
    "stream_sliding_batch",
    "suppliers_with_waiting_orders",
    "top_unshipped_parts",
    "unpivot_melt",
    "window_lag_lead",
    "window_range_interval",
    "window_ranking",
    "window_running_frames",
    "array_agg_ops",
    "case_conditional",
    "date_functions",
    "explode_tokens",
    "filter_pushdown_project",
    "join_asof",
    "join_broadcast_dims",
    "join_full_outer",
    "join_left_outer",
    "join_multiway_topk",
    "join_range_window",
    "join_semi_anti",
    "join_theta_bands",
    "map_ops",
    "math_functions",
    "media_frame_sample",
    "media_resize",
    "multimodal_features",
    "null_semantics",
    "pandas_grouped_agg_udf",
    "python_udtf_expand",
    "regexp_extract_ops",
    "set_operations",
    "stream_txn_sink",
    "string_functions",
    "string_predicates",
    "txn_change_apply",
    "txn_change_feed",
    "txn_exactly_once_rollup",
    "txn_history",
    "txn_maintenance_sql",
    "txn_pyds_write",
    "txn_snapshot_merge",
    "txn_time_travel",
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
