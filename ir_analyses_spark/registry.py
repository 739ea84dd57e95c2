"""Central query registry: merges every module's (queries, oracles) pair.

``__spark_entry__.py`` (the driver contract) is a thin shim over this module.
Each ops/queries/llm/streaming module exports

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-runnable ANSI SQL twins; a query
  without an oracle entry gets the driver's weaker rows-only check (reserved
  for genuinely non-SQL-expressible ops: sketches, LSH, streaming state).

Names must be globally unique; the merge asserts it.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import cache

from pyspark.sql import DataFrame, SparkSession

from .io import txn_queries
from .llm import dedup, multimodal, sampling, similarity, textstats, training
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
    textstats,
    sampling,
    training,
    multimodal,
    streaming_pipeline,
    ir_demo,
    txn_queries,
]

#: Explicit registry order. The driver's correctness sweep has a bounded
#: budget (each round records rows for exactly the first 50 registry
#: entries), so ordering is part of the verification contract. Round-4
#: rotation, per VERDICT.md r3 item 1 — "no green row older than the code
#: it certifies":
#:
#: - Positions 0–49 lead with the flagship + the queries new this round
#:   (``summary_chart_frame``; the txn-format pair; ``kmeans_assign`` /
#:   ``semantic_dedup``; the Q2/Q22 subquery pair — and, since
#:   ``ops/subqueries.py`` changed when the pair was added, its three
#:   r3-green entries re-certify too), then the queries whose defining
#:   modules changed during r4 (``llm/multimodal.py``: PNG + JPEG codecs
#:   + 4-way synthesizer split; ``queries/summary.py``:
#:   ``guarded_ratio_margin`` + max_by tiebreak; ``streaming/pipeline.py``
#:   + ``io/sinks.py``: committed-marker sinks + txn twins —
#:   conservatively ALL streaming-module queries), then the 22
#:   stale-evidence queries VERDICT r3 listed (modules changed in r3
#:   after their last r1/r2 green row: textstats, similarity, aggregates,
#:   windows, udfs), then session-2 first-row queries (macro Q8/Q9/Q19,
#:   containment, TF-IDF, txn time travel) — these displaced the six
#:   unchanged-code r1/r2-green backfill entries, whose existing evidence
#:   is not older than their code and therefore loses nothing by waiting
#:   in the tail.
#: - The tail holds entries hash-green in r3 (or earlier) whose defining
#:   modules are unchanged since their last green row.
_ORDER = [
    # -- flagship every round; its module changed in r4 --
    "ir_summary_pipeline",
    "summary_chart_frame",  # new in r4: UI chart-frame reshape (O3)
    "guarded_ratio_margin",  # queries/summary.py changed in r4
    # -- multimodal module changed in r4 (PNG codec, %3 synthesizer) --
    "media_codec_features",
    "multimodal_features",
    "media_resize",
    "media_frame_sample",
    # -- streaming/sinks modules changed in r4 (committed-marker sinks) --
    "stream_incremental_rollup",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "stream_tumbling_batch",
    "stream_session_batch",
    "stateful_user_totals",
    "stream_dedup_watermark",
    # -- new in r4: transaction-log table format (io/txn.py) --
    "txn_snapshot_merge",
    "txn_exactly_once_rollup",
    # -- new in r4: clustering + semantic dedup (llm/similarity.py) --
    "kmeans_assign",
    "semantic_dedup",
    # -- ops/subqueries.py changed in r4 (Q2/Q22 added): re-certify its
    #    r3-green entries + first rows for the new pair --
    "cheapest_supplier_per_part",
    "idle_customer_balances",
    "small_quantity_revenue",
    "suppliers_with_waiting_orders",
    "concentrated_part_types",
    # -- VERDICT r3 stale-evidence list: modules changed in r3 after the
    #    last green driver row (llm/textstats.py) --
    "text_stats",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    # (llm/similarity.py)
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_nearup",
    # -- semantics changed in r4 session 3 (review fixes): the old values
    #    were never driver-certified, the new ones must be --
    "vocab_oov_rate",  # top-16 cut replaced the vacuous top-1000
    "negative_sampling",  # self-draw redraw replaced the skip
    # (ops/aggregates.py)
    "rollup_agg",
    "column_profile",  # new in r4 (same module: fresh driver row)
    "distinct_agg",
    "pivot_agg",
    "dedup_by_key",
    "latest_per_group",
    "exact_median",
    # (ops/windows.py)
    "window_ranking",
    "window_lag_lead",
    "window_running_frames",
    # (ops/udfs.py)
    "pandas_udf_vectorized",
    # -- new in r4 session 2: first driver rows beat re-greening unchanged
    #    r1/r2-green code (those keep valid evidence and move to the tail) --
    "market_share",
    "product_profit",
    "disjunctive_pushdown",
    "containment_nearup",
    "tfidf_top_terms",
    "txn_time_travel",
    # ---- 50-query window boundary (driver budget) ----
    # tail: first the r4-new queries without driver rows yet (in-repo
    # parity is their evidence until the next rotation; a budget overrun
    # hits them first), then displaced-but-green r3 rows, then r1/r2-green
    # entries whose code is unchanged since their row
    # session 4: SQL-surface closure (LATERAL, native WITH RECURSIVE,
    # SQL-defined scalar/table functions, pipe syntax, collated strings,
    # SQL PIVOT), the approx_top_k heavy-hitters sketch, and the txn
    # format's consumer/metadata/DataSource tier (change-feed apply,
    # DESCRIBE HISTORY, Python-DataSource batch write + streaming sink) —
    # all oracle-gated with bare-session runs recorded in COVERAGE.md;
    # they enter the driver window next rotation
    "lateral_topk_per_group",
    "recursive_inventory_chain",
    "token_topk_sketch",
    "bpe_train_merges",
    "ewma_forecast",
    "outlier_iqr_flags",
    "embedding_quantize_int8",
    "doc_chunking",
    "trade_triangles",
    "trade_bfs_hops",
    "txn_change_apply",
    "txn_history",
    "sql_udf_pricing",
    "pipe_syntax_rollup",
    "collated_string_ops",
    "pivot_sql_clause",
    "txn_pyds_write",
    "stream_txn_sink",
    "promo_revenue_ratio",
    "token_length_histogram",
    # session 3: the remaining TPC-H shapes — with these, all 22 TPC-H
    # query shapes have an adapted, oracle-gated twin
    "forecast_revenue_change",
    "volume_shipping",
    "late_shipment_priority",
    "customer_order_distribution",
    "top_supplier_revenue",
    "supplier_part_variety",
    "large_volume_customers",
    "promo_stock_suppliers",
    # session 3: change feed over the txn format
    "txn_change_feed",
    # session 3: product-analytics + iterative-graph tier
    "event_transition_matrix",
    "session_paths_topk",
    "user_rfm_segments",
    "trade_pagerank",
    "funnel_conversion",
    "cohort_retention",
    "fuzzy_name_pairs",
    "dataset_split",
    # displaced from the window in session 3 (both keep green r3 rows or
    # better in-repo evidence): rows-only approx_sketches, and the sliding
    # twin of the in-window tumbling agg
    "stream_sliding_batch",
    "approx_sketches",  # rows-only by design (error-bound test in-repo)
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
    "json_extract_ops",
    "pivot_coalesce_priority",
    "regional_revenue",
    "order_priority_counts",
    "top_unshipped_parts",
    "join_left_outer",
    "join_semi_anti",
    "join_theta_bands",
    "join_range_window",
    "join_asof",
    "join_full_outer",
    "filter_pushdown_project",
    "array_agg_ops",
    "case_conditional",
    "cube_agg",
    "grouping_sets_agg",
    "unpivot_melt",
    "minmax_extremes",
    "window_range_interval",
    "window_sessionize",
    "timeseries_gapfill",
    "python_udtf_expand",
    "pandas_grouped_agg_udf",
    "apply_in_pandas_topk",
    "salted_twophase_agg",
    "salted_skew_join",
    "pricing_summary",
    "exact_dedup",
    "minhash_lsh_nearup",
    "simhash_nearup",
    "dedup_components",
    "neardup_dedup_pipeline",
    "corpus_clean_pipeline",
    "ngram_jaccard_nearup",  # deliberately-quadratic exact verifier
    "repetition_metrics",
    "corpus_mixture",
    "bpe_pair_counts",
    "doc_frequency",
    "pii_scrub",
    "sequence_packing",
    "variant_json_ops",
    "benchmark_decontaminate",
    "stratified_sample",
    "hll_mergeable_rollup",  # rows-only by design
    "ann_ml_brp_lsh",  # rows-only by design (recall-bounded vs exact twin)
    "shipping_priority_topk",
    "returned_item_report",
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
