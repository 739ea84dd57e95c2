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

from .llm import dedup, multimodal, sampling, similarity, textstats
from .ops import (
    aggregates,
    collections,
    joins,
    macros,
    relational,
    skew,
    subqueries,
    udfs,
    windows,
)
from .queries import ir_demo
from .streaming import pipeline as streaming_pipeline

_MODULES = [
    aggregates,
    joins,
    relational,
    subqueries,
    windows,
    collections,
    macros,
    skew,
    udfs,
    dedup,
    similarity,
    textstats,
    sampling,
    multimodal,
    streaming_pipeline,
    ir_demo,
]

#: Explicit registry order. The driver's correctness sweep has a bounded
#: budget (rounds 1–2 each recorded rows for exactly the first 50 registry
#: entries), so ordering is part of the verification contract. Round-3
#: rotation, per VERDICT.md r2 item 2:
#:
#: - Positions 0–49 lead with the 19 queries no driver round has ever
#:   checked (18 up front; the 19th, quadratic ``ngram_jaccard_nearup``,
#:   holds the window boundary), then the 5 queries the r2 ts-decode
#:   bug broke (re-verification after the fix), then the queries new or
#:   newly-oracled this round, then backfill — the flagship + entries
#:   green only in r1 (second green row) + r2-green streaming executions.
#: - The tail holds entries already hash-green in r1 and/or r2 with code
#:   unchanged since.
#: - ``ngram_jaccard_nearup`` is the deliberately-quadratic exact verifier
#:   and runs at the window boundary — first check, but never ahead of
#:   anything else unchecked.
_ORDER = [
    # -- flagship every round --
    "ir_summary_pipeline",
    # -- never driver-checked (19) --
    "benchmark_decontaminate",
    "stratified_sample",
    "hll_mergeable_rollup",
    "bpe_pair_counts",
    "doc_frequency",
    "pii_scrub",
    "sequence_packing",
    "variant_json_ops",
    "media_frame_sample",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "stream_incremental_rollup",
    "shipping_priority_topk",
    "returned_item_report",
    "small_quantity_revenue",
    "suppliers_with_waiting_orders",
    "concentrated_part_types",
    "ann_ml_brp_lsh",
    # -- r2 ts-bug casualties: re-verify after the decode fix --
    "join_asof",
    "stream_tumbling_batch",
    "stream_sliding_batch",
    "stream_session_batch",
    "window_sessionize",
    # -- new this round (first driver check) --
    "simhash_nearup",
    "repetition_metrics",
    "corpus_mixture",
    "timeseries_gapfill",
    "neardup_dedup_pipeline",
    # -- backfill: r2-green streaming executions + LLM headliners --
    "stateful_user_totals",
    "stream_dedup_watermark",
    "exact_dedup",
    "minhash_lsh_nearup",
    "dedup_components",
    "corpus_clean_pipeline",
    "pricing_summary",
    # -- backfill: green only in r1 — earn a second green row --
    "case_conditional",
    "cube_agg",
    "grouping_sets_agg",
    "unpivot_melt",
    "minmax_extremes",
    "join_full_outer",
    "window_range_interval",
    "guarded_ratio_margin",
    "python_udtf_expand",
    "pandas_grouped_agg_udf",
    "apply_in_pandas_topk",
    "salted_twophase_agg",
    "salted_skew_join",
    "ngram_jaccard_nearup",  # quadratic exact verifier: window boundary
    # ---- 50-query window boundary (driver budget) ----
    # tail: hash-green in r1 and/or r2, code unchanged since
    "map_ops",
    "explode_tokens",
    "json_extract_ops",
    "pivot_coalesce_priority",
    "text_stats",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_nearup",
    "multimodal_features",
    "media_resize",
    "media_codec_features",
    "approx_sketches",  # rows-only by design (error-bound test in-repo)
    "rollup_agg",
    "distinct_agg",
    "pivot_agg",
    "dedup_by_key",
    "latest_per_group",
    "exact_median",
    "join_broadcast_dims",
    "join_multiway_topk",
    "join_left_outer",
    "join_semi_anti",
    "join_theta_bands",
    "join_range_window",
    "filter_pushdown_project",
    "string_predicates",
    "string_functions",
    "null_semantics",
    "regexp_extract_ops",
    "date_functions",
    "math_functions",
    "set_operations",
    "window_ranking",
    "window_lag_lead",
    "window_running_frames",
    "array_agg_ops",
    "pandas_udf_vectorized",
    "regional_revenue",
    "order_priority_counts",
    "top_unshipped_parts",
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
