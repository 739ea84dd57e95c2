"""End-to-end backfill orchestration (SURVEY §3.2/§3.3 re-shaped): the
reference's per-file ingest loop as ONE Spark DAG.

Reference flow (scripts/bypass_import_csv.py:42-78): glob → per file:
chardet → read_csv → standardize → map → per-row ORM inserts in a fresh
UoW. Here: one multi-encoding scan → one standardize → one conform →
four idempotent table writes. Per-filing sequencing disappears because
surrogate keys are deterministic hashes (no flush-to-get-an-id), and
re-running the backfill converges to the same tables (upsert on natural
keys; facts replaced per report partition).

Scale posture: facts partition by ``fiscal_year`` on disk (the query
surface's hottest predicate); dims are small and rewrite whole. At 100 TB
the same layout holds with bucketing by ``report_id`` added for fact-fact
co-location (SURVEY §7.3.6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import sinks
from ..io.sources import read_filing_csvs
from .config_toml import conform_all_with_mappings
from .standardize import standardize_raw


def _dedup_deterministic(df: DataFrame, key: str) -> DataFrame:
    """One row per key with a DETERMINISTIC survivor. ``dropDuplicates``
    keeps a partition-order-dependent survivor (the engine's own rule
    forbids it — see ops/aggregates.dedup_by_key), which would make
    re-runs of the backfill upsert different rows and never converge.

    Survivor policy: when the frame carries the source row order
    (``_row_seq`` — the facts table), the LAST source row wins, matching
    both the reference's insertion order and the summary layer's
    last-wins resolution, so a deduped table serves bit-identical
    summaries to the undeduped in-memory frame. Without an order column
    (dims), the lexicographically least full-row struct wins — arbitrary
    but total."""
    others = [c for c in df.columns if c != key]
    if "_row_seq" in df.columns:
        agg = df.groupBy(key).agg(
            F.max_by(
                F.struct(*[F.col(c).alias(c) for c in others]), F.col("_row_seq")
            ).alias("_r")
        )
    else:
        agg = df.groupBy(key).agg(
            F.min(F.struct(*[F.col(c).alias(c) for c in others])).alias("_r")
        )
    return agg.select(key, *[F.col(f"_r.{c}").alias(c) for c in others])


def backfill_from_csvs(
    spark: SparkSession,
    csv_glob: str,
    out_dir: str,
    company_mapping: dict | None = None,
    report_mapping: dict | None = None,
) -> dict[str, DataFrame]:
    """Bulk CSV backfill: scan → bronze → silver tables under ``out_dir``.

    Returns the conformed bundle (incl. quarantines) for inspection; the
    four tables land as parquet:
    ``companies/ financial_items/ financial_reports/ financial_data/``.

    Multi-filing collapse: when several filings map to one natural key
    (re-filed cover pages → same company_id; an original + amendment →
    same report_id and therefore same data_id per item), each table keeps
    ONE deterministic survivor — min-struct per key — so repeated
    backfills converge bit-identically. A policy that prefers the
    amendment would order by a filing sequence instead; the testdata
    carries none, so determinism is the contract.
    """
    raw = read_filing_csvs(spark, csv_glob)
    std = standardize_raw(raw, filing_id_col="_filing_path")
    # mappings arrive from the TOML config source (etl/config_toml.py);
    # both-None delegates straight to conform_all — identical plan
    bundle = conform_all_with_mappings(std, company_mapping, report_mapping)

    companies = _dedup_deterministic(bundle["companies"], "company_id")
    items = bundle["items"]
    reports = _dedup_deterministic(bundle["reports"], "report_id")
    facts = _dedup_deterministic(bundle["facts"], "data_id")

    # dims: keyed upserts (A5/A6/A7 semantics — reload-idempotent)
    sinks.merge_upsert(companies, os.path.join(out_dir, "companies"), ["company_id"])
    sinks.append_missing(items, os.path.join(out_dir, "financial_items"), "item_id")
    sinks.merge_upsert(reports, os.path.join(out_dir, "financial_reports"), ["report_id"])

    # facts: per-fiscal-year partition replace (the roadmap's 洗い替え)
    facts_with_year = facts.join(
        reports.select("report_id", "fiscal_year"), "report_id"
    )
    sinks.replace_partition(
        facts_with_year, os.path.join(out_dir, "financial_data"), "fiscal_year"
    )
    return bundle


def read_silver(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Load the four conformed tables back for the query layer."""
    return {
        "companies": spark.read.parquet(os.path.join(out_dir, "companies")),
        "items": spark.read.parquet(os.path.join(out_dir, "financial_items")),
        "reports": spark.read.parquet(os.path.join(out_dir, "financial_reports")),
        "facts": spark.read.parquet(os.path.join(out_dir, "financial_data")),
    }
