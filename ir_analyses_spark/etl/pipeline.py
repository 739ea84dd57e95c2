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
from .conform import conform_all
from .standardize import standardize_raw


def backfill_from_csvs(
    spark: SparkSession, csv_glob: str, out_dir: str
) -> dict[str, DataFrame]:
    """Bulk CSV backfill: scan → bronze → silver tables under ``out_dir``.

    Returns the conformed bundle (incl. quarantines) for inspection; the
    four tables land as parquet:
    ``companies/ financial_items/ financial_reports/ financial_data/``.
    """
    raw = read_filing_csvs(spark, csv_glob)
    std = standardize_raw(raw, filing_id_col="_filing_path")
    bundle = conform_all(std)

    companies = bundle["companies"].dropDuplicates(["company_id"])
    items = bundle["items"]
    reports = bundle["reports"].dropDuplicates(["report_id"])
    facts = bundle["facts"]

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
