"""Silver conformance: bronze filings → the 4 warehouse tables
(SURVEY §2A R5/R6, F1–F3, A1, C4–C5, C12–C13, J4; reference
utils/data_mapper.py:55-348).

The reference maps one filing at a time into ORM dicts, minting surrogate
ids through DB sequences and ``flush()`` (reference
utils/service/financial_service.py:177-240). Here every mapping is a
set-oriented transform over a multi-filing bronze frame keyed by
``filing_id``, and surrogate keys are deterministic ``xxhash64`` of natural
keys (SURVEY §7.3.1) — so the whole backfill is one DAG with no sequencing,
and reloading the same filings is idempotent.

Validation (reference raises ValueError per filing,
utils/data_mapper.py:142-151,255-283) becomes a data-quality gate: invalid
filings land in a quarantine DataFrame with a reason column instead of
aborting the other 15,999 filings in the batch.

Config-driven extraction: which XBRL elements feed which column stays data,
not code (reference config/config.toml:35-49) — pass a ``{column:
element_id}`` mapping; defaults mirror the reference's config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .standardize import FILING_ID, ROW_SEQ

#: reference config/config.toml:37-41
XBRL_COMPANY_MAPPING = {
    "edinet_code": "jpdei_cor:EDINETCodeDEI",
    "security_code": "jpdei_cor:SecurityCodeDEI",
    "industry_code": (
        "jpdei_cor:IndustryCodeWhenConsolidatedFinancialStatementsArePrepared"
        "InAccordanceWithIndustrySpecificRegulationsDEI"
    ),
    "company_name": "jpcrp_cor:CompanyNameCoverPage",
}

#: reference config/config.toml:44-49
XBRL_REPORT_MAPPING = {
    "document_type": "jpcrp_cor:DocumentTitleCoverPage",
    "fiscal_year_and_quarter": "jpcrp_cor:QuarterlyAccountingPeriodCoverPage",
    "fiscal_year_end": "jpdei_cor:CurrentPeriodEndDateDEI",
    "filing_date": "jpcrp_cor:FilingDateCoverPage",
}

#: financial-statement row selector (reference utils/data_mapper.py:174-176)
FINANCIAL_ELEMENT_PATTERN = "jppfs_cor:|jpigp_cor:"


def _scalar_string(
    is_numeric: F.Column, value: F.Column, value_text: F.Column
) -> F.Column:
    """The reference's extraction-edge value rule: numerics become
    ``str(int(value))`` (decimal truncation toward zero), text passes
    through (reference utils/data_mapper.py:87-92). Only used at the cover
    extraction edge — never in the fact table (SURVEY §7.3.3)."""
    return F.when(is_numeric, value.cast("long").cast("string")).otherwise(
        value_text
    )


def extract_cover_values(std: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """One row per filing with a column per mapping key — the set-oriented
    twin of ``{key: _get_value(df, element_id)}``
    (reference utils/data_mapper.py:137-141,247-250).

    First-matching-row semantics are made deterministic by ``_row_seq``
    (``min_by`` = the filing's earliest row for that element). The pivot is
    bounded by the declared element list, never the full element_id domain
    (SURVEY §7.3.6).

    Every filing present in ``std`` gets an output row — a filing with NO
    rows matching any mapped element surfaces with all-NULL columns rather
    than vanishing, so the downstream required-field gate can quarantine it
    (the reference raises ValueError for such filings,
    reference utils/data_mapper.py:142-151; silently producing nothing
    would put it in neither the tables nor the rejects)."""
    element_ids = list(mapping.values())
    first_per_element = (
        std.filter(F.col("element_id").isin(element_ids))
        .groupBy(FILING_ID, "element_id")
        .agg(
            F.min_by(
                F.struct("is_numeric", "value", "value_text"), F.col(ROW_SEQ)
            ).alias("r")
        )
        .select(
            FILING_ID,
            "element_id",
            _scalar_string(
                F.col("r.is_numeric"), F.col("r.value"), F.col("r.value_text")
            ).alias("v"),
        )
    )
    pivoted = (
        first_per_element.groupBy(FILING_ID)
        .pivot("element_id", element_ids)
        .agg(F.first("v"))
    )
    all_filings = std.select(FILING_ID).distinct()
    pivoted = all_filings.join(pivoted, FILING_ID, "left")
    return pivoted.select(
        FILING_ID, *[F.col(f"`{eid}`").alias(k) for k, eid in mapping.items()]
    )


def get_value(
    std: DataFrame, element_id: str, context_id: str | None = None
) -> DataFrame:
    """Single-element extraction with the reference's cardinality rule
    (reference utils/data_mapper.py:55-101): if an element matches more than
    one row *and* a context is given, prefer rows with that context; the
    first matching row (by source order) wins; no rows → no output row
    (the reference's None)."""
    matches = std.filter(F.col("element_id") == element_id)
    w = Window.partitionBy(FILING_ID)
    matches = matches.withColumn("_n", F.count(F.lit(1)).over(w))
    if context_id is not None:
        matches = matches.filter(
            (F.col("_n") <= 1) | (F.col("context_id") == context_id)
        )
    return (
        matches.groupBy(FILING_ID)
        .agg(
            F.min_by(
                F.struct("is_numeric", "value", "value_text"), F.col(ROW_SEQ)
            ).alias("r")
        )
        .select(
            FILING_ID,
            _scalar_string(
                F.col("r.is_numeric"), F.col("r.value"), F.col("r.value_text")
            ).alias("value"),
        )
    )


def conform_companies(
    std: DataFrame, mapping: dict[str, str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """(companies, rejects): company dim rows keyed by
    ``xxhash64(edinet_code)``; filings missing required fields are
    quarantined with the reference's error message shape
    (reference utils/data_mapper.py:102-151)."""
    cov = extract_cover_values(std, mapping or XBRL_COMPANY_MAPPING)
    missing = F.concat_ws(
        ",",
        F.when(F.col("edinet_code").isNull(), F.lit("edinet_code")),
        F.when(F.col("company_name").isNull(), F.lit("company_name")),
    )
    cov = cov.withColumn("_missing", missing)
    rejects = cov.filter(F.col("_missing") != "").select(
        FILING_ID,
        F.concat(F.lit("required keys missing: "), F.col("_missing")).alias("reason"),
    )
    companies = (
        cov.filter(F.col("_missing") == "")
        .drop("_missing")
        .select(
            F.xxhash64("edinet_code").alias("company_id"),
            "edinet_code",
            "security_code",
            "industry_code",
            "company_name",
            F.current_timestamp().alias("created_at"),
            F.current_timestamp().alias("updated_at"),
            FILING_ID,
        )
    )
    return companies, rejects


def conform_reports(
    std: DataFrame,
    companies: DataFrame,
    mapping: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(reports, rejects): report dim with fiscal year/quarter parsed from
    the cover-page period string (reference utils/data_mapper.py:213-283).
    ``report_id = xxhash64(company_id, fiscal_year, quarter_type)`` — the
    natural key the reference's roadmap says upserts *should* use
    (SURVEY §7.3.2)."""
    from .parsers import extract_fiscal_year, extract_quarter_type

    cov = extract_cover_values(std, mapping or XBRL_REPORT_MAPPING)
    parsed = (
        cov.withColumn("fiscal_year", extract_fiscal_year(F.col("fiscal_year_and_quarter")))
        .withColumn("quarter_type", extract_quarter_type(F.col("fiscal_year_and_quarter")))
        .withColumn(
            "fiscal_year_end_d",
            F.coalesce(
                F.expr("try_to_date(fiscal_year_end, 'yyyy/M/d')"),
                F.expr("try_to_date(fiscal_year_end, 'yyyy-M-d')"),
            ),
        )
        .withColumn(
            "filing_date_d",
            F.coalesce(
                F.expr("try_to_date(filing_date, 'yyyy/M/d')"),
                F.expr("try_to_date(filing_date, 'yyyy-M-d')"),
            ),
        )
    )
    reason = (
        F.when(
            F.col("fiscal_year_and_quarter").isNull()
            | (F.col("fiscal_year_and_quarter") == ""),
            F.lit("invalid fiscal_year_and_quarter"),
        )
        .when(F.col("fiscal_year").isNull(), F.lit("fiscal year extraction failed"))
        .when(F.col("quarter_type").isNull(), F.lit("quarter extraction failed"))
        # fiscal_year_end is NOT NULL in the warehouse (reference
        # sql/ddl.sql:171-203); an unparsable date would crash the
        # reference's insert — here it quarantines
        .when(
            F.col("fiscal_year_end").isNotNull()
            & F.col("fiscal_year_end_d").isNull(),
            F.lit("invalid fiscal_year_end date"),
        )
        .when(F.col("fiscal_year_end").isNull(), F.lit("missing fiscal_year_end"))
    )
    parsed = parsed.withColumn("_reason", reason)
    valid = parsed.filter(F.col("_reason").isNull())
    # A filing whose company was rejected upstream has no company_id to
    # join; the inner join below would silently drop its report. Surface it
    # in the quarantine instead (the reference's per-filing transaction
    # rolls BOTH inserts back together; set-oriented conformance must keep
    # that filing visible somewhere).
    orphaned = valid.join(
        companies.select(FILING_ID), FILING_ID, "left_anti"
    ).select(FILING_ID, F.lit("company rejected or missing").alias("reason"))
    rejects = parsed.filter(F.col("_reason").isNotNull()).select(
        FILING_ID, F.col("_reason").alias("reason")
    ).unionByName(orphaned)
    reports = (
        valid
        .join(companies.select(FILING_ID, "company_id"), FILING_ID)
        .select(
            F.xxhash64("company_id", "fiscal_year", "quarter_type").alias("report_id"),
            "company_id",
            "document_type",
            "fiscal_year",
            "quarter_type",
            F.col("fiscal_year_end_d").alias("fiscal_year_end"),
            F.col("filing_date_d").alias("filing_date"),
            F.current_timestamp().alias("created_at"),
            F.current_timestamp().alias("updated_at"),
            FILING_ID,
        )
    )
    return reports, rejects


def conform_items(std: DataFrame) -> DataFrame:
    """Item master candidates: financial-statement rows, first occurrence
    per ``element_id``, consolidated-type → category
    (reference utils/data_mapper.py:154-210). The row_number dedup is the
    deterministic form of ``drop_duplicates`` (SURVEY §2A A1); NULL
    consolidated_type falls to Non-consolidated exactly like np.where on
    NaN (reference utils/data_mapper.py:186-190)."""
    w = Window.partitionBy("element_id").orderBy(ROW_SEQ)
    return (
        std.filter(F.col("element_id").rlike(FINANCIAL_ELEMENT_PATTERN))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.xxhash64("element_id").alias("item_id"),
            "element_id",
            F.col("item_name_jp").alias("item_name"),
            F.when(F.col("consolidated_type") == "連結", F.lit("Consolidated"))
            .otherwise(F.lit("Non-consolidated"))
            .alias("category"),
            F.col("unit_id").alias("unit_type"),
            F.current_timestamp().alias("created_at"),
            F.current_timestamp().alias("updated_at"),
        )
    )


def conform_facts(
    std: DataFrame, reports: DataFrame, items: DataFrame
) -> DataFrame:
    """EAV fact rows (reference utils/data_mapper.py:286-332) — the
    set-oriented version of the reference's readability-over-vectorization
    row loop. Item ids come from a broadcast join on ``element_id`` (J4:
    the dict-lookup-per-row becomes one map-side join against the ≤10k-row
    item master); report ids from the per-filing report frame.

    The canonical ``value`` is DecimalType(20,0), mirroring numeric(20)
    (reference sql/ddl.sql:228); duration_type derives from the context id
    (reference utils/data_mapper.py:320-322; NULL context → Instant, where
    the reference would crash — documented divergence)."""
    facts = std.filter(F.col("element_id").rlike(FINANCIAL_ELEMENT_PATTERN))
    return (
        facts.join(
            F.broadcast(items.select("element_id", "item_id")), "element_id"
        )
        .join(reports.select(FILING_ID, "report_id"), FILING_ID)
        .select(
            F.xxhash64(
                "report_id", "item_id", "context_id", "period_type",
                "consolidated_type",
            ).alias("data_id"),
            "report_id",
            "item_id",
            "context_id",
            "period_type",
            "consolidated_type",
            F.when(F.col("context_id").contains("Duration"), F.lit("Duration"))
            .otherwise(F.lit("Instant"))
            .alias("duration_type"),
            F.col("value").cast("decimal(20,0)").alias("value"),
            "value_text",
            "is_numeric",
            # source row order, kept as lineage: the reference keeps facts
            # in insertion order and its summary data_map is a dict built
            # over that order (LAST row per element wins,
            # reference utils/service/financial_service.py:127); queries
            # reproduce that rule deterministically from this column
            F.col(ROW_SEQ).alias("_row_seq"),
            F.current_timestamp().alias("created_at"),
        )
    )


def conform_all(std: DataFrame) -> dict[str, DataFrame]:
    """Bronze → the full 4-table bundle + quarantines, one DAG — the
    set-oriented ``map_data_to_models`` (reference
    utils/data_mapper.py:335-348) generalized to many filings."""
    companies, company_rejects = conform_companies(std)
    reports, report_rejects = conform_reports(std, companies)
    items = conform_items(std)
    facts = conform_facts(std, reports, items)
    return {
        "companies": companies.drop(FILING_ID),
        "reports": reports.drop(FILING_ID),
        "items": items,
        "facts": facts,
        "company_rejects": company_rejects,
        "report_rejects": report_rejects,
    }
