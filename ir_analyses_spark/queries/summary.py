"""Serving queries (SURVEY §3.1, M4): the reference's full FinancialService
read surface as single declarative DataFrame plans.

The reference answers "show me company X's latest margins" with five
sequential ORM round-trips plus Python-side math (reference
utils/service/financial_service.py:90-165). Here it is ONE plan —
``companies ⋈ latest_report(window) ⋈ fact.filter(isin) ⋈ broadcast(items)
→ pivot → coalesce-priority → margins`` — which Catalyst collapses into a
broadcast-joined scan; computing the summary for *every* company costs the
same shape as for one (the point of being set-oriented at 100 TB).

Null/zero semantics preserved from the reference (SURVEY §7.3.3):
- a margin exists only when both income and sales are non-NULL *and*
  non-zero (Python truthiness guard,
  reference utils/service/financial_service.py:150-159);
- the reference's million-yen rescale crashes on NULL measures
  (reference utils/service/financial_service.py:160-164, unguarded) — the
  engine propagates NULL instead; documented divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: measure → ordered element_id synonym list
#: (reference utils/service/financial_service.py:54-75)
SUMMARY_ITEMS: dict[str, list[str]] = {
    "net_sales": [
        "jppfs_cor:NetSales",
        "jppfs_cor:OperatingRevenue1",
        "jppfs_cor:OperatingRevenueSEC",
        "jpigp_cor:RevenueIFRS",
    ],
    "operating_income": [
        "jppfs_cor:OperatingIncome",
        "jpigp_cor:OperatingProfitLossIFRS",
    ],
    "ordinary_income": [
        "jppfs_cor:OrdinaryIncome",
        "jpigp_cor:ProfitLossBeforeTaxIFRS",
    ],
    "net_income": [
        "jppfs_cor:ProfitLossAttributableToOwnersOfParent",
        "jppfs_cor:ProfitLoss",
        "jpigp_cor:ProfitLossAttributableToOwnersOfParentIFRS",
    ],
}


def latest_report_per_company(reports: DataFrame) -> DataFrame:
    """Latest-per-group (SURVEY §2A A4) as a window, with the total-order
    tiebreakers the reference lacks (SURVEY §7.3.4): fiscal_year is the
    varchar the reference sorts lexically — safe for 4-digit years — then
    fiscal_year_end and report_id make the pick deterministic."""
    w = Window.partitionBy("company_id").orderBy(
        F.col("fiscal_year").desc(),
        F.col("fiscal_year_end").desc(),
        F.col("report_id").desc(),
    )
    return (
        reports.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _truthy(c: F.Column) -> F.Column:
    """Python-truthiness as a predicate: non-NULL and non-zero."""
    return c.isNotNull() & (c != 0)


def financial_summary(
    companies: DataFrame,
    reports: DataFrame,
    facts: DataFrame,
    items: DataFrame,
    edinet_code: str | None = None,
) -> DataFrame:
    """One summary row per company for its latest report: the
    FinancialSummaryDTO as a DataFrame
    (reference utils/service/financial_service.py:33-50,90-165)."""
    all_element_ids = [e for lst in SUMMARY_ITEMS.values() for e in lst]

    comp = companies
    if edinet_code is not None:
        comp = comp.filter(F.col("edinet_code") == edinet_code)

    latest = latest_report_per_company(reports).select(
        "report_id", "company_id", "fiscal_year", "quarter_type"
    )

    # fact ⋈ broadcast(item master) restricted to the 11 summary elements:
    # the IN-filter pushes to the parquet scan of the (small) item dim and
    # the fact side prunes by item_id after the broadcast join (J1+F10).
    summary_items = items.filter(F.col("element_id").isin(all_element_ids)).select(
        "item_id", "element_id"
    )
    # schema migration shim: a facts table written by a pre-_row_seq
    # backfill must still serve instead of failing on a missing column.
    # Source order is unrecoverable for such tables, so the per-element
    # resolution below falls back to its value tiebreaker — deterministic,
    # though not the reference's "last source row" (which no longer exists)
    if "_row_seq" not in facts.columns:
        facts = facts.withColumn("_row_seq", F.lit(0).cast("long"))
    measures = facts.join(F.broadcast(summary_items), "item_id").select(
        "report_id",
        "element_id",
        F.col("value").cast("double").alias("value"),
        "_row_seq",
    )
    # prune BEFORE the aggregate/pivot: only latest reports are consumed,
    # and the left join below cannot push through two groupBys — without
    # this semi-join the pivot cost grows with history length, not
    # company count
    measures = measures.join(
        latest.select("report_id"), "report_id", "left_semi"
    )

    # bounded pivot: exactly the 11 declared element ids, never the full
    # element domain (SURVEY §7.3.6). Each cell is a PRESENCE struct, not a
    # bare value: the reference resolves synonyms on key presence in
    # data_map (reference utils/service/financial_service.py:77-88), so a
    # higher-priority element present with a NULL value must WIN (and
    # yield NULL) rather than fall through to a lower-priority synonym —
    # a bare-value pivot + coalesce would skip it.
    # Deterministic per-element resolution (SURVEY §7.3.4: never first()
    # after a shuffle): LAST source row per element wins — exactly the
    # reference's ``data_map`` dict comprehension over insertion-ordered
    # facts (reference utils/service/financial_service.py:127), made
    # partition-order invariant by resolving on the carried ``_row_seq``.
    # ordering key is (seq, value): with a real _row_seq the seq is unique
    # and value never decides; under the constant-seq migration shim above,
    # ties resolve on value — still deterministic across partition orders
    per_element = measures.groupBy("report_id", "element_id").agg(
        F.max_by("value", F.struct("_row_seq", "value")).alias("v")
    )
    pivoted = (
        per_element.groupBy("report_id")
        .pivot("element_id", all_element_ids)
        .agg(F.first(F.struct(F.lit(True).alias("present"), F.col("v").alias("v"))))
    )

    joined = (
        comp.select("company_id", "company_name", "edinet_code")
        .join(latest, "company_id")
        .join(pivoted, "report_id", "left")
    )

    # candidate-priority resolution: first PRESENT candidate in declared
    # synonym order, keeping its value even when NULL
    # (J5, reference utils/service/financial_service.py:54-88)
    for measure, candidates in SUMMARY_ITEMS.items():
        resolved = None
        for c in candidates:
            cond = F.col(f"`{c}`.present")
            val = F.col(f"`{c}`.v")
            resolved = F.when(cond, val) if resolved is None else resolved.when(cond, val)
        joined = joined.withColumn(measure, resolved)

    sales = F.col("net_sales")

    def rate(income_col: str) -> F.Column:
        inc = F.col(income_col)
        return F.when(
            _truthy(inc) & _truthy(sales), inc / sales * F.lit(100.0)
        )

    return joined.select(
        "company_name",
        F.concat_ws(" ", "fiscal_year", "quarter_type").alias("period_name"),
        F.col("fiscal_year").cast("int").alias("fiscal_year"),
        "quarter_type",
        rate("operating_income").alias("operation_profit_rate"),
        rate("ordinary_income").alias("ordinary_profit_rate"),
        rate("net_income").alias("net_profit_rate"),
        # million-yen display scale, NULL-propagating (divergence: the
        # reference crashes on NULL here)
        *[
            (F.col(m) / F.lit(1_000_000.0)).alias(m)
            for m in SUMMARY_ITEMS
        ],
        "edinet_code",
    )


#: the chart's measures in the UI's dict-insertion order
#: (reference app/app.py:158-163): JP label → summary column
CHART_ITEMS: list[tuple[str, str]] = [
    ("売上高", "net_sales"),
    ("営業利益", "operating_income"),
    ("経常利益", "ordinary_income"),
    ("純利益", "net_income"),
]


def summary_chart_frame(summary: DataFrame) -> DataFrame:
    """The UI's 2-column chart frame (reference app/app.py:158-169): one
    ``(項目, 金額)`` row per measure, 金額 as double (the reference's
    ``.astype(float)``) in million yen — the DTO columns are already
    rescaled. A DataFrame has no row order, so the pandas dict-insertion
    order the chart relies on (SURVEY §2A O3) is carried as an explicit
    ``chart_order`` column; render with ``ORDER BY chart_order`` (the
    reference's Altair ``sort=None`` equivalent). Runs per company —
    ``edinet_code`` keys the frame, so serving every company's chart is
    one plan, not a loop."""
    entries = [
        F.struct(
            F.lit(i).cast("int").alias("chart_order"),
            F.lit(jp).alias("項目"),
            F.col(m).cast("double").alias("金額"),
        )
        for i, (jp, m) in enumerate(CHART_ITEMS)
    ]
    return summary.select(
        "edinet_code", F.explode(F.array(*entries)).alias("e")
    ).select("edinet_code", "e.chart_order", "e.項目", "e.金額")


def company_selection_list(companies: DataFrame) -> DataFrame:
    """The UI's two-column projection (P4,
    reference utils/repositories/company_repository.py:19-25)."""
    return companies.select("company_name", "edinet_code")


def item_time_series(
    facts: DataFrame,
    reports: DataFrame,
    company_id: int,
    item_id: int,
) -> DataFrame:
    """Per-company single-item time series ordered by period end (J2/O2,
    reference utils/repositories/financial_data_repository.py:37-49)."""
    return (
        facts.filter(F.col("item_id") == item_id)
        .join(reports.select("report_id", "company_id", "fiscal_year_end"), "report_id")
        .filter(F.col("company_id") == company_id)
        .orderBy("fiscal_year_end")
        .select("fiscal_year_end", "value", "value_text", "is_numeric")
    )
