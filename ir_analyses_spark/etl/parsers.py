"""Fiscal-period parsers (SURVEY §2A C6–C9) as pure Column expressions.

The reference extracts fiscal year and quarter from cover-page strings like
``第121期 第３四半期(自  2023年10月１日  至  2023年12月31日)`` with pure-Python
regex helpers (reference utils/parser.py:16-131). Here the same rules are
composable ``Column`` functions so they run inside whole-stage codegen over
millions of filings — no UDF, no Python round-trip.

Rule chain for the fiscal year (reference utils/parser.py:27-57), first hit
wins:

1. Gregorian date range ``自 YYYY年 … 至 YYYY年`` → end year.
2. Wareki (令和) range → era arithmetic ``2019 + n - 1``; ``元`` means year 1
   and full-width digits are normalized (reference NFKC-normalizes, but the
   only inputs are digits, so ``translate`` suffices —
   reference utils/parser.py:60-69).
3. Bare first 4-digit number, accepted only within [1990, 2100].

Quarter (reference utils/parser.py:72-131): ``第 n 四半期`` where n may be
ASCII, full-width, or kanji digits; mapped to ``Q1``..``Q4``; anything outside
1..4 → NULL (the reference logs-and-returns-None; NULL is the engine's None).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

FULLWIDTH_DIGITS = "０１２３４５６７８９"
ASCII_DIGITS = "0123456789"

#: kanji + full-width quarter digits → ASCII (reference utils/parser.py:106-119)
_QUARTER_SRC = "一二三四" + FULLWIDTH_DIGITS
_QUARTER_DST = "1234" + ASCII_DIGITS

# Python's re matches full-width digits with \d (str patterns are Unicode),
# Java's \d is ASCII-only — so every reference \d becomes [0-9０-９] here,
# or the engine would silently skip e.g. ``至 ２０２４年`` that the
# reference parses (caught by tests/test_parser_properties.py).
_D = "[0-9０-９]"
_PAT_GREGORIAN_RANGE = rf"自\s*({_D}{{4}})年.*?至\s*({_D}{{4}})年"
# (元|\d+|[０-９]+) in Python: \d+ alone already eats mixed-width runs like
# ``１2``; the ASCII-only Java \d cannot, so one combined class replicates it
_PAT_WAREKI_RANGE = rf"自\s*令和(元|{_D}+)年.*?至\s*令和(元|{_D}+)年"
_PAT_BARE_YEAR = rf"({_D}{{4}})"
_PAT_QUARTER = r"第\s*([0-4０-４一二三四１２３４]+)\s*四半期"


def _nonempty(c: Column) -> Column:
    """regexp_extract signals no-match with '' — normalize to NULL."""
    return F.when(c != "", c)


def wareki_year_to_number(c: Column) -> Column:
    """``元`` → 1, else digits (full-width normalized) as int
    (reference utils/parser.py:60-69)."""
    return (
        F.when(c == "元", F.lit(1))
        .otherwise(F.translate(c, FULLWIDTH_DIGITS, ASCII_DIGITS).cast("int"))
    )


def extract_fiscal_year(c: Column) -> Column:
    """End fiscal year as a 4-char ASCII string, or NULL — the reference's
    three-pattern fallback chain (reference utils/parser.py:16-57).

    Documented divergence: the reference's bare-year fallback returns the
    RAW captured group — full-width if the input was (``return year_str``,
    reference utils/parser.py:50-55). Here ALL three paths normalize to
    ASCII, because a full-width year is a downstream correctness bug, not
    a quirk: it sorts above every ASCII year in the latest-report window
    (that report becomes "latest" forever), casts to NULL as int, and
    mints a different ``report_id`` hash than its ASCII equivalent —
    splitting one logical report into two natural keys."""
    greg_raw = _nonempty(F.regexp_extract(c, _PAT_GREGORIAN_RANGE, 2))
    gregorian = F.translate(greg_raw, FULLWIDTH_DIGITS, ASCII_DIGITS)

    wareki_raw = _nonempty(F.regexp_extract(c, _PAT_WAREKI_RANGE, 2))
    wareki = (F.lit(2019) + wareki_year_to_number(wareki_raw) - 1).cast("string")

    bare = _nonempty(F.regexp_extract(c, _PAT_BARE_YEAR, 1))
    bare_ascii = F.translate(bare, FULLWIDTH_DIGITS, ASCII_DIGITS)
    bare_guarded = F.when(bare_ascii.cast("int").between(1990, 2100), bare_ascii)

    return F.coalesce(gregorian, wareki, bare_guarded)


def extract_quarter_type(c: Column) -> Column:
    """``Q1``..``Q4`` or NULL (reference utils/parser.py:72-131). Multi-digit
    captures (e.g. ``１２`` → 12) fail the 1..4 range guard exactly like the
    reference's int() + range check."""
    raw = _nonempty(F.regexp_extract(c, _PAT_QUARTER, 1))
    n = F.translate(raw, _QUARTER_SRC, _QUARTER_DST).cast("int")
    return F.when(n.between(1, 4), F.concat(F.lit("Q"), n.cast("string")))
