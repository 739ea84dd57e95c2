"""Property-style randomized parser tests (SURVEY §5 extension): several
hundred generated period strings, evaluated in ONE Spark job and compared
against an independent Python model of the reference's rules
(reference utils/parser.py:16-131).

The model is deliberately re-derived from the reference's *documented
semantics* (pattern precedence, era arithmetic, digit maps, range guards),
not from our Column implementation — agreement therefore tests the
implementation, not itself.
"""

from __future__ import annotations

import random
import re
import unicodedata

from pyspark.sql import functions as F

from ir_analyses_spark.etl.parsers import extract_fiscal_year, extract_quarter_type

# ---------------------------------------------------------------------------
# independent Python model of the reference semantics
# ---------------------------------------------------------------------------

def model_fiscal_year(content: str) -> str | None:
    m = re.search(r"自\s*(\d{4})年.*?至\s*(\d{4})年", content)
    if m:
        return str(int(m.group(2)))
    m = re.search(r"自\s*令和(元|\d+|[０-９]+)年.*?至\s*令和(元|\d+|[０-９]+)年", content)
    if m:
        g = m.group(2)
        n = 1 if g == "元" else int(unicodedata.normalize("NFKC", g))
        return str(2019 + n - 1)
    m = re.search(r"(\d{4})", content)
    if m and 1990 <= int(m.group(1)) <= 2100:
        # engine divergence (see parsers.extract_fiscal_year): bare years
        # normalize to ASCII instead of the reference's raw return
        return str(int(unicodedata.normalize("NFKC", m.group(1))))
    return None


_QMAP = {c: i % 4 + 1 for i, c in enumerate("一二三四１２３４1234")}


def model_quarter(content: str) -> str | None:
    m = re.search(r"第\s*([0-4０-４一二三四１２３４]+)\s*四半期", content)
    if not m:
        return None
    t = m.group(1).strip()
    if t in _QMAP:
        n = _QMAP[t]
    else:
        try:
            n = int(t)  # int() accepts full-width digits, like the reference
        except ValueError:
            return None
    return f"Q{n}" if 1 <= n <= 4 else None


# ---------------------------------------------------------------------------
# generator (seeded — reproducible)
# ---------------------------------------------------------------------------

def _fullwidth(n: int) -> str:
    return str(n).translate(str.maketrans("0123456789", "０１２３４５６７８９"))


def gen_cases(rng: random.Random, n: int) -> list[str]:
    kanji = "〇一二三四五六七八九"
    quarters = ["1", "2", "3", "4", "0", "5", "１", "３", "一", "四", "二", "１２"]
    cases = []
    for _ in range(n):
        form = rng.randrange(7)
        q = rng.choice(quarters)
        period = rng.randrange(1, 150)
        if form == 0:  # gregorian range
            y1, y2 = rng.randrange(1900, 2150), rng.randrange(1900, 2150)
            cases.append(
                f"第{period}期 第{q}四半期(自  {y1}年10月１日  至  {y2}年12月31日)"
            )
        elif form == 1:  # wareki ascii
            n1, n2 = rng.randrange(1, 40), rng.randrange(1, 40)
            cases.append(f"第{period}期第{q}四半期(自 令和{n1}年4月1日 至 令和{n2}年6月30日)")
        elif form == 2:  # wareki fullwidth / 元
            g1 = rng.choice(["元", _fullwidth(rng.randrange(1, 20))])
            g2 = rng.choice(["元", _fullwidth(rng.randrange(1, 20))])
            cases.append(f"(自 令和{g1}年4月1日 至 令和{g2}年6月30日)")
        elif form == 3:  # bare year only
            cases.append(f"{rng.randrange(1000, 3000)}年{rng.randrange(1,13)}月期")
        elif form == 4:  # quarter only, no year
            cases.append(f"第{q}四半期")
        elif form == 5:  # garbage
            cases.append(rng.choice(["", "通期", "事業年度", "ｘｙｚ", "第 期"]))
        else:  # mixed digits and spacing
            cases.append(f"第 {q} 四半期 (自 2023年 至 {_fullwidth(2024)}年)")
    return cases


def test_parsers_match_reference_model(spark):
    rng = random.Random(42)
    cases = gen_cases(rng, 300)
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = (
        df.select(
            "s",
            extract_fiscal_year(F.col("s")).alias("fy"),
            extract_quarter_type(F.col("s")).alias("q"),
        )
        .collect()
    )
    mismatches = []
    for r in got:
        want_fy, want_q = model_fiscal_year(r["s"]), model_quarter(r["s"])
        if r["fy"] != want_fy or r["q"] != want_q:
            mismatches.append((r["s"], r["fy"], want_fy, r["q"], want_q))
    assert not mismatches, mismatches[:5]
