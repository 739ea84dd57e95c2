"""Unicode text normalization for corpus curation (SURVEY §2B LLM ext
— the cleanup pass that runs BEFORE hashing/dedup/tokenization so that
visually-identical texts hash identically).

Two tiers, like `llm/html_extract`:

- :func:`clean_text_expr` — JVM fast path: strip C0/C1 control chars
  (except \\t \\n), zero-width/BOM code points, normalize unicode
  spaces to ASCII space, squeeze horizontal whitespace runs, trim.
  Pure codegen `regexp_replace`; patterns in the Java∩RE2 subset with
  a DuckDB twin for differential testing.
- :func:`nfkc_normalize_df` — full NFKC (compatibility composition:
  fullwidth→ASCII, ligatures, roman numerals, superscripts…) via
  pandas' vectorized ``Series.str.normalize`` under Arrow-batched
  ``mapInPandas`` — the canonicalization the JVM tier cannot express.

Both map-only: zero shuffle, linear in bytes. New module per the
evidence-ledger rule; verified by `tests/test_textnorm.py` against
Python's ``unicodedata`` reference.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: Shared by the Spark expression, the Python reference, and (after
#: escape translation) the DuckDB twin. Written with ``\\uXXXX`` escapes
#: — valid in Java regex and Python ``re``; RE2 wants ``\\x{XXXX}``, so
#: :func:`clean_text_sql` rewrites them. Order matters: spaces
#: normalize BEFORE runs squeeze.
_CLEAN_STEPS = (
    # C0 controls minus \t\n, DEL, C1 controls
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\u0080-\u009f]", ""),
    # zero-width chars, word joiner, BOM, soft hyphen
    (r"[\u200b\u200c\u200d\u2060\ufeff\u00ad]", ""),
    # unicode line/paragraph separators -> newline (Java regex \\s never
    # matches U+2028/U+2029, so they must be gone before the final trim
    # or the engines' edge-trimming would diverge)
    (r"[\u2028\u2029]", "\n"),
    # unicode horizontal spaces -> ASCII space
    (r"[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]", " "),
    # squeeze runs of spaces/tabs (newlines preserved — they carry
    # block structure the line-level operators key on)
    (r"[ \t]{2,}", " "),
    # strip spaces around newlines, then leading/trailing
    (r" ?\n ?", "\n"),
)

_U_ESCAPE = re.compile(r"\\u([0-9a-fA-F]{4})")


def clean_text_expr(col):
    """JVM fast path as a column expression; see module docstring."""
    c = col
    for pat, rep in _CLEAN_STEPS:
        c = F.regexp_replace(c, pat, rep)
    # full-whitespace trim: F.trim strips only spaces, but leading or
    # trailing NEWLINES must go too (Python reference: str.strip())
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def clean_text_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) with the fast-path cleanup applied."""
    return docs.select(
        "doc_id", clean_text_expr(F.col(text_col)).alias("text")
    )


def clean_text_sql(table: str) -> str:
    """DuckDB twin of :func:`clean_text_df` — the SAME patterns."""
    if not re.fullmatch(r"\w+", table):
        raise ValueError(f"table must be an identifier, got {table!r}")
    expr = "text"
    for pat, rep in _CLEAN_STEPS:
        pat = _U_ESCAPE.sub(lambda m: "\\x{" + m.group(1) + "}", pat)
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    expr = rf"regexp_replace({expr}, '^\s+|\s+$', '', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM {table}"


def py_clean_text(text: str) -> str:
    """Pure-Python restatement of the fast path (test reference and
    non-Spark callers)."""
    for pat, rep in _CLEAN_STEPS:
        text = re.sub(pat, rep, text)
    return text.strip()


_NFKC_SCHEMA = "doc_id long, text string"


def nfkc_normalize_df(
    docs: DataFrame, text_col: str = "text", form: str = "NFKC"
) -> DataFrame:
    """Full unicode normalization via pandas' vectorized
    ``Series.str.normalize`` (Arrow batches, no per-row Python loop).
    ``form`` ∈ {NFC, NFKC, NFD, NFKD}."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be a unicode normal form, got {form!r}")
    src = docs.select("doc_id", F.col(text_col).alias("text"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "text": b["text"].str.normalize(form),
                }
            )

    return src.mapInPandas(run, schema=_NFKC_SCHEMA)
