"""Text normalization (llm/textnorm.py): DuckDB parity for the JVM
fast path, unicodedata reference for the NFKC tier."""

from __future__ import annotations

import unicodedata

import pandas as pd
import pytest

from ir_analyses_spark.llm.textnorm import (
    clean_text_df,
    clean_text_sql,
    nfkc_normalize_df,
    py_clean_text,
)

DOCS = [
    (0, "plain text stays put"),
    (1, "ctrl\x01chars\x07and\x1bgone\x00now"),
    (2, "zero\u200bwidth\u200c joins\u2060 bom\ufeff soft\u00adhyphen"),
    (3, "nbsp\u00a0space em\u2003space ideographic\u3000space"),
    (4, "runs   of    spaces\t\tand tabs"),
    (5, "  lead and trail  "),
    (6, "around \n newlines \n keep\nstructure"),
    (7, ""),
    (8, "c1\u0085controls\u009fgone"),
]

NFKC_DOCS = [
    (0, "ﬁligature and ﬂow"),          # ligatures fi fl
    (1, "ｆｕｌｌｗｉｄｔｈ１２３"),       # fullwidth forms
    (2, "Ⅻ roman ² super ½ vulgar"),
    (3, "café composed vs café decomposed"),
    (4, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_clean_matches_python_reference(docs_df):
    got = {r["doc_id"]: r["text"] for r in clean_text_df(docs_df).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_clean_text(text), doc_id


def test_clean_matches_duckdb(docs_df):
    import duckdb

    from tests.compare import assert_matches_oracle

    con = duckdb.connect()
    con.register("raw_docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    assert_matches_oracle(
        clean_text_df(docs_df), con, clean_text_sql("raw_docs"), name="clean_text"
    )


def test_clean_semantics(docs_df):
    got = {r["doc_id"]: r["text"] for r in clean_text_df(docs_df).collect()}
    assert got[1] == "ctrlcharsandgonenow"
    assert got[2] == "zerowidth joins bom softhyphen"
    assert got[3] == "nbsp space em space ideographic space"
    assert got[4] == "runs of spaces and tabs"
    assert got[5] == "lead and trail"
    assert got[6] == "around\nnewlines\nkeep\nstructure"
    assert got[7] == ""
    assert got[8] == "c1controlsgone"


def test_nfkc_matches_unicodedata(spark):
    df = spark.createDataFrame(NFKC_DOCS, "doc_id long, text string")
    for form in ("NFKC", "NFC"):
        got = {
            r["doc_id"]: r["text"]
            for r in nfkc_normalize_df(df, form=form).collect()
        }
        for doc_id, text in NFKC_DOCS:
            assert got[doc_id] == unicodedata.normalize(form, text), (
                doc_id,
                form,
            )
    # NFKC actually folds: composed == decomposed, fullwidth → ASCII
    nk = {
        r["doc_id"]: r["text"] for r in nfkc_normalize_df(df).collect()
    }
    assert nk[1] == "fullwidth123"
    assert "fi" in nk[0] and "fl" in nk[0]
    assert nk[3].count("café") == 2


def test_nfkc_rejects_bad_form(spark):
    df = spark.createDataFrame(NFKC_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="normal form"):
        nfkc_normalize_df(df, form="NFX")


def test_norm_then_hash_dedup(spark):
    """The reason this stage exists: visually-identical texts hash
    identically AFTER normalization, not before."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "same text"), (1, "same\u00a0text"), (2, "same  text\u200b")],
        "doc_id long, text string",
    )
    before = df.select(F.md5("text")).distinct().count()
    after = clean_text_df(df).select(F.md5("text")).distinct().count()
    assert before == 3 and after == 1
