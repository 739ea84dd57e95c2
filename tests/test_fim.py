"""FIM transform invariants (llm/fim.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
losslessness, cut-length, and pass-through contracts.
"""

from __future__ import annotations

import duckdb
import pytest

from ir_analyses_spark.llm.fim import MID, PRE, SUF, fim_transform
from ir_analyses_spark.registry import all_oracles, all_queries


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def fim(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/documents.parquet')"
    )
    return con.execute(all_oracles()["fim_psm_split"]).df()


def test_lossless_everywhere_and_half_applied(fim):
    """Every transformed doc must reassemble to its original bytes, and
    the deterministic half-split must actually transform a nontrivial
    fraction (all docs ≥ 30 chars in this corpus → exactly the even
    half)."""
    assert fim["lossless"].all()
    n = len(fim)
    assert fim["fim_applied"].sum() == n // 2


def test_cut_length_contract(fim):
    ap = fim[fim["fim_applied"]]
    assert (ap["prefix"].str.len() >= 1).all()
    assert (ap["middle"].str.len() >= 1).all()
    assert (ap["suffix"].str.len() >= 9).all()
    # PSM serialization carries all three parts in PSM order
    sample = ap.iloc[0]
    assert sample["psm_text"] == (
        PRE + sample["prefix"] + SUF + sample["suffix"] + MID + sample["middle"]
    )


def test_passthrough_contract(fim):
    un = fim[~fim["fim_applied"]]
    assert un["middle"].isna().all() and un["suffix"].isna().all()
    assert (un["psm_text"] == un["prefix"]).all()


def test_multibyte_and_short_docs(spark):
    """Substring arithmetic is character-based in both engines: a
    multibyte doc reassembles losslessly; a short doc passes through."""
    docs = spark.createDataFrame(
        [
            (2, "日本語のテキスト" * 8),  # 64 chars, all multibyte, even id
            (4, "short"),                 # even but < 30 chars
            (3, "x" * 100),               # odd → autoregressive half
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fim_transform(docs).collect()}
    r2 = rows[2]
    assert r2["fim_applied"] and r2["lossless"]
    assert r2["prefix"] + r2["middle"] + r2["suffix"] == "日本語のテキスト" * 8
    assert not rows[4]["fim_applied"] and rows[4]["prefix"] == "short"
    assert not rows[3]["fim_applied"]


def test_transform_is_shuffle_free(spark, sf_dir):
    plan = (
        all_queries()["fim_psm_split"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
