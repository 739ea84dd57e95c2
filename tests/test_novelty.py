"""First-seen n-gram novelty invariants (llm/novelty.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
semantics and the plan physics.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from ir_analyses_spark.llm.novelty import ngram_novelty_scores
from ir_analyses_spark.registry import all_oracles, all_queries


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def per_doc(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/documents.parquet')"
    )
    return con.execute(all_oracles()["ngram_novelty"]).df()


def test_score_domain_and_consistency(per_doc):
    assert (per_doc["n_novel"] <= per_doc["n_ngrams"]).all()
    assert (per_doc["n_novel"] >= 0).all()
    assert ((per_doc["novelty"] >= 0) & (per_doc["novelty"] <= 1)).all()


def test_both_extremes_and_cut_fire(per_doc):
    """Vacuity: the corpus must exercise all-novel docs, zero-novel docs,
    and both sides of the mostly_boilerplate cut at the correctness SFs —
    otherwise the first-seen window could be broken and parity still
    green."""
    assert (per_doc["novelty"] == 1.0).any()
    assert (per_doc["novelty"] == 0.0).any()
    b = per_doc["mostly_boilerplate"].sum()
    assert 0 < b < len(per_doc)


def test_exact_duplicate_scores_zero(spark):
    """First-seen semantics on a controlled corpus: an exact duplicate
    later in doc_id order scores novelty 0; the original scores 1."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty_scores(docs).collect()}
    assert rows[1]["novelty"] == 1.0 and rows[1]["mostly_boilerplate"] is False
    assert rows[2]["novelty"] == 0.0 and rows[2]["mostly_boilerplate"] is True
    assert rows[3]["novelty"] == 1.0


def test_shuffles_are_fixed_width_and_windowless(spark, sf_dir):
    """The contract in the module docstring: every exchange is keyed on
    longs only — the gram STRING never rides a shuffle — and there is
    NO window operator (the hg-partitioned window would hot-spot on
    universal boilerplate grams; every step must be a partial-
    aggregating groupBy)."""
    df = all_queries()["ngram_novelty"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert 3 <= len(parts) <= 4
    for p in parts:
        cols = [c.strip() for c in p.split(",")[:-1]]  # last item = numPartitions
        assert cols and all("#" in c and c.split("#")[1].endswith("L") for c in cols), p


def test_novelty_gate_short_docs_kept_and_passthrough(spark):
    """Gate form (r11 VERDICT item 7): below-threshold docs drop,
    sub-3-word docs are KEPT (the word-count rule owns them), and
    passthrough columns survive untouched."""
    from ir_analyses_spark.llm.novelty import novelty_gate

    docs = spark.createDataFrame(
        [
            # all-novel grams → novelty 1.0 → kept
            (1, "alpha beta gamma delta", "keep-novel"),
            # exact repeat of doc 1's grams → novelty 0.0 → dropped
            (2, "alpha beta gamma delta", "drop-copy"),
            # too short for a 3-gram → unscored → kept
            (3, "tiny doc", "keep-short"),
            (4, "", "keep-empty"),
        ],
        "doc_id long, text string, tag string",
    )
    out = {r["doc_id"]: r["tag"] for r in novelty_gate(docs).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1] == "keep-novel" and out[3] == "keep-short"


def test_novelty_gate_threshold_is_integer_exact(spark):
    """1000·n_novel < permille·n_ngrams is an integer comparison: a doc
    sitting exactly AT the threshold is kept (strict less-than drops)."""
    from ir_analyses_spark.llm.novelty import (
        ngram_novelty_scores,
        novelty_gate,
    )

    # doc 2 shares half its 2 grams with doc 1 → novelty exactly 0.5
    docs = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "a b c d", "y")],
        "doc_id long, text string, tag string",
    )
    scores = {
        r["doc_id"]: r for r in ngram_novelty_scores(docs).collect()
    }
    assert scores[2]["n_ngrams"] == 2 and scores[2]["n_novel"] == 1
    at = {r["doc_id"] for r in
          novelty_gate(docs, min_novelty_permille=500).collect()}
    above = {r["doc_id"] for r in
             novelty_gate(docs, min_novelty_permille=501).collect()}
    assert at == {1, 2}       # 1000·1 == 500·2 → not strictly below
    assert above == {1}       # 1000·1 < 501·2 → dropped
