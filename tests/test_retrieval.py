"""Retrieval primitives invariants (llm/retrieval.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
BM25 algebra against an independent pure-Python model, the postings
format contract, and branch non-vacuity at the correctness SFs.
"""

from __future__ import annotations

import math

from ir_analyses_spark.llm.retrieval import (
    bm25_score_docs,
    bm25_scores,
    inverted_postings,
)


def _bm25_model(texts: dict, terms) -> dict:
    """Independent reference: textbook BM25 (k1=1.2, b=0.75) computed
    float-first, no integer rescaling — agreement within the round-6
    quantum proves the rational rearrangement is the same function."""
    toks = {d: t.split(" ") for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, ws in toks.items():
        s = 0.0
        hit = 0
        for q in terms:
            tf = ws.count(q)
            if not tf:
                continue
            hit += 1
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log((n - df + 0.5) / (df + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
        if hit:
            out[d] = (hit, s)
    return out


def test_bm25_matches_independent_model(spark):
    texts = {
        1: "cat dog cat fish",
        2: "cat bird",
        3: "dog dog dog dog dog dog",
        4: "fish",
        5: "bird bird bird",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_scores(docs, ("cat", "dog")).collect()
    }
    want = _bm25_model(texts, ("cat", "dog"))
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 2e-6, (d, got[d], want[d])


def test_bm25_rarer_term_scores_higher(spark):
    """Same tf and dl, rarer term → higher idf → higher score."""
    rows = [(1, "rare a"), (2, "common a"), (3, "common b"), (4, "common c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ("rare", "common")).collect()
    }
    assert got[1] > got[2]


def test_registry_branches_fire(spark):
    """At the correctness SFs: some docs unmatched (score absent), and
    both single- and multi-term matches exist — otherwise the idf join
    or the per-doc sum could be broken with parity still green."""
    rows = bm25_score_docs(spark, "/root/testdata/sf0.001").collect()
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert 0 < len(rows) < n_docs
    n_terms = {r["n_terms"] for r in rows}
    assert min(n_terms) >= 1 and max(n_terms) > 1


def test_postings_exact_format(spark):
    docs = spark.createDataFrame(
        [(2, "b a b"), (1, "a b a")], "doc_id long, text string"
    )
    got = {r["token"]: r for r in inverted_postings(docs).collect()}
    assert got["a"]["postings"] == "1:1,3;2:2"
    assert got["b"]["postings"] == "1:2;2:1,3"
    assert got["a"]["df"] == 2 and got["a"]["total_tf"] == 3
    assert got["b"]["df"] == 2 and got["b"]["total_tf"] == 3


def test_postings_plan_two_aggregations_no_join(spark):
    """Index build is two grouped aggregations over one scan — any Join
    in the plan means the construction regressed to a join-back."""
    plan = (
        inverted_postings(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_bm25_stat_frames_broadcast(spark):
    """The idf table (bounded by query length) and the 1-row totals
    must ride broadcast joins; only doc-cardinality frames may shuffle."""
    plan = (
        bm25_score_docs(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 3
