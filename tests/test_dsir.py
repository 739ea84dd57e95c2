"""DSIR importance-weighting invariants (llm/dsir.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
selection semantics, the target enrichment the score exists to produce,
and the hashed-feature behavior.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.llm import dsir
from ir_analyses_spark.llm.dsir import dsir_weights
from ir_analyses_spark.registry import all_oracles


def _con(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{sf}/documents.parquet')"
    )
    return con


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def weights(request):
    con = _con(request.param)
    return con.execute(all_oracles()["dsir_importance_select"]).df()


def test_every_doc_scored_once(weights):
    assert weights["doc_id"].is_unique
    assert len(weights) == 500
    assert (weights["n_tokens"] > 0).all()


def test_gate_splits_at_mean(weights):
    """The above-mean gate must keep a strict, sane fraction — and the
    mean-cut arithmetic must be consistent with the emitted weights."""
    sel = weights["selected"].sum()
    assert 0 < sel < len(weights)
    # double-precision replay of the decimal gate agrees to rounding
    mean = weights["logweight"].mean()
    disagree = (
        (weights["logweight"] > mean) != weights["selected"]
    ).sum()
    assert disagree <= 1  # only a doc within 1e-6 of the mean may flip


def test_target_language_enriched(weights):
    """The operator's purpose: the target language's selection rate must
    strictly exceed every other language's at both correctness SFs (the
    synthetic langs share a vocabulary, so enrichment is mild — but it
    must be there, or the tgt/raw ratio plumbing is broken)."""
    rates = weights.groupby("lang")["selected"].mean()
    others = rates.drop("en")
    assert rates["en"] > others.max()


def test_hashed_features_collide(spark, sf_dir):
    """B=64 must actually merge distinct words into shared buckets on
    this corpus — the defining property of hashed features (a B large
    enough to be collision-free would silently test plain unigrams)."""
    from ir_analyses_spark.io.sources import load_table
    from ir_analyses_spark.llm.bloomdecon import _md5_long

    docs = load_table(spark, "documents", sf_dir)
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .select("w", (_md5_long("w", 1) % dsir._B).alias("b"))
    )
    n_words, n_buckets = vocab.agg(
        F.count(F.lit(1)), F.countDistinct("b")
    ).first()
    assert n_buckets < n_words  # collisions exist


def test_uniform_corpus_selects_nothing_special(spark):
    """Control: when every doc IS the target distribution (all docs one
    lang, same content), all weights are equal and the strict >-mean
    gate selects nothing."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma", "en") for i in range(8)],
        "doc_id long, text string, lang string",
    )
    out = dsir_weights(docs).toPandas()
    assert out["logweight"].nunique() == 1
    assert (~out["selected"]).all()


def test_term_table_bounded_and_broadcast(spark, sf_dir):
    """Plan physics: the per-bucket term join and both scalar joins must
    broadcast — the token stream never shuffles for them."""
    from ir_analyses_spark.registry import all_queries

    plan = (
        all_queries()["dsir_importance_select"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1  # term join
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # two scalar gates


def test_dsir_gate_matches_registry_selection(spark, sf_dir):
    """The funnel gate form (external target corpus) must reproduce the
    registry twin's selection exactly when the target corpus IS the
    en-language subset — same counts, same smoothing, same decimal
    algebra, so the kept doc_id set is equal, and passthrough columns
    survive."""
    from ir_analyses_spark.io.sources import load_table
    from ir_analyses_spark.llm.dsir import dsir_gate, dsir_weights

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "text", "source"
    )
    want = {
        r["doc_id"]
        for r in dsir_weights(docs.select("doc_id", "lang", "text"))
        .filter("selected")
        .collect()
    }
    got_rows = dsir_gate(
        docs, docs.filter("lang = 'en'").select("text")
    ).collect()
    assert {r["doc_id"] for r in got_rows} == want
    assert set(got_rows[0].asDict()) == {"doc_id", "lang", "text", "source"}


def test_importance_select_single_explode_pass(spark, sf_dir):
    """r15 (guide §2.4): raw/tgt/totals derive from the doc-bucket /
    bucket-rollup aggregates, so the EXECUTED plan explodes and
    md5-hashes the corpus exactly once — every other branch rides a
    ReusedExchange. (The static initial plan cannot show runtime stage
    reuse; the final adaptive plan can.)"""
    import re

    df = dsir.dsir_importance_select(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"\bGenerate\b", final)) == 1
    assert "ReusedExchange" in final
