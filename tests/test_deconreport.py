"""Benchmark-leakage audit invariants (llm/deconreport.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
exact semantics against a brute-force model, the shared-gram contract
with the bloomdecon gate, fixture non-vacuity at the correctness SFs,
and the broadcast scale shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ir_analyses_spark.llm.deconreport import (
    _BENCH_MOD,
    benchmark_leak_report,
    benchmark_leak_report_query,
)


def _grams(text: str, n: int = 3) -> set:
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def test_leak_report_exact_semantics(spark):
    bench = {
        1: "a b c d e",          # "a b c","b c d","c d e"
        2: "x y z",              # one gram, absent from the corpus
        3: "a b",                # sub-n: no grams, NO row
    }
    corpus = {
        10: "p q a b c d r s",   # leaks "a b c" and "b c d"
        11: "entirely different words here",
    }
    bdf = spark.createDataFrame(list(bench.items()), "doc_id long, text string")
    cdf = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_leaked"], r["leak_permille"])
        for r in benchmark_leak_report(bdf, cdf).collect()
    }
    cgrams = set().union(*(_grams(t) for t in corpus.values()))
    want = {}
    for d, t in bench.items():
        gs = _grams(t)
        if not gs:
            continue
        leaked = len(gs & cgrams)
        want[d] = (len(gs), leaked, 1000 * leaked // len(gs))
    assert got == want
    assert got[1] == (3, 2, 666)   # partial leak, truncating div
    assert got[2] == (1, 0, 0)     # clean item
    assert 3 not in got            # sub-n contributes nothing


def test_leak_report_fixture_bites_and_matches_gate_grams(spark):
    """At the correctness SF the certificate split yields clean,
    partially-leaked AND fully-leaked items (the report is a
    distribution, not a constant), and the gram definition IS the
    bloomdecon gate's (shared function, re-checked here against it)."""
    got = benchmark_leak_report_query(spark, "/root/testdata/sf0.001")
    rows = got.collect()
    perms = [r["leak_permille"] for r in rows]
    assert len(rows) > 3
    assert any(p == 1000 for p in perms) or any(600 < p < 1000 for p in perms)
    assert min(perms) < max(perms)  # not a constant report
    # shared-gram contract: recompute one bench doc's n_grams via the
    # gate's own word_ngrams
    from ir_analyses_spark.llm.bloomdecon import word_ngrams

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in word_ngrams(bench.select("doc_id", "text"))
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["doc_id"]: r["n_grams"] for r in rows} == per_doc


def test_leak_report_scale_shape(spark):
    """Both joins broadcast the benchmark-sized side — nothing
    corpus-cardinality shuffles into an aggregation."""
    df = benchmark_leak_report_query(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
