"""Bloom-filter decontamination invariants (llm/bloomdecon.py).

Cross-engine value parity is covered by the full-registry sweep in
test_oracle_parity.py; these tests pin the operator's ALGORITHMIC
guarantees — the ones a value-matching but mis-parameterized rebuild
could silently lose:

- zero false negatives (every true benchmark n-gram reports member);
- false positives exist at the correctness SFs (the m/k sizing is
  non-vacuous — a huge filter would make `false_pos` identically 0 and
  the audit column dead weight);
- the keep cut splits the corpus (vacuity discipline,
  test_vacuity_guards.py pattern);
- the filter representation is genuinely bounded by m bits;
- the probe plan keeps its physics: membership re-group rides the
  (doc_id, g) distinct's partitioning (no extra exchange), both join
  sides broadcast.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.io.sources import load_table
from ir_analyses_spark.llm import bloomdecon
from ir_analyses_spark.registry import all_oracles, all_queries


def _con(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{sf}/documents.parquet')"
    )
    return con


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def con(request):
    return _con(request.param)


@pytest.fixture(scope="module")
def per_doc(con):
    return con.execute(all_oracles()["bloom_ngram_decontaminate"]).df()


def test_no_false_negatives(per_doc):
    """Bloom membership must dominate exact membership per doc: a false
    negative would make false_pos < 0 somewhere (and would break the
    decontamination guarantee the operator exists for)."""
    assert (per_doc["false_pos"] >= 0).all()
    assert (per_doc["bloom_hits"] >= per_doc["exact_hits"]).all()


def test_per_ngram_no_false_negative(con):
    """Stronger, per-n-gram form: no (doc_id, g) row where the gram is
    truly in the benchmark set but the filter misses it. Recomputed
    oracle-side (milliseconds; oracle==Spark is pinned by parity)."""
    # reuse the oracle's CTE chain up to `scored` by textual surgery:
    sql = all_oracles()["bloom_ngram_decontaminate"]
    head, _, _ = sql.partition("per_doc AS (")
    probe = head.rstrip().rstrip(",") + """
SELECT COUNT(*) FROM scored WHERE exact_in = 1 AND bloom_in = 0
"""
    assert con.execute(probe).fetchone()[0] == 0


def test_false_positives_observable(per_doc):
    """The m=4096/k=2 sizing must actually produce false positives at
    the correctness SFs — otherwise the audit column is vacuous."""
    assert per_doc["false_pos"].sum() > 0
    assert (per_doc["false_pos"] > 0).sum() > 10


def test_keep_cut_splits_corpus(per_doc):
    kept = per_doc["keep"].sum()
    assert 0 < kept < len(per_doc)


def test_bits_bounded_by_m(spark, sf_dir):
    """The broadcastable filter representation is ≤ m rows no matter the
    benchmark size — the property that makes it a Bloom filter and not a
    set broadcast."""
    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % bloomdecon._BENCH_MOD == 0)
    bits = bloomdecon.bloom_bits(bloomdecon.word_ngrams(bench))
    n = bits.count()
    assert 0 < n <= bloomdecon._M_BITS
    # positions live in [0, m)
    mn, mx = bits.agg(F.min("pos"), F.max("pos")).first()
    assert mn >= 0 and mx < bloomdecon._M_BITS


def test_short_docs_excluded_contract(spark, sf_dir):
    """Docs with <3 whitespace tokens contribute no n-grams (documented
    contract): the probe output has no row for them, never a 0/0 row."""
    out = all_queries()["bloom_ngram_decontaminate"](spark, sf_dir)
    assert out.filter(F.col("n_ngrams") <= 0).count() == 0


def test_probe_plan_physics(spark, sf_dir):
    """Membership re-group must reuse the (doc_id, g) distinct's hash
    partitioning — exactly one exchange on (doc_id, g) in the whole
    plan — and both benchmark-side joins must broadcast (the train/
    corpus side NEVER shuffles for the joins)."""
    df = all_queries()["bloom_ngram_decontaminate"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    pairs = re.findall(r"hashpartitioning\(doc_id#\d+L?, g#\d+", plan)
    assert len(pairs) == 1, plan
