"""Exact two-phase heavy hitters invariants (llm/heavy.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
Misra-Gries candidate guarantee (exactness under hostile partitioning),
the summary size bound, and the non-vacuity of both filter branches.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.llm.heavy import (
    _merge_weighted,
    heavy_hitters,
    misra_gries_summaries,
)


def _exact_hh(tokens: list[str], phi_permille: int) -> dict[str, int]:
    n = len(tokens)
    counts: dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    return {t: c for t, c in counts.items() if c * 1000 > n * phi_permille}


@pytest.mark.parametrize("phi_permille", [10, 50, 200])
@pytest.mark.parametrize("seed", [0, 1])
def test_exact_under_hostile_partitioning(spark, phi_permille, seed):
    """The two-phase result must EQUAL the exact answer regardless of
    how the token stream is split across partitions — the MG candidate
    set may over-include, never under. Zipf-ish stream, repartition(7)
    so no partition sees the whole distribution."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(60)]
    # zipf-ish: token i with weight ~ 1/(i+1); plus a guaranteed-heavy head
    tokens = [vocab[min(int(rng.paretovariate(1.0)) % 60, 59)] for _ in range(5000)]
    tokens += ["hot"] * 800
    rng.shuffle(tokens)
    docs = spark.createDataFrame(
        [(" ".join(tokens[i : i + 25]),) for i in range(0, len(tokens), 25)],
        "text string",
    ).repartition(7)
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitters(docs, phi_permille).collect()
    }
    assert got == _exact_hh(tokens, phi_permille)


def test_summary_size_bound(spark):
    """Phase 1 emits at most k rows per partition — the whole point of
    the sketch is that the union is tiny. (On a UNIFORM stream the
    summary is legitimately EMPTY — every counter decrements away,
    and no token can be a 1/k heavy hitter — so the stream here mixes
    500 uniform tokens with a hot head that must survive.)"""
    k = 10
    rows = [(f"t{i % 500}",) for i in range(4000)] + [("hot",)] * 2000
    tokens = spark.createDataFrame(rows, "token string").repartition(4)
    per_part = (
        misra_gries_summaries(tokens, k)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert per_part and all(r["count"] <= k for r in per_part)
    assert (
        misra_gries_summaries(tokens, k)
        .filter(F.col("token") == "hot")
        .count()
        > 0
    )


def test_merge_weighted_survivor_guarantee():
    """Unit form of the MG bound: any token with count > n/k survives
    the summary, across many random weighted merge orders."""
    rng = random.Random(7)
    for _ in range(20):
        stream = [rng.choice("abcdefgh") for _ in range(400)] + ["H"] * 150
        rng.shuffle(stream)
        k = 5
        counters: dict = {}
        # feed in uneven chunks to exercise the batched decrement
        i = 0
        while i < len(stream):
            j = i + rng.randint(1, 60)
            chunk = stream[i:j]
            uniq: dict = {}
            for t in chunk:
                uniq[t] = uniq.get(t, 0) + 1
            _merge_weighted(counters, list(uniq), list(uniq.values()), k)
            i = j
        assert len(counters) <= k
        assert "H" in counters  # 150 > 550/5 = 110


def test_registry_both_branches_fire(spark):
    """At the correctness SFs the recount must PRUNE some MG candidate
    (est > 0 but exact count under the cut) and KEEP some — otherwise
    phase 2 is vacuous and a broken threshold would still pass."""
    from ir_analyses_spark.io.sources import load_table
    from ir_analyses_spark.llm.heavy import _PHI_PERMILLE

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    k = -(-1000 // _PHI_PERMILLE)
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    n_cands = (
        misra_gries_summaries(tokens, k).select("token").distinct().count()
    )
    n_kept = heavy_hitters(docs, _PHI_PERMILLE).count()
    assert 0 < n_kept < n_cands


def test_plan_no_full_vocabulary_shuffle(spark):
    """The recount groupBy must sit behind the candidate semi-join
    (broadcast), and phase 1 must be map-only: the only Exchanges in
    the plan are the summary union and the candidate-sized recount —
    assert the broadcast is there and no SortMergeJoin appears."""
    from ir_analyses_spark.io.sources import load_table

    plan = (
        heavy_hitters(load_table(spark, "documents", "/root/testdata/sf0.001"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_phi_domain():
    with pytest.raises(ValueError):
        heavy_hitters(None, 0)
    with pytest.raises(ValueError):
        heavy_hitters(None, 1000)
