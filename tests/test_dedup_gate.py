"""The chained-dedup determinism gate (VERDICT r4 item 3): an LSH recall
miss must fail LOUDLY in ``_assert_lsh_equals_exact`` before the component
closure runs, never surface as a silent dedup_components /
neardup_dedup_pipeline oracle mismatch. These tests INJECT the failure
modes (a dropped true edge; a phantom edge) and pin that the gate catches
each, plus the two pass-through contracts (clean edges pass; beyond the
pair budget the gate steps aside instead of running the quadratic twin).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.io.sources import load_table
from ir_analyses_spark.llm import dedup


@pytest.fixture(scope="module")
def edge_fixture(spark, sf_dir):
    """(docs, verified LSH edges) — computed once; every test in this file
    perturbs the edge frame, not the corpus."""
    docs = load_table(spark, "documents", sf_dir)
    edges = dedup.minhash_lsh_nearup(spark, sf_dir).select("d1", "d2")
    edges = edges.localCheckpoint(eager=True)
    # vacuity guard: a corpus with no near-dup pairs would make every test
    # below pass without exercising the gate at all
    assert edges.count() > 0, "fixture corpus has no near-dup edges"
    return docs, edges


def test_gate_passes_on_true_edges(edge_fixture):
    docs, edges = edge_fixture
    dedup._assert_lsh_equals_exact(edges, docs)  # must not raise


def test_gate_catches_dropped_edge(edge_fixture):
    """Simulated banding recall miss: remove one true pair from the LSH
    output — the exact twin still has it, so the gate must name it on the
    'missed_by_lsh' side."""
    docs, edges = edge_fixture
    victim = edges.orderBy("d1", "d2").first()
    crippled = edges.filter(
        ~((F.col("d1") == victim["d1"]) & (F.col("d2") == victim["d2"]))
    )
    with pytest.raises(RuntimeError, match="missed_by_lsh"):
        dedup._assert_lsh_equals_exact(crippled, docs)


def test_gate_catches_phantom_edge(edge_fixture):
    """The other drift direction: an edge the exact arithmetic would never
    emit (verify-threshold drift between the two code paths) must be named
    on the 'not_in_exact' side."""
    docs, edges = edge_fixture
    spark = edges.sparkSession
    phantom = spark.createDataFrame([(-1, -2)], "d1 long, d2 long")
    with pytest.raises(RuntimeError, match="not_in_exact"):
        dedup._assert_lsh_equals_exact(edges.unionByName(phantom), docs)


def test_gate_steps_aside_beyond_budget(edge_fixture, monkeypatch):
    """At corpus scale the quadratic exact twin is unaffordable; the gate
    must return silently (recall bound becomes the contract) — even for an
    edge set it would otherwise reject."""
    docs, edges = edge_fixture
    monkeypatch.setattr(dedup, "_PAIR_BLOWUP_BUDGET", 1)
    crippled = edges.limit(0)
    dedup._assert_lsh_equals_exact(crippled, docs)  # must not raise


# slow: exact-closure equality; the LSH==exact gate also runs inside dedup_components on every oracle sweep
@pytest.mark.slow
def test_clone_collapse_components_equal_exact_closure(
    spark, tmp_path, monkeypatch
):
    """r6 exact-before-fuzzy optimization: dedup_components collapses
    exact clone families before LSH and re-attaches members with star
    edges — the closure must be BIT-EQUAL to the exact-Jaccard closure
    (the DuckDB oracle) on a corpus that actually HAS clones (the driver
    SFs have none, so without this fixture the collapse path would be
    vacuously green). Fixture: sf0.001 docs replicated ×3 with shifted
    ids — every doc becomes a 3-clone family, and every original
    near-dup pair becomes 9 cross-family pairs."""
    import duckdb

    src = "/root/testdata/sf0.001/documents.parquet"
    n = duckdb.sql(f"SELECT MAX(doc_id)+1 FROM read_parquet('{src}')").fetchone()[0]
    duckdb.sql(
        f"""COPY (SELECT CAST(doc_id + i * {n} AS BIGINT) AS doc_id,
                        text, lang, source, n_chars
                 FROM read_parquet('{src}'), UNNEST(range(0, 3)) AS t(i))
            TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"""
    )
    # spy on the LSH stage to prove the collapse actually FIRED: it must
    # see only the canonical sub-corpus (one doc per clone family), never
    # the full clone-heavy frame — output equality alone can't tell (the
    # pre-collapse path produces identical clusters, just 75 s slower at
    # clone density 10, see SCALE.md)
    real_minhash_pairs = dedup.minhash_pairs
    seen = {}

    def spying(docs):
        seen["n_docs"] = docs.count()
        return real_minhash_pairs(docs)

    monkeypatch.setattr(dedup, "minhash_pairs", spying)
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup.dedup_components(spark, str(tmp_path)).collect()
    }
    monkeypatch.undo()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {
        (int(a), int(b))
        for a, b in con.execute(dedup.DEDUP_COMPONENTS_SQL).fetchall()
    }
    assert len(want) > 0 and got == want
    # the spy proves the collapse: LSH saw exactly the distinct-text
    # canonicals (1/3 of the corpus), never the clone-heavy frame
    n_docs = duckdb.sql(
        f"SELECT COUNT(DISTINCT md5(text)) FROM read_parquet('{src}')"
    ).fetchone()[0]
    assert seen["n_docs"] == n_docs
    # and every doc's 2 clones clustered to a canonical (COUNT-based
    # bound — MAX(doc_id)+1 would break on sparse-id regenerated data)
    n_actual = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{src}')"
    ).fetchone()[0]
    fam = [p for p in got if p[0] != p[1]]
    assert len(fam) >= 2 * n_actual
