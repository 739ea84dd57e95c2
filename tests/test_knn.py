"""k-NN classification invariants (llm/knn.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
vote semantics, split hygiene, and plan physics.
"""

from __future__ import annotations

import duckdb
import pytest

from ir_analyses_spark.llm.knn import _K, _TEST_MOD, knn_predictions
from ir_analyses_spark.registry import all_oracles, all_queries


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def preds(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/embeddings.parquet')"
    )
    return con.execute(all_oracles()["knn_classify"]).df()


def test_one_prediction_per_heldout_vector(preds):
    assert preds["vec_id"].is_unique
    assert (preds["vec_id"] % _TEST_MOD == 0).all()


def test_votes_domain_and_both_outcomes(preds):
    """Votes live in [1, k]; the accuracy is strictly between 0 and 1 at
    the correctness SFs (both `correct` branches fire — a split leak
    that copies the query vector into train would drive accuracy toward
    1 on duplicated vectors and trip this)."""
    assert preds["votes"].between(1, _K).all()
    assert 0 < preds["correct"].mean() < 1


def test_vote_ties_exercised(preds):
    """votes == 1 means all k neighbors carried distinct labels, so the
    (votes DESC, label ASC) tiebreak decided the prediction — the
    corpus must exercise that path or the tiebreak is untested."""
    assert (preds["votes"] == 1).any()


def test_known_neighborhood(spark):
    """Controlled fixture: the held-out vector (vec_id 0) sits on top of
    three identical train vectors labeled 7 and two labeled 3 — the
    majority must be 7 with 3 votes."""
    rows = [
        (0, [1.0, 0.0], 3),  # held out (vec_id % 10 == 0)
        (1, [1.0, 0.001], 7),
        (2, [1.0, 0.002], 7),
        (3, [1.0, 0.003], 7),
        (4, [1.0, 0.004], 3),
        (5, [1.0, 0.005], 3),
        (6, [-1.0, 0.5], 9),  # far away — must not make top-5
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = knn_predictions(emb).collect()
    assert len(out) == 1
    r = out[0]
    assert r["vec_id"] == 0 and r["pred_label"] == 7 and r["votes"] == 3
    assert r["correct"] is False and r["true_label"] == 3


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def ivf_preds(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/embeddings.parquet')"
    )
    return con.execute(all_oracles()["knn_classify_ivf"]).df(), con


def test_ivf_prunes_and_stays_sound(ivf_preds):
    """The scale twin must (a) predict for EVERY held-out vector — an
    empty coarse index (the stride/test-mod collision the 10× run
    caught) would drop queries silently; (b) actually prune — mean
    candidates well under the train size; (c) keep votes in domain."""
    preds, con = ivf_preds
    n_test = con.execute(
        "SELECT COUNT(*) FROM embeddings WHERE vec_id % 10 = 0"
    ).fetchone()[0]
    n_train = con.execute(
        "SELECT COUNT(*) FROM embeddings WHERE vec_id % 10 <> 0"
    ).fetchone()[0]
    assert len(preds) == n_test
    assert preds["n_candidates"].mean() < n_train / 3
    assert (preds["n_candidates"] >= _K).all() or (preds["votes"] >= 1).all()
    assert preds["votes"].between(1, _K).all()
    assert 0 < preds["correct"].mean() < 1


def test_ivf_agrees_on_clustered_fixture(spark):
    """On a corpus with REAL cluster structure (queries sit inside tight
    train clusters), the IVF twin must reproduce the brute prediction —
    coarse quantization only diverges when neighbors straddle cells."""
    from ir_analyses_spark.llm.knn import knn_classify_ivf

    # 3 tight clusters of 40 train vectors each (ids ≡ 1 mod 10 — never
    # in the held-out split) + 3 explicit held-out queries (ids ≡ 0)
    rows = []
    for c, base in enumerate([(1.0, 0.0), (0.0, 1.0), (-1.0, 0.5)]):
        for j in range(40):
            rows.append((c * 1000 + j * 10 + 1, [base[0] + j * 1e-3, base[1]], c))
    rows += [
        (1000, [1.0, 0.001], 9),   # near cluster 0 → predict 0
        (2000, [0.001, 1.0], 9),   # near cluster 1 → predict 1
        (3000, [-1.0, 0.501], 9),  # near cluster 2 → predict 2
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    brute = {r["vec_id"]: r["pred_label"] for r in knn_predictions(emb).collect()}
    # ivf path works on the loaded table shape; emulate via temp view by
    # monkeypatching load_table is overkill — recompute through the
    # module's internals by writing the frame to a temp dir
    import tempfile

    d = tempfile.mkdtemp(prefix="knn_ivf_fixture_")
    emb.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    ivf = {
        r["vec_id"]: r["pred_label"]
        for r in knn_classify_ivf(spark, d).collect()
    }
    assert set(ivf) == set(brute) == {1000, 2000, 3000}
    assert ivf == brute == {1000: 0, 2000: 1, 3000: 2}


def test_plan_broadcasts_heldout_side(spark, sf_dir):
    """The bounded query set must broadcast; the candidate scan never
    shuffles for the pairing (only the k·|test| survivors shuffle into
    the vote)."""
    plan = (
        all_queries()["knn_classify"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_empty_centroid_set_fails_loudly(spark):
    """An id space with no residue-1 member under the derived stride
    must REFUSE, not silently emit zero rows (r11 ADVICE: the oracle
    degenerates identically, so parity could never catch the empty
    index)."""
    import pytest as _pytest

    from ir_analyses_spark.llm.knn import knn_ivf_predictions

    # vec_id ≡ 2 mod 50: none are test-split (2 mod 10), so train is
    # the FULL set — yet vec_id mod 25 is always 2, so the 25-floor
    # stride finds no residue-1 centroid
    emb = spark.createDataFrame(
        [(i * 50 + 2, [float(i), 1.0], f"l{i % 2}") for i in range(40)],
        "vec_id long, embedding array<double>, label string",
    )
    with _pytest.raises(RuntimeError, match="zero centroids"):
        knn_ivf_predictions(emb).collect()
