"""IVF-PQ invariants (llm/pq.py) beyond the registry oracle check:
encode correctness vs an independent in-order reimplementation, the
constant-size codebook cap (the 100 TB contract), and ranking quality
vs the IVF-Flat twin on the same candidate lists."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ir_analyses_spark.llm import pq
from ir_analyses_spark.llm.similarity import ann_ivf_topk

SF = "/root/testdata/sf0.001"


def _embeddings_rows():
    return duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') "
        "ORDER BY vec_id"
    ).fetchall()


def test_pq_codes_match_independent_inorder_encoder(spark):
    """Differential check of the encode path: nearest codeword per
    (vector, subspace) recomputed in pure Python with the SAME in-order
    float fold (sequential adds — not numpy pairwise summation, whose
    different grouping could diverge in the last ulp) and the same
    lowest-id tie-break."""
    rows = _embeddings_rows()
    cw = [
        (vid, emb)
        for vid, emb in rows
        if vid % pq._PQ_CW_STRIDE == 0 and vid < pq._PQ_CW_STRIDE * pq._PQ_N_CW
    ]
    expected = {}
    for vid, emb in rows:
        codes = []
        for m in range(pq._PQ_M):
            lo = m * pq._PQ_SUBDIM
            best = None
            for cw_id, cv in cw:
                d = 0.0
                for a, b in zip(emb[lo : lo + pq._PQ_SUBDIM],
                                cv[lo : lo + pq._PQ_SUBDIM]):
                    d += (float(a) - float(b)) * (float(a) - float(b))
                if best is None or d < best[0] or (d == best[0] and cw_id < best[1]):
                    best = (d, cw_id)
            codes.append(best[1])
        expected[vid] = codes
    emb_df = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        r["vec_id"]: [r[f"c{m}"] for m in range(pq._PQ_M)]
        for r in pq.pq_codes(emb_df).collect()
    }
    assert got == expected


def test_codebook_cap_binds_past_256_codewords(spark):
    """Vacuity guard for the `vec_id < stride*256` cap: at test SF the
    corpus is smaller than the cap, so prove on a larger synthetic frame
    that the codebook actually stops at _PQ_N_CW codewords — the
    constant-size-codebook contract that keeps encode O(n·256) instead
    of O(n²/stride) and the broadcast LUT bounded."""
    big = spark.range(3000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (d + 7)).cast("float") for d in range(64)])
        .alias("embedding"),
    )
    cb = pq.pq_codebook(big)
    n_cw = cb.select("cw_id").distinct().count()
    assert n_cw == pq._PQ_N_CW
    # and every subspace has the full codebook
    per_m = cb.groupBy("m").count().collect()
    assert {r["count"] for r in per_m} == {pq._PQ_N_CW}
    assert len(per_m) == pq._PQ_M


def test_ivfpq_recall_vs_ivf_flat_floor(spark):
    """IVF-PQ ranks the SAME probed candidates as IVF-Flat, by ADC
    instead of exact cosine — so overlap of their top-5 sets is pure
    PQ-approximation quality. The whole pipeline is deterministic, so
    the measured value (17/25 at sf0.001 with the 17-codeword codebook
    this corpus yields) is exact and stable; the floor guards against a
    silently degenerate codebook (stride-31 coarse codebooks measured
    5/25)."""
    pq_top = {
        (r["query_id"], r["vec_id"])
        for r in pq.ann_ivfpq_topk(spark, SF).collect()
    }
    flat_top = {
        (r["query_id"], r["vec_id"])
        for r in ann_ivf_topk(spark, SF).collect()
    }
    assert len(flat_top) == 25
    assert len(pq_top & flat_top) / len(flat_top) >= 0.6
