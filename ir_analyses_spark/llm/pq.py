"""Product-quantized ANN (IVF-PQ) — the last rung of the similarity
scale ladder (brute → LSH → IVF-Flat → IVF-PQ, SURVEY §2B similarity).

Own module (not ``similarity.py``) on purpose: the registry's
evidence-ledger discipline treats a module change as staleness for every
query it defines, so a NEW operator lands in a NEW module and the
r5-certified similarity queries keep their green rows. Shares the
in-order-fold determinism helpers via import — importing does not change
the imported module.

Determinism discipline (same contract as ``similarity.py``): codebooks
and centroids are stride-samples of the corpus itself (no RNG, no
training iterations), subvector L2/dot are in-order double folds, the
ADC sum is a fixed-order expression — so this *approximate* index is
bit-reproducible cross-engine and therefore DuckDB-oracle-checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table
from .similarity import (
    _assign_nearest,
    _dot_col,
    _IVF_CENTROID_STRIDE,
    _IVF_NPROBE,
    _QUERY_IDS,
    _SQL_COS,
    _SQL_DOT,
    _TOP_K,
    _with_norm,
)

#: Product quantization: 64-dim vectors → _PQ_M subspaces of _PQ_SUBDIM
#: dims; codewords are a deterministic stride-sample of the corpus's own
#: subvectors (same no-RNG/no-iteration design as the IVF coarse stage).
#: FAISS calls this layout IVFPQ with by_residual=false: codes quantize
#: the raw vectors, not the residuals against the coarse centroid — the
#: variant whose index build is one extra scan and whose oracle stays
#: closed-form.
_PQ_M = 8
_PQ_SUBDIM = 8
#: codebook = every _PQ_CW_STRIDE-th vector, CAPPED at _PQ_N_CW codewords
#: (ids below _PQ_CW_STRIDE·_PQ_N_CW). The cap is the scale contract:
#: FAISS trains a CONSTANT 256-codeword codebook per subspace; a codebook
#: proportional to the corpus would make the encode scan O(n·n/stride) —
#: quadratic — and the broadcast LUT unbounded. With the cap, encode is
#: O(n·256) subvector folds and the per-query LUT is ≤ 256×8 doubles.
_PQ_CW_STRIDE = 3
_PQ_N_CW = 256


def _sub(vec: str) -> F.Column:
    """Array of the _PQ_M subvectors; posexplode index IS the subspace m."""
    return F.array(
        *[F.slice(vec, m * _PQ_SUBDIM + 1, _PQ_SUBDIM) for m in range(_PQ_M)]
    )


_L2 = (
    "aggregate(zip_with({a}, {b}, "
    "(x, y) -> (cast(x as double) - cast(y as double)) "
    "* (cast(x as double) - cast(y as double))), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)

#: r14 optimization (guide §1.2 per-task work): the encode hot loop
#: evaluates one subvector-L2 per (vector, subspace, codeword) row —
#: n·M·256 evaluations — and the HOF fold above is INTERPRETED per row
#: (lambda eval + object churn outside whole-stage codegen). For the
#: fixed 8-dim subspace the same in-order sum unrolls into a codegen'd
#: expression: cast(0.0 as double) + t0 + t1 + ... keeps the HOF's exact
#: left-fold association (acc starts at 0.0), so the double result is
#: bit-identical — measured 2.7× faster on the encode scan at sf0.1
#: (8.2 s → 3.1 s interleaved medians). The 64-dim dot product KEEPS the
#: HOF (similarity.py measured a 64-term unroll 2.7× SLOWER — the deep
#: Add tree blows up codegen); 8 terms sits well under that cliff.
#: NOTE Spark SQL ``a[i]`` is 0-based (element_at is 1-based).


def _l2_unrolled(a: str, b: str, dim: int = _PQ_SUBDIM) -> str:
    terms = " + ".join(
        f"(cast({a}[{i}] as double) - cast({b}[{i}] as double))"
        f" * (cast({a}[{i}] as double) - cast({b}[{i}] as double))"
        for i in range(dim)
    )
    return f"(cast(0.0 as double) + {terms})"


def pq_codes(emb: DataFrame) -> DataFrame:
    """PQ index build: (vec_id, c0..c{M-1}) — each subspace's nearest
    codeword id by in-order L2 fold, ties to the lowest codeword id.
    One corpus scan against a broadcast codebook; the 8 small codes are
    the ONLY per-vector state the search ever shuffles (64× smaller than
    the raw float32 vector).

    r14 optimization (guide §2.3): the per-subspace argmin is
    ``min(struct(l2, cw_id))`` — a partial aggregation — instead of a
    ``row_number()`` window over the scored frame. The window shape
    shuffled and sorted ALL n·M·256 scored rows; the aggregate reduces
    map-side to one row per (vec_id, m) before the exchange — a 256-fold
    shuffle cut. Struct comparison is lexicographic (l2 asc, then cw_id
    asc), exactly the window's ORDER BY l2, cw_id rank-1 pick, and
    min() is associative+commutative so partial aggregation cannot
    change the result (oracle MATCH + collect-equality re-verified)."""
    subcw = pq_codebook(emb)
    subv = emb.select(
        "vec_id", F.posexplode(_sub("embedding")).alias("m", "sv")
    )
    scored = subv.join(F.broadcast(subcw), "m").select(
        "vec_id",
        "m",
        F.struct(
            F.expr(_l2_unrolled("sv", "cwv")).alias("l2"),
            F.col("cw_id").alias("cw"),
        ).alias("sc"),
    )
    best = (
        scored.groupBy("vec_id", "m")
        .agg(F.min("sc").alias("b"))
        .select("vec_id", "m", F.col("b.cw").alias("cw_id"))
    )
    return best.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("m") == m, F.col("cw_id"))).alias(f"c{m}")
            for m in range(_PQ_M)
        ]
    )


def pq_codebook(emb: DataFrame) -> DataFrame:
    """(m, cw_id, cwv): subvectors of every _PQ_CW_STRIDE-th vector,
    capped at _PQ_N_CW codewords."""
    return emb.filter(
        (F.col("vec_id") % _PQ_CW_STRIDE == 0)
        & (F.col("vec_id") < _PQ_CW_STRIDE * _PQ_N_CW)
    ).select(
        F.col("vec_id").alias("cw_id"),
        F.posexplode(_sub("embedding")).alias("m", "cwv"),
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: coarse-quantize into inverted lists (identical
    centroids/probing to ``similarity.ann_ivf_topk``), then rank the
    probed candidates by PQ-approximated inner product via ADC —
    asymmetric distance computation: the query stays full-precision,
    each candidate is its 8 codebook codes, and the score is 8 lookups
    into a per-query lookup table, never a 64-dim float op per pair.

    This is THE 100 TB ANN architecture (FAISS IVFPQ): the index stores
    8 small codes per vector, the LUT is (n_codewords × 8) doubles per
    query — broadcast — and the per-pair work is 8 map lookups plus a
    fixed-order 8-term add. Raw embeddings are touched exactly twice
    (encode + coarse assign, both index-build scans) and never shuffled
    per pair.

    Engine-exactness: encode/LUT folds are in-order (see
    ``similarity._DOT``); the per-pair ADC sum is a FIXED-ORDER
    expression over the 8 pivoted partials, never a float ``SUM()``
    whose partial-agg reassociation could diverge; every argmin/rank
    tie breaks on codeword/vector id."""
    emb = load_table(spark, "embeddings", sf_dir)
    subcw = pq_codebook(emb)
    codes = pq_codes(emb)
    # ADC lookup tables: per query, one map cw_id → partial dot per
    # subspace (map lookup is key-addressed, so collect_list order is
    # irrelevant to the result)
    q = emb.filter(F.col("vec_id").isin(_QUERY_IDS))
    lut = (
        q.select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(_sub("embedding")).alias("m", "qsv"),
        )
        .join(F.broadcast(subcw), "m")
        .select("query_id", "m", "cw_id", _dot_col("qsv", "cwv").alias("pdot"))
        .groupBy("query_id")
        .agg(
            *[
                F.map_from_entries(
                    F.collect_list(
                        F.when(
                            F.col("m") == m,
                            F.struct(F.col("cw_id"), F.col("pdot")),
                        )
                    )
                ).alias(f"lut{m}")
                for m in range(_PQ_M)
            ]
        )
    )
    # coarse stage: same centroids/probing as ann_ivf_topk
    norm = _with_norm(emb, "embedding", "enorm")
    cdim = norm.filter(F.col("vec_id") % _IVF_CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cv"),
        F.col("enorm").alias("cnorm"),
    )

    def _near(df: DataFrame, id_col: str, k: int) -> DataFrame:
        """Window form, probe side only (bounded query set) — the
        corpus-sized k=1 assignment uses _assign_nearest (partial agg;
        r14 optimization, see similarity.py)."""
        scored = df.join(F.broadcast(cdim), how="cross").select(
            id_col,
            "cent_id",
            (
                _dot_col("embedding", "cv") / (F.col("enorm") * F.col("cnorm"))
            ).alias("_csim"),
        )
        w = W.partitionBy(id_col).orderBy(
            F.col("_csim").desc(), F.col("cent_id")
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .select(id_col, F.col("cent_id").alias("list_id"))
        )

    lists = _assign_nearest(
        norm.select("vec_id", "embedding", "enorm"), cdim,
        "embedding", "enorm", "vec_id", "list_id",
    )
    probes = _near(
        norm.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"), "embedding", "enorm"
        ),
        "query_id",
        _IVF_NPROBE,
    )
    cand = (
        probes.join(lists, "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    # ADC: one narrow join to the 8 codes, broadcast LUT, 8 lookups,
    # fixed-order add
    adc = reduce(
        lambda acc, m: acc + F.element_at(f"lut{m}", F.col(f"c{m}")),
        range(1, _PQ_M),
        F.element_at("lut0", F.col("c0")),
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), "query_id")
        .select("query_id", "vec_id", adc.alias("adc_dot"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_dot").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "adc_dot", "rnk")
    )


_SQL_SUBL2 = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
    "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (acc, v) -> acc + v)"
)

_SLICE = f"embedding[m * {_PQ_SUBDIM} + 1 : m * {_PQ_SUBDIM} + {_PQ_SUBDIM}]"

ANN_IVFPQ_TOPK_SQL = f"""
WITH subcw AS (
  SELECT vec_id AS cw_id, m, {_SLICE} AS cwv
  FROM embeddings, UNNEST(range(0, {_PQ_M})) AS t(m)
  WHERE vec_id % {_PQ_CW_STRIDE} = 0
    AND vec_id < {_PQ_CW_STRIDE * _PQ_N_CW}
),
subv AS (
  SELECT vec_id, m, {_SLICE} AS sv
  FROM embeddings, UNNEST(range(0, {_PQ_M})) AS t(m)
),
enc AS (
  SELECT vec_id, m, cw_id FROM (
    SELECT s.vec_id, s.m, c.cw_id,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_SQL_SUBL2.format(a='s.sv', b='c.cwv')} ASC,
                      c.cw_id) AS r
    FROM subv s JOIN subcw c ON s.m = c.m
  ) WHERE r = 1
),
lut AS (
  SELECT q.vec_id AS query_id, c.m, c.cw_id,
         {_SQL_DOT.format(a='q.qsv', b='c.cwv')} AS pdot
  FROM (
    SELECT vec_id, m, {_SLICE} AS qsv
    FROM embeddings, UNNEST(range(0, {_PQ_M})) AS t(m)
    WHERE vec_id IN (0, 1, 2, 3, 4)
  ) q JOIN subcw c ON q.m = c.m
),
cent AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
  WHERE vec_id % {_IVF_CENTROID_STRIDE} = 0
),
assign AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SQL_COS.format(a='e.embedding', b='c.cv')} DESC,
                      c.cent_id) AS r
    FROM embeddings e CROSS JOIN cent c
  ) WHERE r = 1
),
probes AS (
  SELECT query_id, cent_id AS list_id FROM (
    SELECT e.vec_id AS query_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SQL_COS.format(a='e.embedding', b='c.cv')} DESC,
                      c.cent_id) AS r
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id IN (0, 1, 2, 3, 4)
  ) WHERE r <= {_IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign a ON p.list_id = a.list_id
  WHERE a.vec_id != p.query_id
),
adc AS (
  SELECT cand.query_id, cand.vec_id,
         {' + '.join(
             f"MAX(CASE WHEN e.m = {m} THEN l.pdot END)"
             for m in range(_PQ_M)
         )} AS adc_dot
  FROM cand
  JOIN enc e ON e.vec_id = cand.vec_id
  JOIN lut l ON l.query_id = cand.query_id
            AND l.m = e.m AND l.cw_id = e.cw_id
  GROUP BY cand.query_id, cand.vec_id
),
ranked AS (
  SELECT query_id, vec_id, adc_dot,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dot DESC, vec_id) AS rnk
  FROM adc
)
SELECT query_id, vec_id, adc_dot, rnk FROM ranked WHERE rnk <= 5
"""

QUERIES = {
    "ann_ivfpq_topk": ann_ivfpq_topk,
}

ORACLES = {
    "ann_ivfpq_topk": ANN_IVFPQ_TOPK_SQL,
}
