"""Similarity search over embedding columns (SURVEY §2B LLM ext):
brute-force cosine top-k (exact baseline) and LSH-bucketed ANN (scale path).

Determinism discipline: dot products accumulate as decimal(38,12) over
double-cast elements (associative, order-insensitive), so the score — and
therefore the top-k *selection* — is bit-identical across engines and
partitionings; ranking tiebreaks on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table

#: deterministic query set: first 5 vectors
_QUERY_IDS = [0, 1, 2, 3, 4]
_TOP_K = 5

# Sequential left-fold dot product in doubles: aggregate(…, 0.0, acc+v) is
# an in-order fold, so the result is a *deterministic* IEEE value — the same
# value any engine computes folding the same products in index order (DuckDB
# twin: list_reduce). Order-insensitivity is NOT required here because the
# fold order is part of the operator contract; no decimal casts, no ulp
# drift from binary↔decimal rounding.
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v))"
)


def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: 5 query vectors × all candidates, rank per query
    (§2B brute-force baseline).

    The query side is broadcast (k vectors), so the candidate scan is
    embarrassingly parallel and shuffles only k×top_k rows for the final
    rank — the right physical shape even at 10^9 candidates.
    """
    emb = load_table(spark, "embeddings", sf_dir)
    q = (
        emb.filter(F.col("vec_id").isin(_QUERY_IDS))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        (
            F.expr(_DOT.format(a="embedding", b="qv"))
            / (
                F.expr(_NORM.format(a="embedding"))
                * F.expr(_NORM.format(a="qv"))
            )
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


_SQL_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
    "(acc, v) -> acc + v)"
)
_SQL_NORM = (
    "SQRT(list_reduce(list_transform({a}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
)

ANN_BRUTE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, e.vec_id,
         {_SQL_DOT.format(a='e.embedding', b='q.qv')}
           / ({_SQL_NORM.format(a='e.embedding')} * {_SQL_NORM.format(a='q.qv')})
           AS cosine
  FROM embeddings e JOIN q ON e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
"""


def _random_hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component h[p][d] derives
    from a hash of (p, d) — reproducible across runs with no RNG state."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.sha256(f"plane:{p}:{d}".encode()).digest()[:8], "big"
            )
            row.append((h / 2**63) - 1.0)  # ≈ uniform [-1, 1)
        planes.append(row)
    return planes


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 16-bit sign bucket + multiprobe within
    bucket, exact cosine re-rank (scale path; rows-only check — bucket
    recall is probabilistic by design).

    At 10^9+ candidates the bucket join replaces the full scan: candidates
    shuffle by bucket id, each query probes its own bucket only.
    """
    emb = load_table(spark, "embeddings", sf_dir)
    planes = _random_hyperplanes(64, 16)
    plane_lits = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in planes]
    )
    with_bucket = emb.select(
        "vec_id",
        "embedding",
        F.aggregate(
            F.transform(
                plane_lits,
                lambda p: F.when(
                    F.aggregate(
                        F.zip_with(
                            p,
                            F.col("embedding"),
                            lambda a, b: a * b.cast("double"),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    >= 0,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, bit: acc * 2 + bit,
        ).alias("bucket"),
    )
    q = (
        with_bucket.filter(F.col("vec_id").isin(_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
    )
    candidates = with_bucket.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = candidates.select(
        "query_id",
        "vec_id",
        (
            F.expr(_DOT.format(a="embedding", b="qv"))
            / (F.expr(_NORM.format(a="embedding")) * F.expr(_NORM.format(a="qv")))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


def embedding_cosine_nearup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine > 0.95) by label-block
    prefilter (§2B embedding near-dup): same-label vectors only, exact
    cosine — the all-pairs version of similarity search used for semantic
    dedup. Blocking on `label` (a cluster id) bounds the quadratic term."""
    emb = load_table(spark, "embeddings", sf_dir)
    a = emb.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"),
        F.col("label").alias("label2"),
    )
    return (
        a.join(b, (F.col("label") == F.col("label2")) & (F.col("v1") < F.col("v2")))
        .select(
            "v1",
            "v2",
            (
                F.expr(_DOT.format(a="e1", b="e2"))
                / (F.expr(_NORM.format(a="e1")) * F.expr(_NORM.format(a="e2")))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") > 0.95)
    )


EMBEDDING_COSINE_NEARDUP_SQL = f"""
SELECT a.vec_id AS v1, b.vec_id AS v2,
       {_SQL_DOT.format(a='a.embedding', b='b.embedding')}
         / ({_SQL_NORM.format(a='a.embedding')} * {_SQL_NORM.format(a='b.embedding')})
         AS cosine
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_SQL_DOT.format(a='a.embedding', b='b.embedding')}
        / ({_SQL_NORM.format(a='a.embedding')} * {_SQL_NORM.format(a='b.embedding')})
        > 0.95
"""


QUERIES = {
    "ann_brute_topk": ann_brute_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_cosine_nearup": embedding_cosine_nearup,
}

ORACLES = {
    "ann_brute_topk": ANN_BRUTE_TOPK_SQL,
    # ann_lsh_topk: probabilistic bucket recall → rows-only by design
    "embedding_cosine_nearup": EMBEDDING_COSINE_NEARDUP_SQL,
}
