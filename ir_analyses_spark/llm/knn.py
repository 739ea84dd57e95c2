"""k-NN label classification over the embeddings table (LLM ext).

The evaluation loop every embedding pipeline needs: given a labeled
train split, predict each held-out vector's label from its k nearest
neighbors by cosine, majority vote. This is the downstream consumer the
ANN ladder (`llm/similarity.py`) exists to accelerate — the certificate
here runs the exact brute-force form; swapping the neighbor source for
`ann_ivf_topk`/LSH buckets is the documented production path, same as
the dedup ladder's verify-tier / scale-tier split.

Determinism discipline (inherited from `llm/similarity.py`): cosine is
the in-order double fold both engines compute identically; neighbor
ranking tiebreaks on vec_id; the vote tiebreaks on (count DESC, label
ASC) — every step totally ordered, so the prediction is a pure function
of the data, reproducible bit-for-bit in the DuckDB oracle.

Scale shape: the held-out side is broadcast (bounded query set), so the
candidate scan is embarrassingly parallel; per query only k rows
survive into the vote, and the vote aggregates k·|test| fixed-width
rows. At 10^9 candidates the only change is the neighbor source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table
from .similarity import _SQL_DOT, _SQL_NORM, _dot_col, _with_norm

#: held-out split: every 10th vector
_TEST_MOD = 10
#: neighbors per prediction
_K = 5


def knn_predictions(emb: DataFrame, k: int = _K) -> DataFrame:
    """(vec_id, true_label, pred_label, votes, correct) for the held-out
    split of a (vec_id, embedding, label) frame."""
    emb = _with_norm(emb, "embedding", "enorm")
    test = emb.filter(F.col("vec_id") % _TEST_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("enorm").alias("qnorm"),
        F.col("label").alias("true_label"),
    )
    train = emb.filter(F.col("vec_id") % _TEST_MOD != 0)
    pairs = train.join(F.broadcast(test), F.lit(True))
    scored = pairs.select(
        "q_id",
        "true_label",
        F.col("label").alias("n_label"),
        "vec_id",
        (_dot_col("embedding", "qv") / (F.col("enorm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    nn = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    topk = scored.withColumn("rnk", F.row_number().over(nn)).filter(
        F.col("rnk") <= k
    )
    votes = topk.groupBy("q_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    best = W.partitionBy("q_id").orderBy(F.col("votes").desc(), F.col("n_label"))
    return (
        votes.withColumn("vrnk", F.row_number().over(best))
        .filter(F.col("vrnk") == 1)
        .select(
            F.col("q_id").alias("vec_id"),
            "true_label",
            F.col("n_label").alias("pred_label"),
            "votes",
            (F.col("n_label") == F.col("true_label")).alias("correct"),
        )
    )


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: 5-NN cosine majority-vote over embeddings."""
    return knn_predictions(load_table(spark, "embeddings", sf_dir))


KNN_CLASSIFY_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding, label,
         {_SQL_NORM.format(a='embedding')} AS enorm
  FROM embeddings
),
test AS (
  SELECT vec_id AS q_id, embedding AS qv, enorm AS qnorm,
         label AS true_label
  FROM emb WHERE vec_id % {_TEST_MOD} = 0
),
train AS (SELECT * FROM emb WHERE vec_id % {_TEST_MOD} <> 0),
scored AS (
  SELECT t.q_id, t.true_label, tr.label AS n_label, tr.vec_id,
         {_SQL_DOT.format(a='tr.embedding', b='t.qv')}
           / (tr.enorm * t.qnorm) AS cosine
  FROM train tr CROSS JOIN test t
),
topk AS (
  SELECT q_id, true_label, n_label,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
),
votes AS (
  SELECT q_id, true_label, n_label, COUNT(*) AS votes
  FROM topk WHERE rnk <= {_K}
  GROUP BY 1, 2, 3
),
best AS (
  SELECT q_id, true_label, n_label, votes,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY votes DESC, n_label) AS vrnk
  FROM votes
)
SELECT q_id AS vec_id, true_label, n_label AS pred_label, votes,
       n_label = true_label AS correct
FROM best WHERE vrnk = 1
"""

QUERIES = {"knn_classify": knn_classify}
ORACLES = {"knn_classify": KNN_CLASSIFY_SQL}
