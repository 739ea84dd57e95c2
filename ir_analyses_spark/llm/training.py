"""Training-set assembly operators: deterministic train/val/test splits
and contrastive negative sampling — the last mile between a cleaned
corpus and a training job.

Determinism discipline (same as sampling.py's stratified quota): every
pseudo-random choice is MULTIPLICATIVE HASHING on exact integers —
(id · KNUTH) mod M — identical arithmetic in Spark and the oracle, so
splits and negatives are reproducible run-to-run, engine-to-engine, and
under any partitioning. No rand(), no engine RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: Knuth's 2^32 multiplicative constant. The SPLIT arithmetic uses pmod,
#: not %, because Spark's % keeps the dividend sign: xxhash64-derived
#: doc_ids (what llm/curate.py produces) are negative half the time and
#: a sign-keeping mod would dump that half into 'train', starving
#: val/test (r7 ADVICE; measured ~95.3/2.3/2.4 vs the documented
#: 90/5/5). The id is additionally reduced mod 100 BEFORE the multiply
#: (r8 ADVICE): the raw product would wrap two's-complement in Spark
#: but RAISE in DuckDB — pre-reduction keeps both engines in exact
#: agreement at every id magnitude, same as mixture._priority.
_KNUTH = 2654435761
#: second-stream constant (decouples the negative draws from the split)
_STRIDE = 40503
_N_NEG = 4


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split of the corpus with a
    per-(split, lang) stratification report — the audit table checked
    before a training run (is val's language mixture the same as train's?).

    One scan, one small partial+final agg; the split decision is a pure
    projection, so at 100 TB this runs at scan speed and the assignment
    can be recomputed anywhere (no persisted split column needed)."""
    docs = load_table(spark, "documents", sf_dir)
    # reduce doc_id mod 100 BEFORE the multiply (r8 ADVICE): xxhash64-
    # derived ids are full-range int64 and a raw id·KNUTH product
    # overflows — Spark wraps two's-complement but the DuckDB oracle
    # RAISES for |doc_id| >= ~3.5e9. (r mod 100)·KNUTH < 2^38 in every
    # engine, and gcd(KNUTH mod 100, 100) = 1 keeps the cell a
    # permutation of 0..99 (same uniformity, same pmod sign-freedom).
    cell = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(100)) * F.lit(_KNUTH), F.lit(100)
    )
    split = (
        F.when(cell < 90, "train").when(cell < 95, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


DATASET_SPLIT_SQL = f"""
-- doc_id is reduced mod 100 BEFORE the multiply, mirroring the Spark
-- side: the raw product overflows DuckDB's strict int64 for
-- |doc_id| >= ~3.5e9 (full-range xxhash64 ids)
WITH cells AS (
  SELECT ((doc_id % 100 + 100) % 100) * {_KNUTH} % 100 AS cell, lang
  FROM documents
)
SELECT CASE WHEN cell < 90 THEN 'train'
            WHEN cell < 95 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs
FROM cells
GROUP BY 1, 2
ORDER BY split, lang
"""


def negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=4 deterministic contrastive negatives per anchor embedding:
    negative j of anchor i is row (i·KNUTH + j·STRIDE) mod N over the
    DENSE vec_id domain; a self-draw re-draws to the NEXT id (mod N), so
    every anchor gets EXACTLY K negatives — a skip-on-collision would
    silently hand downstream consumers K−1 for that anchor. (N=1 is the
    only degenerate case: the sole row draws itself; guarded by the
    anchor≠negative invariant test, not reachable on real corpora.)
    Emits the anchor/negative labels and whether the draw is a false
    negative (same label) — the statistic contrastive pipelines monitor.

    Scale shape: the draw is a projection (explode k per anchor, integer
    arithmetic — no RNG state), and resolving each negative's label is
    ONE hash join keyed on vec_id against the same table, shuffling only
    (id, label) pairs — embedding vectors never move."""
    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.agg(F.count(F.lit(1)).alias("n_vecs"))
    anchors = emb.select("vec_id", F.col("label").alias("anchor_label"))
    draws = (
        anchors.crossJoin(F.broadcast(n))
        .select(
            "vec_id",
            "anchor_label",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, _N_NEG + 1)])
            ).alias("j"),
            "n_vecs",
        )
        .withColumn(
            "draw",
            (F.col("vec_id") * _KNUTH + F.col("j") * _STRIDE) % F.col("n_vecs"),
        )
        .withColumn(
            "neg_id",
            F.when(
                F.col("draw") == F.col("vec_id"),
                (F.col("draw") + 1) % F.col("n_vecs"),
            ).otherwise(F.col("draw")),
        )
        .drop("draw")
    )
    negs = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
    )
    return (
        draws.join(negs, "neg_id")
        .select(
            "vec_id",
            "j",
            "neg_id",
            "anchor_label",
            "neg_label",
            (F.col("anchor_label") == F.col("neg_label")).alias(
                "is_false_negative"
            ),
        )
        .orderBy("vec_id", "j")
    )


NEGATIVE_SAMPLING_SQL = f"""
WITH n AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
draws AS (
  SELECT e.vec_id, e.label AS anchor_label, j.j,
         (e.vec_id * {_KNUTH} + j.j * {_STRIDE}) % n.n_vecs AS draw,
         n.n_vecs
  FROM embeddings e, n, (VALUES (1), (2), (3), (4)) AS j(j)
),
resolved AS (
  SELECT vec_id, anchor_label, j,
         CASE WHEN draw = vec_id THEN (draw + 1) % n_vecs ELSE draw END
           AS neg_id
  FROM draws
)
SELECT d.vec_id, d.j, d.neg_id, d.anchor_label,
       e2.label AS neg_label,
       d.anchor_label = e2.label AS is_false_negative
FROM resolved d JOIN embeddings e2 ON d.neg_id = e2.vec_id
ORDER BY d.vec_id, d.j
"""


QUERIES = {
    "dataset_split": dataset_split,
    "negative_sampling": negative_sampling,
}

ORACLES = {
    "dataset_split": DATASET_SPLIT_SQL,
    "negative_sampling": NEGATIVE_SAMPLING_SQL,
}
