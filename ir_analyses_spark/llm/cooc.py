"""Token co-occurrence association mining (lift / PMI family).

The collocation-statistics operator of corpus analysis (Church & Hanks
1990 introduced PMI for word association; "lift" is its exponentiated,
log-free form): for every token pair, how much more often do they share
a document than independence predicts?

    lift(x, y) = P(x, y) / (P(x) · P(y)) = c_xy · N / (c_x · c_y)

computed on DOCUMENT-LEVEL distinct tokens (a pair counts once per doc
that contains both). The log-free form is deliberate — the repo's
float discipline (`ops/helpers.py`, `tfidf_top_terms` precedent): all
counts are exact integers, the products stay well inside int64, and the
single IEEE division is bit-identical cross-engine, so the score column
hash-matches where ln-based PMI would need rounding conventions.
PMI itself = ln(lift), monotone in it — thresholds translate 1:1.

Scale shape: the pair stream comes from a per-doc self-join on doc_id
(each doc contributes |tokens|² /2 fixed-width pairs — the classic
co-occurrence shuffle; at web scale you bound it per doc with a window
cap or frequency floor first, and a blowup guard below REFUSES a
corpus whose Σ|tokens|² exceeds the pair budget — the
`llm/dedup._require_bounded_self_join` contract: an explicit error
beats an executor OOM), pair counts aggregate partial+final, and the
two unigram joins broadcast the unigram count table — broadcastable
precisely because the same frequency floor that bounds the pair stream
bounds the vocabulary; on an un-floored open-vocabulary corpus drop
the broadcast hint and let AQE pick the join side. The scalar N rides
a 1-row broadcast. Nothing re-touches text after the first distinct.

The `associated` cut (lift > 1.05) and its complement both fire at the
correctness SFs (pinned in tests/test_cooc.py — the synthetic corpus's
31-word vocabulary co-occurs near-independently, so lifts straddle 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: association threshold on lift (PMI > ln 1.05 ≈ 0.049)
_LIFT_CUT = 1.05
#: refuse per-doc self-joins past this many pair rows (dedup.py budget)
_PAIR_BUDGET = 100_000_000


def _require_bounded_pairs(toks: DataFrame) -> None:
    blowup = (
        toks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).alias("b"))
        .collect()[0]["b"]
    )
    if blowup and blowup > _PAIR_BUDGET:
        raise RuntimeError(
            f"pmi_cooccurrence: per-doc token self-join would produce "
            f"~{blowup:,} pair rows (> budget {_PAIR_BUDGET:,}) — apply "
            "a frequency floor or per-doc token cap before pairing"
        )


def cooccurrence_lift(docs: DataFrame) -> DataFrame:
    """(w1, w2, c_xy, c_x, c_y, lift, associated) over document-level
    distinct token pairs, w1 < w2."""
    # the token frame feeds FOUR consumers (guard, unigram counts, N,
    # both self-join sides) — checkpoint once so the explode + distinct
    # doesn't replay per consumer (the containment_nearup pattern)
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    _require_bounded_pairs(toks)
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n = toks.agg(F.countDistinct("doc_id").alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    scored = (
        pairs.join(
            F.broadcast(uni.withColumnsRenamed({"w": "w1", "c": "c_x"})), "w1"
        )
        .join(
            F.broadcast(uni.withColumnsRenamed({"w": "w2", "c": "c_y"})), "w2"
        )
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            (
                (F.col("c_xy") * F.col("n")).cast("double")
                / (F.col("c_x") * F.col("c_y"))
            ).alias("lift"),
        )
    )
    return scored.withColumn("associated", F.col("lift") > _LIFT_CUT)


def pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: document-level co-occurrence lift over the
    documents table."""
    return cooccurrence_lift(load_table(spark, "documents", sf_dir))


PMI_COOCCURRENCE_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w
  FROM documents
),
uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c_xy
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2
)
SELECT w1, w2, c_xy, u1.c AS c_x, u2.c AS c_y,
       CAST(c_xy * (SELECT n FROM n) AS DOUBLE) / (u1.c * u2.c) AS lift,
       CAST(c_xy * (SELECT n FROM n) AS DOUBLE) / (u1.c * u2.c)
         > {_LIFT_CUT} AS associated
FROM pairs JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w
"""

QUERIES = {"pmi_cooccurrence": pmi_cooccurrence}
ORACLES = {"pmi_cooccurrence": PMI_COOCCURRENCE_SQL}
