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
co-occurrence shuffle), pair counts aggregate partial+final, and the
two unigram joins CAN broadcast the unigram count table — legal
precisely when something bounds the vocabulary. The bounding knobs are
first-class parameters (r11 VERDICT item 3 — the first draft
hard-coded the broadcast and documented the mitigation its signature
didn't offer):

- ``min_token_docs`` — document-frequency floor: drop tokens seen in
  fewer than this many docs BEFORE pairing. This is the standard
  collocation-mining floor (Church & Hanks report pairs above a count
  floor for exactly this reason): it bounds the vocabulary (≤ N/floor
  tokens can survive), which is what makes ``broadcast_unigrams``
  legal, and it deflates the pair stream where it's widest (hapax
  tokens pair but can never reach support).
- ``max_doc_tokens`` — per-doc token cap: keep each doc's first
  ``max_doc_tokens`` distinct tokens (ordered by token — deterministic
  and oracle-replayable), bounding each doc's pair contribution to
  cap²/2 however long the doc is.
- ``broadcast_unigrams`` — the join-strategy hint. Default True (the
  floored/capped forms and the correctness SFs have KB-sized unigram
  tables); pass False on an un-floored open-vocabulary corpus and AQE
  picks the join side from runtime stats instead — a 100M-row
  "broadcast" is an executor OOM, not a hint.

The blowup guard below REFUSES a corpus whose Σ|tokens|² exceeds
``pair_budget`` AFTER flooring/capping (the
`llm/dedup._require_bounded_self_join` contract: an explicit error
beats an executor OOM) — so guard and floor COMPOSE: a corpus that
trips the budget raw can pass it floored (pinned in tests/test_cooc.py).
The scalar N rides a 1-row broadcast. Nothing re-touches text after
the first distinct.

The `associated` cut (lift > 1.05) and its complement both fire at the
correctness SFs (pinned in tests/test_cooc.py — the synthetic corpus's
31-word vocabulary co-occurs near-independently, so lifts straddle 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table

#: association threshold on lift (PMI > ln 1.05 ≈ 0.049)
_LIFT_CUT = 1.05
#: refuse per-doc self-joins past this many pair rows (dedup.py budget)
_PAIR_BUDGET = 100_000_000

#: the floored registry twin's knobs: floor 2 kills hapax tokens (the
#: widest pair fan-out), cap 24 bounds any doc's contribution to 276
#: pairs, and the broadcast hint is OFF — the exact open-vocabulary
#: posture the docstring prescribes, certified end to end
_FLOOR_MIN_DOCS = 2
_FLOOR_DOC_CAP = 24


def _require_bounded_pairs(toks: DataFrame, pair_budget: int) -> None:
    blowup = (
        toks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).alias("b"))
        .collect()[0]["b"]
    )
    if blowup and blowup > pair_budget:
        raise RuntimeError(
            f"pmi_cooccurrence: per-doc token self-join would produce "
            f"~{blowup:,} pair rows (> budget {pair_budget:,}) — apply "
            "a frequency floor (min_token_docs) or per-doc token cap "
            "(max_doc_tokens) before pairing"
        )


def cooccurrence_lift(
    docs: DataFrame,
    *,
    min_token_docs: int | None = None,
    max_doc_tokens: int | None = None,
    broadcast_unigrams: bool = True,
    pair_budget: int | None = None,
) -> DataFrame:
    """(w1, w2, c_xy, c_x, c_y, lift, associated) over document-level
    distinct token pairs, w1 < w2.

    ``min_token_docs`` floors tokens on document frequency and
    ``max_doc_tokens`` caps each doc's (token-ordered) contribution —
    both applied BEFORE the pair budget guard, so flooring a too-wide
    corpus is the documented path past the guard. All counts (c_x, c_y,
    N) are computed on the floored/capped token frame — lift is the
    association measure OF the corpus actually paired, not a mixture
    of two vocabularies. ``broadcast_unigrams=False`` drops the
    broadcast hint for open-vocabulary corpora (AQE picks the side).
    """
    if pair_budget is None:
        # resolved at call time, not def time: the module attr is the
        # operational knob (and tests shrink it to trip the guard)
        pair_budget = _PAIR_BUDGET
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    if min_token_docs is not None and min_token_docs > 1:
        # DF floor: survivors have doc-frequency ≥ floor, so the
        # surviving vocabulary is ≤ Σdocs/floor — the bound that makes
        # the unigram broadcast legal. left_semi: the keep-list never
        # widens rows, and AQE may broadcast it when it's small.
        keep = (
            toks.groupBy("w")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") >= min_token_docs)
            .select("w")
        )
        toks = toks.join(keep, "w", "left_semi")
    if max_doc_tokens is not None:
        # per-doc cap, token-ordered: deterministic (no sampling RNG),
        # replayed exactly by the DuckDB oracle; the window partitions
        # on doc_id — per-doc-sized state, no hot key
        w_ord = W.partitionBy("doc_id").orderBy("w")
        toks = (
            toks.withColumn("_r", F.row_number().over(w_ord))
            .filter(F.col("_r") <= max_doc_tokens)
            .drop("_r")
        )
    # the token frame feeds FOUR consumers (guard, unigram counts, N,
    # both self-join sides) — checkpoint once so the explode + distinct
    # (+ floor/cap) doesn't replay per consumer (containment_nearup
    # pattern)
    toks = toks.localCheckpoint(eager=True)
    _require_bounded_pairs(toks, pair_budget)
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n = toks.agg(F.countDistinct("doc_id").alias("n"))
    hint = F.broadcast if broadcast_unigrams else (lambda df: df)
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
        pairs.join(hint(uni.withColumnsRenamed({"w": "w1", "c": "c_x"})), "w1")
        .join(hint(uni.withColumnsRenamed({"w": "w2", "c": "c_y"})), "w2")
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
    documents table (un-floored — the correctness-SF vocabulary is
    31 words, so the broadcast default is the right call here)."""
    return cooccurrence_lift(load_table(spark, "documents", sf_dir))


def pmi_cooccurrence_floored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the OPEN-VOCABULARY posture of
    :func:`cooccurrence_lift`, certified end to end — document-
    frequency floor 2, per-doc cap 24, broadcast hint OFF (AQE picks
    the unigram join side). Same score algebra as `pmi_cooccurrence`;
    what changes is which tokens enter it, and the oracle replays the
    floor and the token-ordered cap exactly."""
    return cooccurrence_lift(
        load_table(spark, "documents", sf_dir),
        min_token_docs=_FLOOR_MIN_DOCS,
        max_doc_tokens=_FLOOR_DOC_CAP,
        broadcast_unigrams=False,
    )


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

PMI_COOCCURRENCE_FLOORED_SQL = f"""
WITH toks0 AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w
  FROM documents
),
keep AS (
  SELECT w FROM toks0 GROUP BY w
  HAVING COUNT(*) >= {_FLOOR_MIN_DOCS}
),
floored AS (
  SELECT t.doc_id, t.w FROM toks0 t JOIN keep k ON t.w = k.w
),
toks AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, w,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS r
    FROM floored
  ) WHERE r <= {_FLOOR_DOC_CAP}
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

QUERIES = {
    "pmi_cooccurrence": pmi_cooccurrence,
    "pmi_cooccurrence_floored": pmi_cooccurrence_floored,
}
ORACLES = {
    "pmi_cooccurrence": PMI_COOCCURRENCE_SQL,
    "pmi_cooccurrence_floored": PMI_COOCCURRENCE_FLOORED_SQL,
}
