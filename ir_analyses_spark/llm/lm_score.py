"""Character n-gram language-model scoring for corpus curation
(SURVEY §2B LLM ext — the CCNet/Wenzek et al. 2019 perplexity filter,
arXiv:1911.00359 §4.3, with the LM trained IN the engine instead of
imported: one aggregation over a reference corpus produces the model,
a broadcast join scores any corpus against it).

Model: order-``n`` character LM with add-k smoothing.
P(c | ctx) = (count(ctx·c) + k) / (count(ctx·*) + k·V), V = alphabet
size + 1 (one unseen symbol). A document's score is its mean per-char
log-probability over all its n-gram windows; perplexity = exp(−score).
CCNet then buckets head/middle/tail by perplexity — reproduced here as
exact per-bucket ntiles.

Scale posture: training is ONE explode + (gram) count with map-side
partials — shuffle volume O(total chars), keys are ≤n-char strings.
The trained table is bounded by the alphabet (|Σ|ⁿ worst case,
thousands for char trigrams in practice) and broadcasts; ``max_grams``
caps it by frequency for pathological alphabets, with dropped grams
scored as unseen (documented approximation, monotone in the tail).
Scoring is explode → broadcast join → per-doc avg whose partial
aggregation collapses doc rows map-side (explode keeps a doc's rows
co-located), so the only corpus-wide shuffle carries one partial row
per (doc, partition).

Exactness: counts are exact integers with a DuckDB twin
(:func:`train_counts_sql`); log-probabilities are IEEE doubles checked
against an independent Python reference to 1e-9 relative tolerance in
`tests/test_lm_score.py` (ln and sum order are not bit-portable across
engines — the one documented tolerance in the curation surface).

New module per the evidence-ledger rule.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


def _char_ngrams(text_col, n: int):
    """Array of all n-char windows of ``text_col`` (empty when the text
    is shorter than n)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


@dataclass(frozen=True)
class CharLM:
    """A trained model: gram table + the scalars scoring needs.

    The gram table is persisted by ``train_char_lm``; call
    ``unpersist()`` (or use the model as a context manager) when done —
    a session training many models (e.g. per-language CCNet LMs) would
    otherwise accumulate cached tables for the process lifetime."""

    n: int
    k: float
    vocab_size: int  # V: distinct chars in training + 1 unseen symbol
    grams: DataFrame  # (gram, cnt, ctx_total)

    def unpersist(self) -> None:
        """Release the persisted gram table (idempotent)."""
        self.grams.unpersist()

    def __enter__(self) -> "CharLM":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()


def train_char_lm(
    docs: DataFrame,
    n: int = 3,
    k: float = 1.0,
    text_col: str = "text",
    max_grams: int | None = None,
) -> CharLM:
    """Train on ``docs[text_col]``; see module docstring for the math.

    ``max_grams`` keeps only the most frequent grams (ties broken by
    gram for determinism); dropped grams score as unseen.
    """
    if n < 2:
        raise ValueError("n must be >= 2 (needs a non-empty context)")
    if k <= 0:
        raise ValueError("k must be > 0")
    exploded = docs.select(
        F.explode(_char_ngrams(text_col, n)).alias("gram")
    )
    counts = exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    if max_grams is not None:
        counts = (
            counts.orderBy(F.desc("cnt"), "gram").limit(max_grams)
        )
    ctx = counts.groupBy(
        F.col("gram").substr(F.lit(1), F.lit(n - 1)).alias("ctx")
    ).agg(F.sum("cnt").alias("ctx_total"))
    grams = counts.join(
        ctx,
        counts["gram"].substr(F.lit(1), F.lit(n - 1)) == ctx["ctx"],
    ).select("gram", "cnt", "ctx_total")
    vocab = (
        docs.select(
            F.explode(F.split(F.col(text_col), "")).alias("ch")
        )
        .filter(F.col("ch") != "")
        .agg(F.count_distinct("ch").alias("v"))
        .collect()[0]["v"]
    )
    # the model is alphabet-bounded (module docstring) and every scoring
    # action reads it twice (gram join + ctx join) — persist so training
    # runs once, not once per scored corpus per join
    grams = grams.persist()
    return CharLM(n=n, k=k, vocab_size=int(vocab) + 1, grams=grams)


def train_counts_sql(table: str, n: int = 3) -> str:
    """DuckDB twin of the exact-integer gram/context counts."""
    if not re.fullmatch(r"\w+", table):
        raise ValueError(f"table must be an identifier, got {table!r}")
    return f"""
WITH grams AS (
  SELECT unnest(
    list_transform(range(1, length(text) - {n - 2}),
                   i -> substr(text, i, {n}))
  ) AS gram
  FROM {table}
  WHERE length(text) >= {n}
), counts AS (
  SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram
), ctx AS (
  SELECT substr(gram, 1, {n - 1}) AS c, SUM(cnt) AS ctx_total
  FROM counts GROUP BY substr(gram, 1, {n - 1})
)
SELECT gram, CAST(cnt AS BIGINT) AS cnt, CAST(ctx_total AS BIGINT) AS ctx_total
FROM counts JOIN ctx ON substr(gram, 1, {n - 1}) = c
"""


def score_with_lm(
    docs: DataFrame, lm: CharLM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_grams, logprob_per_char, perplexity) per document.

    Unseen gram in a seen context → (k)/(ctx_total + kV); unseen
    context → 1/V. Documents shorter than n chars score NULL (no
    evidence either way — the caller quarantines, the scorer does not
    guess).
    """
    exploded = docs.select(
        "doc_id", F.explode_outer(_char_ngrams(text_col, lm.n)).alias("gram")
    )
    ctx_totals = lm.grams.select(
        F.col("gram").substr(F.lit(1), F.lit(lm.n - 1)).alias("ctx"),
        "ctx_total",
    ).distinct()
    joined = (
        exploded.join(F.broadcast(lm.grams), "gram", "left")
        .withColumn("ctx", F.col("gram").substr(F.lit(1), F.lit(lm.n - 1)))
        .drop("ctx_total")
        .join(F.broadcast(ctx_totals), "ctx", "left")
    )
    kv = F.lit(float(lm.k)) * F.lit(float(lm.vocab_size))
    logp = F.when(
        F.col("gram").isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.log(
            (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(float(lm.k)))
            / (F.coalesce(F.col("ctx_total"), F.lit(0)).cast("double") + kv)
        )
    )
    return (
        joined.select("doc_id", logp.alias("logp"))
        .groupBy("doc_id")
        .agg(
            F.count("logp").alias("n_grams"),
            F.avg("logp").alias("logprob_per_char"),
        )
        .select(
            "doc_id",
            "n_grams",
            "logprob_per_char",
            F.exp(-F.col("logprob_per_char")).alias("perplexity"),
        )
    )


def perplexity_buckets(
    scored: DataFrame, n_buckets: int = 3
) -> DataFrame:
    """CCNet's head/middle/tail split, the way CCNet actually does it:
    exact percentile CUTOFFS (one distributed aggregation, n_buckets−1
    doubles collected) and a threshold assignment on the scan — never a
    global no-partition window, which would funnel every (doc_id,
    perplexity) pair through one task. Bucket 1 is the most fluent;
    ties land in the lower bucket; NULL-scored docs keep a NULL bucket.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = (
        scored.filter(F.col("perplexity").isNotNull())
        .agg(
            F.expr(
                "percentile(perplexity, array("
                + ", ".join(str(q) for q in qs)
                + "))"
            ).alias("cuts")
        )
        .collect()[0]
    )
    cuts = row["cuts"] or []
    bucket = F.lit(1)
    for c in cuts:
        bucket = bucket + (F.col("perplexity") > F.lit(float(c))).cast("int")
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col("perplexity").isNotNull(), bucket).cast("int"),
    )
