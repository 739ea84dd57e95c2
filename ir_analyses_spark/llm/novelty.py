"""First-seen n-gram novelty scoring (LLM-pipeline ext).

A curation signal the dedup ladder doesn't give directly: for each
document, the fraction of its distinct word 3-grams that appear for the
FIRST time in corpus order (doc_id — the ingestion-order proxy the
synthetic tables encode). Low novelty means the doc is mostly n-grams
the corpus has already seen — boilerplate, templates, near-copies that
slipped under the pairwise thresholds; training-data pipelines use
exactly this family of signals to down-weight repetitive content
(cf. the repetition removal analysis in Gopher, Rae et al. 2021
§A.2.3, and C4's span-level "seen before" rule, Raffel et al. 2020 —
`llm/linedup.py` implements the span form; this is the document-level
score).

Scale shape (the design constraint): the gram TEXT never rides a
shuffle. Grams are hashed to a 60-bit integer at the scan projection
(`bloomdecon._md5_long` — the repo's portable md5 slice family, so the
DuckDB oracle reproduces the exact same keys), and everything after the
per-doc distinct is fixed-width (doc_id, hg) rows. Every downstream
step is a PARTIAL-AGGREGATING groupBy — deliberately NO window and NO
join-back on hg: the most frequent grams are universal boilerplate,
i.e. exactly what this operator measures, so an hg-partitioned window
would put 10^9 rows of "the same disclaimer" in one task; map-side
combine collapses each partition's contribution to a hot gram to ONE
row before it ships (third-review-pass fix; the first draft used a
window min):

1. distinct (doc_id, hg)                       — shuffle 1
2. n_ngrams:  groupBy doc_id count             — per-doc, partial
3. first_doc: groupBy hg min(doc_id)           — skew-safe partial
4. n_novel:   firsts groupBy first_doc count   — per-doc, partial
5. one per-doc-sized join of (2) and (4) — a doc with zero firsts
   left-fills n_novel = 0

First-seen semantics are defined OVER THE HASH: a 60-bit collision
merges two grams identically in both engines (deterministic, value-
parity preserved; at ~10^12 distinct grams expect ~400k collisions —
noise for a score, and the width is a parameter if it ever matters).

The `mostly_boilerplate` cut (4·n_novel < n_ngrams) and both score
extremes are non-vacuous at the correctness SFs (pinned by
tests/test_novelty.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from .bloomdecon import _md5_long, word_ngrams


def ngram_novelty_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ngrams, n_novel, novelty, mostly_boilerplate) over
    distinct hashed word 3-grams; `novelty` is one IEEE division of two
    exact integer counts (deterministic cross-engine)."""
    pairs = (
        word_ngrams(docs, distinct=False)
        .select("doc_id", _md5_long("g", 1).alias("hg"))
        .distinct()
        # feeds two aggregate consumers — materialize the distinct once
        .localCheckpoint(eager=True)
    )
    totals = pairs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    novel = (
        pairs.groupBy("hg")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    per_doc = totals.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_ngrams",
        F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
    )
    return per_doc.select(
        "doc_id",
        "n_ngrams",
        "n_novel",
        (F.col("n_novel") / F.col("n_ngrams")).alias("novelty"),
        (F.lit(4) * F.col("n_novel") < F.col("n_ngrams")).alias(
            "mostly_boilerplate"
        ),
    )


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: novelty scores over the documents table."""
    return ngram_novelty_scores(load_table(spark, "documents", sf_dir))


#: the gate twin's threshold: keep docs whose first-seen share is at
#: least 1/4 — both sides of the cut fire at the correctness SFs
_GATE_MIN_PERMILLE = 250


def novelty_gate(
    docs: DataFrame, *, min_novelty_permille: int = _GATE_MIN_PERMILLE
) -> DataFrame:
    """Funnel gate form (r11 VERDICT item 7 — the
    `bloom_decontaminate_filter` precedent): DROP documents whose
    first-seen n-gram share falls below ``min_novelty_permille``/1000
    (integer comparison — ``1000·n_novel < permille·n_ngrams`` — no
    float cut). ``docs`` needs (doc_id, text) plus any passthrough
    columns (all preserved). Docs too short to have a 3-gram cannot be
    scored and are KEPT — the word-count rule owns short-doc judgement,
    the same division of labor as the Bloom and perplexity stages.

    One left_anti join on doc_id against the (bounded, per-doc) drop
    list — the text column never rides the scoring shuffles
    (`ngram_novelty_scores` ships hashed-gram longs only).
    """
    dropped = (
        ngram_novelty_scores(docs.select("doc_id", "text"))
        .filter(
            F.lit(1000) * F.col("n_novel")
            < F.lit(min_novelty_permille) * F.col("n_ngrams")
        )
        .select("doc_id")
    )
    return docs.join(dropped, "doc_id", "left_anti")


def novelty_gate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the novelty gate applied to the documents table
    (the funnel-stage form, certified end to end — `llm/curate.py`
    wires this exact function as its ``novelty_filtered`` stage)."""
    return novelty_gate(
        load_table(spark, "documents", sf_dir).select(
            "doc_id", "lang", "text"
        )
    )


NGRAM_NOVELTY_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substring(md5(
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
             || ' ' || w[CAST(i AS INT) + 2]), 1, 15)) AS BIGINT) AS hg
  FROM toks, UNNEST(range(1, GREATEST(len(w) - 2, 0) + 1)) AS t(i)
),
firsts AS (
  SELECT doc_id, hg, MIN(doc_id) OVER (PARTITION BY hg) AS first_doc
  FROM grams
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_ngrams,
         CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM firsts GROUP BY 1
)
SELECT doc_id, n_ngrams, n_novel,
       n_novel * 1.0 / n_ngrams AS novelty,
       4 * n_novel < n_ngrams AS mostly_boilerplate
FROM per_doc
"""

#: the gate replayed in SQL: score exactly as NGRAM_NOVELTY_SQL, then
#: anti-join documents against the below-threshold drop list — unscored
#: (sub-3-word) docs have no per_doc row and survive the anti-join,
#: matching the Spark gate's short-doc KEEP
NOVELTY_GATE_DOCS_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substring(md5(
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
             || ' ' || w[CAST(i AS INT) + 2]), 1, 15)) AS BIGINT) AS hg
  FROM toks, UNNEST(range(1, GREATEST(len(w) - 2, 0) + 1)) AS t(i)
),
firsts AS (
  SELECT doc_id, hg, MIN(doc_id) OVER (PARTITION BY hg) AS first_doc
  FROM grams
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_ngrams,
         CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM firsts GROUP BY 1
),
dropped AS (
  SELECT doc_id FROM per_doc
  WHERE 1000 * n_novel < {_GATE_MIN_PERMILLE} * n_ngrams
)
SELECT d.doc_id, d.lang, d.text
FROM documents d ANTI JOIN dropped x ON d.doc_id = x.doc_id
"""

QUERIES = {
    "ngram_novelty": ngram_novelty,
    "novelty_gate_docs": novelty_gate_docs,
}
ORACLES = {
    "ngram_novelty": NGRAM_NOVELTY_SQL,
    "novelty_gate_docs": NOVELTY_GATE_DOCS_SQL,
}
