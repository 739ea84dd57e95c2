"""Benchmark-leakage audit: the EVAL-SIDE report that complements the
corpus-side Bloom decontamination gate (`llm/bloomdecon.py`).

The gate answers "which training docs must drop"; an eval owner needs
the opposite direction — "which of MY benchmark items leak into the
corpus, and how much" — because a leaked item stays compromised even
after the gate drops the offending training docs it found (other
near-copies may survive any threshold, and eval scores on that item
are suspect either way). This is the per-item overlap report every
contamination study publishes (e.g. the n-gram overlap audits of the
GPT-3/PaLM appendices): for each benchmark doc, the share of its
distinct word 3-grams that occur ANYWHERE in the training corpus —
EXACT counts, not the gate's Bloom approximation (an audit must not
carry false positives; the gate trades exactness for O(m bits) of
state, the audit pays one corpus pass for the truth).

Gram semantics are shared BY CONSTRUCTION with the gate
(`bloomdecon.word_ngrams` — whitespace word 3-grams, per-doc
distinct, sub-n docs contribute nothing), so the two surfaces can
never disagree about what a "3-gram" is.

Scale shape: the benchmark side is an eval suite — thousands of
items, not billions — so its distinct gram set BROADCASTS; the corpus
makes ONE map-side pass (no per-doc distinct: dedup happens after the
broadcast-join cut, on the matched-gram stream, which is bounded by
the BENCHMARK's gram count, not the corpus's). Nothing
corpus-cardinality ever shuffles: the only aggregations run on
benchmark-sized frames.

Reference parity: the reference app has no decontamination surface at
all; this module is LLM-pipeline capability closure (the audit half of
the r11 bloomdecon operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from .bloomdecon import word_ngrams

#: eval-set split for the certificate: every 37th doc plays the
#: benchmark. Distinct from bloomdecon's 41 and sampling's 53 so the
#: three decontamination-family operators keep independent fixtures.
_BENCH_MOD = 37


def benchmark_leak_report(
    bench_docs: DataFrame, corpus_docs: DataFrame
) -> DataFrame:
    """(doc_id, n_grams, n_leaked, leak_permille) per BENCHMARK doc:
    how many of its distinct word 3-grams occur anywhere in the
    training corpus, exactly. ``leak_permille`` is the integer share
    ``1000·n_leaked div n_grams`` (truncating div — the repo's
    cross-engine integer-ratio discipline). Benchmark docs with fewer
    than 3 tokens have no grams and no row (the `word_ngrams`
    contract; the eval owner's item-length rules own those)."""
    bench_grams = word_ngrams(bench_docs)
    bset = bench_grams.select("g").distinct()
    # one corpus pass, cut by the broadcast benchmark set BEFORE any
    # dedup — the matched stream is bounded by the benchmark's gram
    # count, so the distinct is benchmark-sized, never corpus-sized
    leaked = (
        word_ngrams(corpus_docs, distinct=False)
        .select("g")
        .join(F.broadcast(bset), "g")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        bench_grams.join(F.broadcast(leaked), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_leaked"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_leaked",
            F.expr("1000 * n_leaked div n_grams").alias("leak_permille"),
        )
    )


def benchmark_leak_report_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry entry: every 37th documents-table doc plays the
    benchmark, the rest the corpus; the synthetic corpus repeats real
    3-grams across docs, so leakage is partial — the report separates
    fully-leaked, partially-leaked, and clean items (pinned
    non-vacuous in tests)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return benchmark_leak_report(
        docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
        docs.filter(F.col("doc_id") % _BENCH_MOD != 0),
    )


BENCHMARK_LEAK_REPORT_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
           || ' ' || w[CAST(i AS INT) + 2] AS g
  FROM toks, UNNEST(range(1, GREATEST(len(w) - 2, 0) + 1)) AS t(i)
),
bgrams AS (SELECT doc_id, g FROM grams WHERE doc_id % {_BENCH_MOD} = 0),
leaked AS (
  SELECT DISTINCT b.g
  FROM (SELECT DISTINCT g FROM bgrams) b
  JOIN (
    SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} <> 0
  ) c ON b.g = c.g
)
SELECT b.doc_id AS doc_id,
       COUNT(*) AS n_grams,
       CAST(COUNT(l.g) AS BIGINT) AS n_leaked,
       CAST(1000 * COUNT(l.g) // COUNT(*) AS BIGINT) AS leak_permille
FROM bgrams b LEFT JOIN leaked l ON b.g = l.g
GROUP BY b.doc_id
"""

QUERIES = {"benchmark_leak_report": benchmark_leak_report_query}
ORACLES = {"benchmark_leak_report": BENCHMARK_LEAK_REPORT_SQL}
