"""Corpus sampling & decontamination for training-data pipelines.

Two operations every pretraining data build runs after dedup/quality:

- **benchmark decontamination** — remove training documents that share
  n-gram content with a held-out evaluation set, so benchmark answers
  don't leak into the training corpus. Scale shape: the benchmark side is
  tiny relative to the corpus, so its shingle set broadcasts and the
  corpus-side shingle stream is filtered map-side — the corpus never
  shuffles for the overlap test.
- **stratified sampling** — deterministic per-stratum downsampling to hit
  a target mixture (e.g. cap the dominant language). Hash-free integer
  arithmetic on the key keeps the selection reproducible across engines
  and across runs — resampling with a different quota keeps every
  previously-selected doc whose bucket is still under quota (stable
  mixtures, the property mixture tuning needs).

Both are pure column expressions + joins — no UDFs, fully
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from .dedup import shingles

#: deterministic stand-in for a held-out benchmark: every 53rd doc. In a
#: real pipeline this is the eval-set table; the operator shape is the same.
_BENCH_MOD = 53

#: Knuth multiplicative constant: spreads sequential doc_ids uniformly over
#: buckets while staying exactly representable in 64-bit integer arithmetic
#: in both engines (doc_id * c < 2^63 for doc_id < 3.5e9 — at larger scale
#: use pmod(xxhash64(key)) engine-side).
_MIX = 2654435761


def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs whose shingle CONTAINMENT in the benchmark set is
    below 1/2: keep doc iff 2·|shingles ∩ bench| < |shingles| (integer
    form — no float-boundary divergence between engines). Production
    pipelines use word-13-gram containment; the 8-char-shingle shape here
    is identical.

    Scale shape: benchmark shingles are distinct-ed and broadcast, so the
    containment join is map-side against the corpus shingle stream. The
    corpus TEXT never shuffles; what does shuffle is the per-doc distinct
    of fixed-width (doc_id, shingle) pairs that set-containment requires
    (dedup is a shuffle whichever way it is spelled — ``distinct`` or
    two-phase count-distinct — and explode keeps each doc's shingles in
    one partition, so the partial phase dedups map-side first). At larger
    shingle widths you'd hash the shingle to a long before the dedup to
    bound the shuffled row at 16 bytes.

    Threshold domain (r6 review note): the cut is non-vacuous at the
    correctness SFs (keeps 370/490 at sf0.001, 425/490 at sf0.01 —
    pinned by test_vacuity_guards), but at sf0.1 the SYNTHETIC corpus's
    ~31-token vocabulary saturates the 8-char shingle space — the ~95
    benchmark docs then cover ≥50% of every training doc's shingles and
    the keep branch goes empty. That is a property of the generator's
    tiny vocabulary (a real corpus's shingle space does not saturate),
    not of the operator; production use would widen to word 13-grams as
    the docstring notes, which never saturate.
    """
    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
    train = docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    # duplicate-insensitive consumer: the per-(doc_id, g) dedup inside
    # shingles() would shuffle the pair stream only to discard doc_id on
    # the next line — distinct the bare shingle column instead (one
    # shuffle, not two; review-caught). train keeps set semantics: the
    # containment ratio counts DISTINCT shingles per doc.
    bench_sh = shingles(bench, distinct=False).select("g").distinct()
    train_sh = shingles(train)
    stats = (
        train_sh.join(
            F.broadcast(bench_sh.withColumn("_hit", F.lit(1))), "g", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("_hit").alias("shared"),
        )
    )
    clean = stats.filter(2 * F.col("shared") < F.col("n")).select("doc_id")
    return (
        train.join(clean, "doc_id", "left_semi")
        .select("doc_id", "lang", "source", "n_chars")
    )


BENCHMARK_DECONTAMINATE_SQL = f"""
WITH bench_sh AS (
  SELECT DISTINCT substring(text, CAST(i AS INT), 8) AS g
  FROM documents,
       UNNEST(range(1, GREATEST(length(text) - 7, 1) + 1)) AS t(i)
  WHERE doc_id % {_BENCH_MOD} = 0
),
train_sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 8) AS g
  FROM documents,
       UNNEST(range(1, GREATEST(length(text) - 7, 1) + 1)) AS t(i)
  WHERE doc_id % {_BENCH_MOD} <> 0
),
stats AS (
  SELECT s.doc_id,
         COUNT(*) AS n,
         COUNT(b.g) AS shared
  FROM train_sh s LEFT JOIN bench_sh b ON s.g = b.g
  GROUP BY 1
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d JOIN stats ON d.doc_id = stats.doc_id
WHERE 2 * shared < n
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: per-language quota (percent) applied
    by bucketing each doc_id into 100 pseudo-random but reproducible
    buckets. One scan, one map-side filter — no shuffle, no RNG state; the
    selection is a pure function of (doc_id, lang), so reruns and
    backfills select identical rows.
    """
    docs = load_table(spark, "documents", sf_dir)
    bucket = (F.col("doc_id") * F.lit(_MIX)) % 100
    quota = (
        F.when(F.col("lang") == "en", F.lit(10))
        .when(F.col("lang") == "ja", F.lit(50))
        .otherwise(F.lit(25))
    )
    return (
        docs.filter(bucket < quota)
        .select("doc_id", "lang", "source", "n_chars")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (doc_id * {_MIX}) % 100 <
      CASE lang WHEN 'en' THEN 10 WHEN 'ja' THEN 50 ELSE 25 END
"""


#: training-sequence length for packing (tokens per bin)
_SEQ_LEN = 256
#: shards for scale-safe prefix sums — packing is per-shard, so the window
#: cumsum never needs a single global partition
_N_SHARDS = 16


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    within each shard, documents are laid end-to-end in doc_id order and
    the token stream is cut every ``_SEQ_LEN`` tokens; each doc reports its
    token offset and the bin range it spans.

    Scale shape: a running SUM window PARTITIONED by shard — the prefix
    sum that would be a single-partition scale-killer globally becomes an
    embarrassingly parallel per-shard pass (training shards are exactly
    this independent in practice). One shuffle on the shard key; all
    outputs are exact integers.
    """
    docs = load_table(spark, "documents", sf_dir)
    from pyspark.sql import Window

    n_tok = F.size(F.split("text", " ")).cast("bigint")
    shard = (F.col("doc_id") % _N_SHARDS).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        "doc_id", shard, n_tok.alias("n_tokens")
    ).withColumn("tok_end", F.sum("n_tokens").over(w))
    return with_cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("tok_end") - F.col("n_tokens")).alias("tok_start"),
        F.floor((F.col("tok_end") - F.col("n_tokens")) / _SEQ_LEN).alias(
            "first_bin"
        ),
        F.floor((F.col("tok_end") - 1) / _SEQ_LEN).alias("last_bin"),
    )


SEQUENCE_PACKING_SQL = f"""
WITH base AS (
  SELECT doc_id,
         doc_id % {_N_SHARDS} AS shard,
         LEN(STRING_SPLIT(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS tok_end
  FROM base
)
SELECT doc_id, shard, n_tokens,
       tok_end - n_tokens AS tok_start,
       CAST(FLOOR((tok_end - n_tokens) / {_SEQ_LEN}) AS BIGINT) AS first_bin,
       CAST(FLOOR((tok_end - 1) / {_SEQ_LEN}) AS BIGINT) AS last_bin
FROM cum
"""


QUERIES = {
    "benchmark_decontaminate": benchmark_decontaminate,
    "stratified_sample": stratified_sample,
    "sequence_packing": sequence_packing,
}

ORACLES = {
    "benchmark_decontaminate": BENCHMARK_DECONTAMINATE_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "sequence_packing": SEQUENCE_PACKING_SQL,
}
