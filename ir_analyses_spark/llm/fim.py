"""Fill-in-the-middle (FIM) training transform — Bavarian et al. 2022,
"Efficient Training of Language Models to Fill in the Middle".

The data-side half of FIM training: split a fraction of documents into
(prefix, middle, suffix) at deterministic points and re-serialize in
PSM order with sentinel tokens —

    <|fim_pre|>prefix<|fim_suf|>suffix<|fim_mid|>middle

so the model learns infilling from the same corpus bytes. The paper
applies the transform to a random fraction (their default 0.5) and
leaves the rest autoregressive; here the "random" choices are the
repo's deterministic-hash discipline (`llm/training.dataset_split`
precedent): apply iff doc_id is even, and draw both cut points from
disjoint 60-bit md5 slices of the doc_id — reproducible anywhere,
exactly recomputable by the DuckDB oracle.

Cut-point contract (all integer arithmetic on character lengths):
prefix ≥ 1 char, middle ≥ 1 char, suffix ≥ 9 chars; docs shorter than
30 chars (or in the autoregressive half) pass through untransformed
with ``fim_applied = false`` and NULL middle/suffix. Losslessness —
prefix || middle || suffix == text for every transformed doc — is a
column the oracle hashes and a test asserts, so a off-by-one in either
engine's substring arithmetic cannot ship silently.

Scale shape: pure per-row projection (hash, three substrings, one
concat) — no shuffle at all; the transform belongs at the end of the
export pipeline where `llm/export.py` shards the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from .bloomdecon import _md5_long

#: minimum transformable length: 1 prefix + 1 middle + 9 suffix + slack
_MIN_CHARS = 30
PRE, SUF, MID = "<|fim_pre|>", "<|fim_suf|>", "<|fim_mid|>"


def fim_transform(docs: DataFrame) -> DataFrame:
    """(doc_id, fim_applied, prefix, middle, suffix, psm_text,
    lossless) — PSM fill-in-the-middle over the deterministic half of
    the corpus."""
    key = F.col("doc_id").cast("string")
    n = F.length("text")
    eligible = (F.col("doc_id") % 2 == 0) & (n >= _MIN_CHARS)
    a = F.lit(1) + _md5_long(key, 1) % (n - 20)
    staged = docs.select(
        "doc_id", "text", eligible.alias("fim_applied"), a.alias("_a")
    ).withColumn(
        "_b",
        F.col("_a")
        + 1
        + _md5_long(key, 17) % (F.length("text") - F.col("_a") - 9),
    )
    out = staged.select(
        "doc_id",
        "fim_applied",
        F.when(
            F.col("fim_applied"), F.expr("substring(text, 1, _a)")
        )
        .otherwise(F.col("text"))
        .alias("prefix"),
        F.when(
            F.col("fim_applied"), F.expr("substring(text, _a + 1, _b - _a)")
        ).alias("middle"),
        F.when(
            F.col("fim_applied"),
            F.expr("substring(text, _b + 1, length(text))"),
        ).alias("suffix"),
        "text",
    )
    psm = F.when(
        F.col("fim_applied"),
        F.concat(
            F.lit(PRE), F.col("prefix"), F.lit(SUF), F.col("suffix"),
            F.lit(MID), F.col("middle"),
        ),
    ).otherwise(F.col("text"))
    lossless = F.when(
        F.col("fim_applied"),
        F.concat("prefix", "middle", "suffix") == F.col("text"),
    ).otherwise(F.lit(True))
    return out.select(
        "doc_id",
        "fim_applied",
        "prefix",
        "middle",
        "suffix",
        psm.alias("psm_text"),
        lossless.alias("lossless"),
    )


def fim_psm_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: FIM PSM transform over the documents table."""
    return fim_transform(load_table(spark, "documents", sf_dir))


FIM_PSM_SQL = f"""
WITH staged AS (
  SELECT doc_id, text,
         (doc_id % 2 = 0 AND length(text) >= {_MIN_CHARS}) AS fim_applied,
         1 + CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % (length(text) - 20) AS _a0
  FROM documents
),
cuts AS (
  SELECT *,
         _a0 + 1
           + CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 17, 15))
                  AS BIGINT) % (length(text) - _a0 - 9) AS _b0
  FROM staged
),
parts AS (
  SELECT doc_id, fim_applied, text,
         CASE WHEN fim_applied
              THEN substring(text, 1, CAST(_a0 AS INT))
              ELSE text END AS prefix,
         CASE WHEN fim_applied
              THEN substring(text, CAST(_a0 + 1 AS INT),
                             CAST(_b0 - _a0 AS INT)) END AS middle,
         CASE WHEN fim_applied
              THEN substring(text, CAST(_b0 + 1 AS INT),
                             length(text)) END AS suffix
  FROM cuts
)
SELECT doc_id, fim_applied, prefix, middle, suffix,
       CASE WHEN fim_applied
            THEN '{PRE}' || prefix || '{SUF}' || suffix || '{MID}' || middle
            ELSE text END AS psm_text,
       CASE WHEN fim_applied
            THEN prefix || middle || suffix = text
            ELSE TRUE END AS lossless
FROM parts
"""

QUERIES = {"fim_psm_split": fim_psm_split}
ORACLES = {"fim_psm_split": FIM_PSM_SQL}
