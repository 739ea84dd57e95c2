"""Fuzzy string-similarity join (edit distance) — the data-cleaning /
entity-resolution capability tier: find name pairs within a bounded
Levenshtein distance WITHOUT a quadratic all-pairs comparison.

Blocking must be LOSSLESS to keep the exact oracle: the length band is
(|len(a)−len(b)| ≤ d ⇒ lev(a,b) can be ≤ d is implied by the reverse
triangle inequality — length difference is a lower bound on edit
distance), so joining on 4-char length buckets ±1 provably reaches every
pair within distance 3. First-letter or prefix blocking would be faster
but drops real pairs, which an exact-oracle engine can't do silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

_MAX_DIST = 3
_BUCKET = 4  # bucket width > _MAX_DIST ⇒ candidates live in bucket ±1


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-name pairs within Levenshtein distance ≤ 3 via
    length-band blocking.

    Scale shape: dedup to DISTINCT names first (the name domain is orders
    of magnitude smaller than the fact rows carrying them), then each name
    fans out to its own length bucket and both neighbors on ONE side of
    the join only — each qualifying pair meets in exactly one bucket, so
    no post-join distinct is needed. The expensive lev() runs only inside
    a band, never across the full cross product; candidates per name are
    bounded by the band population, not the corpus."""
    names = (
        load_table(spark, "part", sf_dir)
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("len", F.length("name"))
        .withColumn("bucket", (F.col("len") / _BUCKET).cast("int"))
    )
    probe = names.select(
        F.col("name").alias("n1"),
        F.col("len").alias("len1"),
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("bucket"),
    )
    build = names.select(
        F.col("name").alias("n2"), F.col("len").alias("len2"), "bucket"
    )
    return (
        probe.join(build, "bucket")
        .filter(
            (F.col("n1") < F.col("n2"))
            & (F.abs(F.col("len1") - F.col("len2")) <= _MAX_DIST)
        )
        .withColumn("dist", F.levenshtein("n1", "n2"))
        .filter(F.col("dist") <= _MAX_DIST)
        .select("n1", "n2", "dist")
        .orderBy("n1", "n2")
    )


FUZZY_NAME_PAIRS_SQL = f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS n1, b.name AS n2, levenshtein(a.name, b.name) AS dist
FROM names a JOIN names b ON a.name < b.name
WHERE ABS(LENGTH(a.name) - LENGTH(b.name)) <= {_MAX_DIST}
  AND levenshtein(a.name, b.name) <= {_MAX_DIST}
ORDER BY n1, n2
"""


QUERIES = {
    "fuzzy_name_pairs": fuzzy_name_pairs,
}

ORACLES = {
    "fuzzy_name_pairs": FUZZY_NAME_PAIRS_SQL,
}
