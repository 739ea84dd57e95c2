"""Robust per-group outlier detection (modified z-score / MAD).

The Iglewicz & Hoaglin (1993, "How to detect and handle outliers")
modified z-score: M = 0.6745·(x − median)/MAD, outlier when |M| > 3.5.
Median/MAD instead of mean/stddev so the statistic itself is immune to
the outliers it is hunting — the standard data-quality screen a
training-data pipeline runs over numeric telemetry before trusting it
(a mean-based z-score lets one 10^9 glitch value hide every other
anomaly in its group).

Scale shape: two grouped exact-percentile aggregations (groups are the
low-cardinality screen key, so the sort-based percentile agg is per-
group small) with the tiny (group, median) / (group, mad) frames
BROADCAST back onto the fact stream — the fact table itself shuffles
only on the group key for the percentile passes and the final count;
no window over the full table, no driver collect.

Determinism contract (cross-engine hash): medians are rounded to 6 dp
(`exact_median` precedent — absorbs interpolation ulp drift between
Spark `percentile` and DuckDB `QUANTILE_CONT`); every derived float op
after that (abs-deviation, the 0.6745/3.5 comparison in the integer
form 6745·dev > 35000·mad) is the SAME IEEE expression on identical
inputs in both engines, and the emitted columns are counts plus the
rounded statistics.

Reference parity: the reference has no outlier screen — its numeric
hygiene is ``pd.to_numeric(errors="coerce")`` after full-width-dash
stripping in `utils/data_mapper.py:40-41` (standardize_raw_data);
this row belongs to the LLM-pipeline capability closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: Iglewicz & Hoaglin's recommended cut, in the 10^4-scaled integer
#: pair (6745, 35000) so the gate is one multiply-compare per side.
_Z_NUM, _Z_CUT = 6745, 35000


def robust_outlier_stats(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(group, n, median, mad, n_outliers) per group via modified
    z-score > 3.5. NULL values are excluded up front (they belong to a
    completeness check, not a tail screen)."""
    x = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("x")
    )
    med = x.groupBy("grp").agg(
        F.round(F.expr("percentile(x, 0.5)"), 6).alias("med")
    )
    dev = x.join(F.broadcast(med), "grp").withColumn(
        "dev", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("grp").agg(
        F.round(F.expr("percentile(dev, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med").alias("median_value"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("dev") * F.lit(float(_Z_NUM))
                    > F.col("mad") * F.lit(float(_Z_CUT)),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .withColumnRenamed("grp", "group_key")
    )


def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: modified-z outlier screen of events.value per
    event_type (every group carries real tail mass at all SFs —
    pinned in tests/test_outliers.py)."""
    return robust_outlier_stats(
        load_table(spark, "events", sf_dir), "event_type", "value"
    )


MAD_OUTLIERS_SQL = f"""
WITH x AS (
  SELECT event_type AS grp, value AS x FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT grp, ROUND(QUANTILE_CONT(x, 0.5), 6) AS med FROM x GROUP BY grp
),
dev AS (
  SELECT x.grp, ABS(x.x - m.med) AS dev, m.med
  FROM x JOIN med m USING (grp)
),
mad AS (
  SELECT grp, ROUND(QUANTILE_CONT(dev, 0.5), 6) AS mad FROM dev GROUP BY grp
)
SELECT d.grp AS group_key, COUNT(*) AS n, MAX(d.med) AS median_value,
       MAX(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.dev * {_Z_NUM}.0 > m.mad * {_Z_CUT}.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (grp)
GROUP BY d.grp
"""

QUERIES = {"mad_outliers": mad_outliers}
ORACLES = {"mad_outliers": MAD_OUTLIERS_SQL}
