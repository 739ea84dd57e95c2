"""Event-funnel and cohort analytics over the `events` stream table —
the product-analytics tier (sessionize's siblings in ops/windows.py).

Both queries follow the same scale discipline: every aggregation keys on
``user_id`` (or a frame derived from it), so the successive groupBys and
self-joins REUSE one hash partitioning — Spark plans the later stages
without fresh exchanges (pinned in test_plans). Timestamps compare in
exact integer micros; counts are exact integers; no floats until a final
single division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict sequential view → click → purchase funnel per user: each
    step's timestamp is the FIRST qualifying event strictly after the
    previous step (a later-step event occurring before the earlier step
    does not count — the ordering semantics real funnel tools use).

    Three keyed aggregations over one fact table; the step-N frame is one
    row per user, so each join back is agg-then-join (never fact×fact),
    and all of them share the user_id partitioning. Each step frame is
    eagerly localCheckpoint'ed: step N feeds BOTH step N+1 and the final
    assembly, and Spark rebuilds shared subtrees per consumer — without
    the checkpoint the view-filtered fact scan runs three times (measured:
    6 fact scans total; with it, one scan per event type and the
    one-row-per-user frames replay from executor-local disk)."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    step1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=True)
    )
    step2 = (
        ev.filter(F.col("event_type") == "click")
        .join(step1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=True)
    )
    step3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(step2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        step1.join(step2, "user_id", "left")
        .join(step3, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
        .orderBy("user_id")
    )


FUNNEL_CONVERSION_SQL = """
WITH step1 AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
step2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN step1 s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t_view
  GROUP BY e.user_id
),
step3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN step2 s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t_click
  GROUP BY e.user_id
)
SELECT step1.user_id, t_view, t_click, t_purchase
FROM step1
LEFT JOIN step2 ON step1.user_id = step2.user_id
LEFT JOIN step3 ON step1.user_id = step3.user_id
ORDER BY step1.user_id
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle: users grouped by their first-event
    day, counted as retained in each later day-offset they were active.

    The user→cohort frame aggregates to ONE row per user before joining
    back to the fact (agg-then-join; both sides partitioned by user_id),
    then the retention cells aggregate exact distinct users per
    (cohort_day, day_offset). The retention share divides two exact
    integers once per cell."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.to_date("ts").alias("d")
    )
    # one row per user, consumed twice (sizes + fact join) — checkpoint so
    # the fact scan behind it runs once, not once per consumer
    cohorts = (
        ev.groupBy("user_id")
        .agg(F.min("d").alias("cohort_day"))
        .localCheckpoint(eager=True)
    )
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    cells = (
        ev.join(cohorts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("d", F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_day")
        .withColumn(
            "retention",
            F.col("active_users").cast("double")
            / F.col("cohort_users").cast("double"),
        )
        .orderBy("cohort_day", "day_offset")
        # DATE surfaces as python objects in Arrow/pandas where the oracle
        # yields datetime64 — normalize the output column to timestamp
        .withColumn("cohort_day", F.col("cohort_day").cast("timestamp"))
    )


COHORT_RETENTION_SQL = """
WITH cohorts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_day, COUNT(*) AS cohort_users FROM cohorts GROUP BY cohort_day
),
cells AS (
  SELECT c.cohort_day,
         DATEDIFF('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
         COUNT(DISTINCT e.user_id) AS active_users
  FROM events e JOIN cohorts c ON e.user_id = c.user_id
  GROUP BY 1, 2
)
SELECT CAST(cells.cohort_day AS TIMESTAMP) AS cohort_day,
       day_offset, active_users, cohort_users,
       CAST(active_users AS DOUBLE) / CAST(cohort_users AS DOUBLE)
         AS retention
FROM cells JOIN sizes ON cells.cohort_day = sizes.cohort_day
ORDER BY cells.cohort_day, day_offset
"""


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
}

ORACLES = {
    "funnel_conversion": FUNNEL_CONVERSION_SQL,
    "cohort_retention": COHORT_RETENTION_SQL,
}
