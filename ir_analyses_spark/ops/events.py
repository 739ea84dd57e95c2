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


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current event type) — the behavior-model table
    recommendation and anomaly pipelines consume.

    lag() over (user_id ORDER BY ts, event_id) pairs each event with its
    predecessor — ONE shuffle by user_id, linear state; the pair counts
    then map-side combine, and the row-normalizing denominator comes from
    a window SUM over the tiny (type×type) grid, not a second pass over
    the fact. Probability = exact-int / exact-int in one double division —
    engine-exact. Event timestamps are globally unique in TESTDATA, but
    event_id still tiebreaks the order so the query stays deterministic on
    any data."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = Window.partitionBy("prev_type")
    return (
        pairs.withColumn(
            "p",
            F.col("n").cast("double") / F.sum("n").over(grid).cast("double"),
        )
        .orderBy("prev_type", "next_type")
    )


EVENT_TRANSITION_MATRIX_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM pairs
ORDER BY prev_type, next_type
"""


def session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 daily user journeys: the ordered first-3-event-type path per
    (user, day), counted and ranked — the "what do people actually do
    first" report. Path assembly is rank-then-pivot (row_number ≤ 3 over
    the user-day window, conditional MIN per slot), which keeps the whole
    query in codegen — no collect_list/UDF — and shares ONE shuffle by
    (user_id, day) between ranking and assembly; the final top-20 is a
    heap TakeOrderedAndProject with a path tiebreak, never a global sort."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.to_date("ts").alias("day"), "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    slot = F.row_number().over(w)
    ranked = ev.withColumn("rn", slot).filter(F.col("rn") <= 3)
    paths = (
        ranked.groupBy("user_id", "day")
        .agg(
            F.concat_ws(
                ">",
                F.min(F.when(F.col("rn") == 1, F.col("event_type"))),
                F.min(F.when(F.col("rn") == 2, F.col("event_type"))),
                F.min(F.when(F.col("rn") == 3, F.col("event_type"))),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy(F.col("n_user_days").desc(), "path")
        .limit(20)
    )


SESSION_PATHS_TOPK_SQL = """
WITH ranked AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id, day,
         CONCAT_WS('>',
           MIN(CASE WHEN rn = 1 THEN event_type END),
           MIN(CASE WHEN rn = 2 THEN event_type END),
           MIN(CASE WHEN rn = 3 THEN event_type END)) AS path
  FROM ranked WHERE rn <= 3
  GROUP BY user_id, day
)
SELECT path, COUNT(*) AS n_user_days
FROM paths
GROUP BY path
ORDER BY n_user_days DESC, path
LIMIT 20
"""


def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each user scored into recency / frequency /
    monetary quartiles (ntile(4) with a user_id tiebreak so the cut is
    deterministic on ties), then rolled up to segment-level counts and
    purchase totals — the classic CRM cube.

    The quartiles are computed WITHIN the user's acquisition cohort
    (first-event day). Analytically that's the standard tenure control —
    a 2019 signup and a last-week signup shouldn't compete on frequency —
    and mechanically it's the same move sequence_packing makes: a GLOBAL
    ntile is a single-partition sort (the scale-killer), while the
    per-cohort window is an embarrassingly parallel pass sharing one
    shuffle. ONE pass over events builds the per-user triple (the
    reference day — the global max timestamp — folds from the PER-USER
    frame's last_ts maxima, a one-row broadcast over the already-
    aggregated rows, so the fact table really is scanned once; an
    ``ev.agg(max(ts))`` here would be a second full scan, review-caught);
    monetary totals go through the decimal accumulator so the rollup is
    partition-order-proof."""
    from pyspark.sql import Window

    from .helpers import dsum

    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "value")
    per_user_base = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("value").alias("monetary"),
    ).localCheckpoint(eager=True)  # feeds ref + the join below: one scan
    ref = per_user_base.agg(F.max("last_ts").alias("ref_ts"))
    per_user = per_user_base.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days",
        F.datediff(F.to_date("ref_ts"), F.to_date("last_ts")),
    )
    # low recency_days = recent = best → ascending; high freq/monetary =
    # best → descending, matching the conventional R/F/M 1..4 scoring
    r_w = Window.partitionBy("cohort_day").orderBy("recency_days", "user_id")
    f_w = Window.partitionBy("cohort_day").orderBy(
        F.col("frequency").desc(), "user_id"
    )
    m_w = Window.partitionBy("cohort_day").orderBy(
        F.col("monetary").desc(), "user_id"
    )
    scored = per_user.select(
        "user_id",
        "monetary",
        F.ntile(4).over(r_w).alias("r_tile"),
        F.ntile(4).over(f_w).alias("f_tile"),
        F.ntile(4).over(m_w).alias("m_tile"),
    )
    return (
        scored.groupBy("r_tile", "f_tile", "m_tile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            dsum("monetary").alias("segment_value"),
        )
        .orderBy("r_tile", "f_tile", "m_tile")
    )


USER_RFM_SEGMENTS_SQL = """
WITH per_user AS (
  SELECT user_id,
         CAST(MIN(ts) AS DATE) AS cohort_day,
         DATEDIFF('day', CAST(MAX(ts) AS DATE),
                  (SELECT CAST(MAX(ts) AS DATE) FROM events))
           AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS monetary
  FROM events
  GROUP BY user_id
),
scored AS (
  SELECT user_id, monetary,
         NTILE(4) OVER (PARTITION BY cohort_day
                        ORDER BY recency_days, user_id) AS r_tile,
         NTILE(4) OVER (PARTITION BY cohort_day
                        ORDER BY frequency DESC, user_id) AS f_tile,
         NTILE(4) OVER (PARTITION BY cohort_day
                        ORDER BY monetary DESC, user_id) AS m_tile
  FROM per_user
)
SELECT r_tile, f_tile, m_tile, COUNT(*) AS n_users,
       CAST(SUM(CAST(monetary AS DECIMAL(38,6))) AS DOUBLE)
         AS segment_value
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
    "event_transition_matrix": event_transition_matrix,
    "session_paths_topk": session_paths_topk,
    "user_rfm_segments": user_rfm_segments,
}

ORACLES = {
    "funnel_conversion": FUNNEL_CONVERSION_SQL,
    "cohort_retention": COHORT_RETENTION_SQL,
    "event_transition_matrix": EVENT_TRANSITION_MATRIX_SQL,
    "session_paths_topk": SESSION_PATHS_TOPK_SQL,
    "user_rfm_segments": USER_RFM_SEGMENTS_SQL,
}
