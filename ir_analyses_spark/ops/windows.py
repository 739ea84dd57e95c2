"""Window-function operators: ranking, analytic, and frame families
(SURVEY §2B Window; generalizes §2A A4/O1 latest-per-group).

Every window below declares a *total* order (business key tiebreaks) —
SURVEY §7.3.4: any rank/running value over a partial order is
nondeterministic under shuffle and will not reproduce. Window state is
per-partition-key; nothing here materializes a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table


def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per nation by balance."""
    cust = load_table(spark, "customer", sf_dir)
    order = [F.col("c_acctbal").desc(), F.col("c_custkey")]
    w = W.partitionBy("c_nationkey").orderBy(*order)
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


WINDOW_RANKING_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 9) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-customer order timeline with gap days —
    the reference's per-company time series (§2A J2/O2) extended with
    previous/next-period deltas."""
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate", 1).over(w)
        ).alias("days_since_prev"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       LAG(o_totalprice, 1) OVER w AS prev_price,
       LEAD(o_totalprice, 1) OVER w AS next_price,
       DATEDIFF('day', LAG(o_orderdate, 1) OVER w, o_orderdate) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame running + sliding aggregates over a total order (§2B
    frames): cumulative spend and a centered 3-row moving average."""
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    slide = w.rowsBetween(-1, 1)
    dec = F.col("o_totalprice").cast("decimal(38,6)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(run).cast("double").alias("cum_spend"),
        (F.sum(dec).over(slide).cast("double") / F.count(F.lit(1)).over(slide)).alias(
            "moving_avg3"
        ),
        F.first("o_totalprice").over(run).alias("first_price"),
        F.last("o_totalprice").over(run).alias("latest_price"),
    )


WINDOW_RUNNING_FRAMES_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER run AS DOUBLE) AS cum_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER slide AS DOUBLE)
           / COUNT(*) OVER slide AS moving_avg3,
       FIRST_VALUE(o_totalprice) OVER run AS first_price,
       LAST_VALUE(o_totalprice) OVER run AS latest_price
FROM orders
WINDOW run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       slide AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
"""


def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time: trailing 30-day spend per customer (§2B
    frames, time-based). Ordered by epoch seconds so the frame bound is a
    plain numeric range — peers at equal timestamps aggregate together in
    both engines."""
    o = load_table(spark, "orders", sf_dir)
    epoch = F.unix_timestamp("o_orderdate")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


WINDOW_RANGE_INTERVAL_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS spend_30d,
       COUNT(*) OVER w AS n_orders_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY EPOCH(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
"""


def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization of the event stream in batch (§2B
    session window, batch counterpart of streaming session_window):
    a >30-minute silence per user starts a new session. lag → boundary flag
    → running sum = session id; then per-session aggregates."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                # MICROSECOND-exact gap (r6 review): unix_timestamp()
                # truncates to whole seconds while the DuckDB oracle's
                # EPOCH() keeps fractions — the events timestamps all
                # carry microseconds, and gaps cluster within seconds of
                # the 1800 s threshold, so a 1800.4 s silence would split
                # in one engine and not the other. unix_micros is the
                # same integer arithmetic at the timestamp's native
                # resolution.
                | (
                    F.unix_micros("ts") - F.unix_micros("prev_ts")
                    > 1800 * 1_000_000
                )
            ).cast("int"),
        )
        .withColumn("session_seq", F.sum("new_session").over(run))
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
    )


WINDOW_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   -- integer microseconds on BOTH engines: EPOCH() is a
                   -- DOUBLE whose per-value rounding (~2^-22 s at 2024
                   -- epochs) could flip a boundary-exact 1800 s gap
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                      > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_seq
"""


def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly rollup with gap filling + LOCF (the
    time_bucket_gapfill / locf pattern of time-series stores): per
    event_type, every hour in the stream's span gets a row — observed
    hours carry their aggregate, silent hours appear with n_events=0 and
    the last observed hourly sum carried forward.

    Scale shape: the fact table is scanned EXACTLY ONCE — the hourly
    partial+final hash agg. The (tiny) aggregated frame is eagerly
    materialized and everything else derives from it: the global span is
    min/max of its hour column (date_trunc is monotonic, so min(hour) ==
    trunc(min ts)), the type list is its distinct event_type, and the
    dense grid explodes from ONE broadcast scalar row — grid construction
    is O(output), never a fact re-scan (pinned by
    ``test_gapfill_grid_from_broadcast_scalar``). The LOCF window runs
    per event_type over at most `span_hours` rows; for high-cardinality
    keys at 100 TB the same fill would be range-partitioned by
    (key, time range) first.

    Sums accumulate as DECIMAL(38,6) (order-independent, exact) and emit
    as double only at the edge, so LOCF propagates a bit-stable value.
    """
    ev = load_table(spark, "events", sf_dir)
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_d"),
        )
        # consumed three times (span, type list, fill join); materialize the
        # post-agg frame so the events scan + shuffle happen once
        .localCheckpoint(eager=True)
    )
    span = hourly.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = (
        grid.join(hourly, ["event_type", "hour"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        .withColumn("observed", F.col("sum_d").isNotNull())
        .withColumn("locf_d", F.last("sum_d", ignorenulls=True).over(w))
    )
    return filled.select(
        "event_type",
        "hour",
        F.col("n_events").cast("long").alias("n_events"),
        "observed",
        F.col("locf_d").cast("double").alias("locf_sum_value"),
    )


TIMESERIES_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(38,6))) AS sum_d
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN (
    SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span
  ) g
)
SELECT g.event_type, g.hour,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       h.sum_d IS NOT NULL AS observed,
       CAST(LAST_VALUE(h.sum_d IGNORE NULLS) OVER (
            PARTITION BY g.event_type ORDER BY g.hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS locf_sum_value
FROM grid g LEFT JOIN hourly h USING (event_type, hour)
"""


def ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential smoothing (EWMA, α = 1/4) over the quarterly order
    series — the one-step-ahead forecast every capacity-planning
    dashboard runs. s_t depends on s_{t-1}: a genuinely SEQUENTIAL
    recurrence, which the ORACLE spells as WITH RECURSIVE (DuckDB) and
    this side evaluates as an in-order ``aggregate()`` fold over the
    packed series — the same recurrence, the same evaluation order,
    in ONE job.

    Exactness: the fold fixes the evaluation ORDER exactly as the
    recursion did — element order is ``sort_array`` over structs whose
    FIRST field is the unique ``qtr`` (identical to the oracle's
    ``ROW_NUMBER() OVER (ORDER BY qtr)``), the init is the anchor row's
    ``CAST(demand_c AS DOUBLE)``, and every step is the byte-identically
    spelled ``(CAST(demand_c AS DOUBLE) + 3 * acc) / 4`` — multiply,
    add, divide are each correctly rounded IEEE ops, identical in both
    engines when applied in the same order, and the inputs are exact
    integer cents ≤ 2^53. So the floats hash-match bit-for-bit with NO
    rounding concession (contrast trade_pagerank, whose partition-
    order-varying SUM needs decimal accumulators + 9-dp rounding).
    Bit-equality with the previous WITH RECURSIVE implementation is
    pinned by tests/test_ewma_fold.py (random series vs an iterative
    Python reference, and the executed recursive form on the same frame).

    Scale shape (r14 optimization, guide §1.2 "the distributed
    algorithm"): the recurrence length is the number of QUARTERS — it
    grows with the calendar, not the data — so executing it as a
    UnionLoop recursion cost ~28 driver-scheduled Spark jobs of one row
    each (measured 4-6 s at ANY SF, pure recursion machinery; the r14
    loop-invariant materialization had already removed the per-step
    orders re-scan). The fold runs the identical arithmetic inside one
    task: per-row work is O(#quarters²) trivial flops — ~784 at 28
    quarters, irrelevant next to one Spark job — and the single
    data-sized scan feeds one partial/final aggregate. Measured
    6.5 s → 0.29 s at sf0.01 (22×), bit-identical output. A recurrence
    whose LENGTH scaled with the data would want the recursion back —
    trade_bfs_hops keeps exactly that shape for its data-sized frontier.
    ``sort_array``+fold also removes the recursion's single-partition
    ROW_NUMBER window (WindowExec warning gone)."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_win_orders")
    return spark.sql(EWMA_FOLD_SQL.format(src=_EWMA_DEMAND_SRC))


#: the quarterly demand series (the fold's {src}) — an inline subquery so
#: the shipped query is exactly EWMA_FOLD_SQL over it
_EWMA_DEMAND_SRC = """(
  SELECT CONCAT(CAST(YEAR(o_orderdate) AS STRING), '-Q',
                CAST(QUARTER(o_orderdate) AS STRING)) AS qtr,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                       AS BIGINT)) AS BIGINT) AS demand_c
  FROM _win_orders GROUP BY 1
)"""

#: the in-order EWMA fold over a (qtr, demand_c) source. Module-level and
#: ``{src}``-parameterized so tests/test_ewma_fold.py's random-series
#: bit-equality pins exercise the SHIPPED text, not a copy (r14 ADVICE 1).
EWMA_FOLD_SQL = """
WITH packed AS (
  SELECT sort_array(collect_list(struct(qtr, demand_c))) AS a
  FROM {src}
)
SELECT x.qtr AS qtr, x.demand_c AS demand_c,
       aggregate(slice(a, 2, p),
                 CAST(a[0].demand_c AS DOUBLE),
                 (acc, s) -> (CAST(s.demand_c AS DOUBLE) + 3 * acc) / 4
       ) AS ewma
FROM packed LATERAL VIEW posexplode(a) t AS p, x
"""


EWMA_FORECAST_SQL = """
WITH RECURSIVE demand AS (
  SELECT CONCAT(CAST(YEAR(o_orderdate) AS VARCHAR), '-Q',
                CAST(QUARTER(o_orderdate) AS VARCHAR)) AS qtr,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                       AS BIGINT)) AS BIGINT) AS demand_c
  FROM orders GROUP BY 1
),
seq AS (
  SELECT qtr, demand_c, ROW_NUMBER() OVER (ORDER BY qtr) AS i
  FROM demand
),
sm (i, qtr, demand_c, ewma) AS (
  SELECT i, qtr, demand_c, CAST(demand_c AS DOUBLE)
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.i, s.qtr, s.demand_c,
         (CAST(s.demand_c AS DOUBLE) + 3 * m.ewma) / 4
  FROM sm m JOIN seq s ON s.i = m.i + 1
)
SELECT qtr, demand_c, ewma FROM sm
"""


QUERIES = {
    "window_ranking": window_ranking,
    "window_lag_lead": window_lag_lead,
    "window_running_frames": window_running_frames,
    "window_range_interval": window_range_interval,
    "window_sessionize": window_sessionize,
    "timeseries_gapfill": timeseries_gapfill,
    "ewma_forecast": ewma_forecast,
}

ORACLES = {
    "window_ranking": WINDOW_RANKING_SQL,
    "window_lag_lead": WINDOW_LAG_LEAD_SQL,
    "window_running_frames": WINDOW_RUNNING_FRAMES_SQL,
    "window_range_interval": WINDOW_RANGE_INTERVAL_SQL,
    "window_sessionize": WINDOW_SESSIONIZE_SQL,
    "timeseries_gapfill": TIMESERIES_GAPFILL_SQL,
    "ewma_forecast": EWMA_FORECAST_SQL,
}
