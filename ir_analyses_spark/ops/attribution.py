"""Marketing-touch attribution over the events stream.

The attribution question every event pipeline answers: for each
conversion (purchase), which prior touchpoints (view/click) get the
credit? This implements the two classic single-touch models at once —
FIRST-touch and LAST-touch within a 24-hour lookback — plus the touch
count the multi-touch models (linear, time-decay) divide by.

Shape: one RANGE-framed window over the per-user event timeline —
``RANGE BETWEEN 24h PRECEDING AND 1 µs PRECEDING`` on integer
epoch-microseconds. Range frames are value-based, so same-timestamp
ties cannot reorder results (deterministic without a tiebreak), and the
strictly-preceding upper bound keeps a touch logged in the same
microsecond as the purchase out of its own attribution (contract,
pinned in tests). All arithmetic is exact integer microseconds.

Scale shape: ONE hash-partition exchange on user_id serves the whole
operator (the window); touches and conversions ride the same frame, no
self-join, no stream buildup. At 100 TB the per-user timeline is the
partition unit — the same posture as `ops/events.py`'s funnel.

New module (ops/events.py is r10-certified; the ledger rule keeps its
rows current). Lookback sized so all three branches are real at the
correctness SFs: unattributed purchases, single-touch, and multi-touch
with distinct first/last (pinned in tests/test_attribution.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table

#: lookback window (µs) — 24 hours
_LOOKBACK_US = 24 * 3600 * 1_000_000
_TOUCH_TYPES = ("view", "click")


def attribute_conversions(events: DataFrame) -> DataFrame:
    """(event_id, user_id, purchase_us, first_touch_us, last_touch_us,
    n_touches, attributed) for every purchase event."""
    ev = events.filter(
        F.col("event_type").isin(*_TOUCH_TYPES, "purchase")
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.when(
            F.col("event_type").isin(*_TOUCH_TYPES), F.unix_micros("ts")
        ).alias("touch_us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_LOOKBACK_US, -1)
    )
    framed = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "us",
        F.min("touch_us").over(w).alias("first_touch_us"),
        F.max("touch_us").over(w).alias("last_touch_us"),
        F.count("touch_us").over(w).alias("n_touches"),
    )
    return framed.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        "first_touch_us",
        "last_touch_us",
        "n_touches",
        (F.col("n_touches") > 0).alias("attributed"),
    )


def attribution_touchpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: first/last-touch attribution over events."""
    return attribute_conversions(load_table(spark, "events", sf_dir))


ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type IN ('view', 'click')
              THEN epoch_us(ts) END AS touch_us
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
framed AS (
  SELECT event_id, user_id, event_type, us,
         MIN(touch_us) OVER w AS first_touch_us,
         MAX(touch_us) OVER w AS last_touch_us,
         COUNT(touch_us) OVER w AS n_touches
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {_LOOKBACK_US} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, us AS purchase_us,
       first_touch_us, last_touch_us, n_touches,
       n_touches > 0 AS attributed
FROM framed WHERE event_type = 'purchase'
"""

QUERIES = {"attribution_touchpoints": attribution_touchpoints}
ORACLES = {"attribution_touchpoints": ATTRIBUTION_SQL}
