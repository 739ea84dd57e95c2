"""Attribution operator invariants (ops/attribution.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
window semantics (strict precedence, lookback bound, tie handling) and
branch non-vacuity.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from ir_analyses_spark.ops.attribution import (
    _LOOKBACK_US,
    attribute_conversions,
)
from ir_analyses_spark.registry import all_oracles, all_queries


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def conv(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/events.parquet')"
    )
    return con.execute(all_oracles()["attribution_touchpoints"]).df()


def test_every_purchase_once_and_consistent(conv):
    assert conv["event_id"].is_unique
    at = conv[conv["attributed"]]
    un = conv[~conv["attributed"]]
    # attributed rows carry both touches inside the lookback, strictly
    # before the purchase; unattributed rows carry neither
    assert (at["first_touch_us"] <= at["last_touch_us"]).all()
    assert (at["last_touch_us"] < at["purchase_us"]).all()
    assert (at["first_touch_us"] >= at["purchase_us"] - _LOOKBACK_US).all()
    assert un["first_touch_us"].isna().all() and un["n_touches"].eq(0).all()


def test_all_three_branches_fire(conv):
    """Unattributed, single-touch, and multi-touch-with-distinct-ends
    must all be real at the correctness SFs."""
    assert (~conv["attributed"]).any()
    assert (conv["n_touches"] == 1).any()
    multi = conv[conv["n_touches"] > 1]
    assert (multi["first_touch_us"] != multi["last_touch_us"]).any()


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1, h, m, s, us), uid, t, 0.0, None)
            for i, (h, m, s, us, uid, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_window_contract(spark):
    """Controlled timeline: a touch outside the 24h lookback does not
    attribute; a same-microsecond touch does not attribute to its own
    instant; first/last pick the extremes inside the window."""
    rows = [
        # user 1: touch 25h before purchase (outside), purchase at 26h
        (0, 0, 0, 0, 1, "view"),
        # user 1's purchase on Jan 2 at 02:00 — view was Jan 1 00:00 (26h)
        # user 2: views 1h and 2h before, purchase, same-µs click
        (1, 0, 0, 0, 2, "view"),
        (2, 0, 0, 0, 2, "view"),
        (3, 0, 0, 0, 2, "purchase"),
        (3, 0, 0, 0, 2, "click"),  # same microsecond as the purchase
    ]
    df = _ev(spark, rows)
    # move user 1's purchase to +26h via a separate frame
    extra = spark.createDataFrame(
        [(99, datetime(2024, 1, 2, 2, 0, 0, 0), 1, "purchase", 0.0, None)],
        df.schema,
    )
    out = {
        r["user_id"]: r
        for r in attribute_conversions(df.unionByName(extra)).collect()
    }
    assert out[1]["attributed"] is False  # 26h-old view out of lookback
    u2 = out[2]
    assert u2["n_touches"] == 2  # the same-µs click is NOT counted
    assert u2["first_touch_us"] < u2["last_touch_us"]


def test_single_exchange(spark, sf_dir):
    """One user_id hash partitioning serves the whole operator."""
    plan = (
        all_queries()["attribution_touchpoints"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
