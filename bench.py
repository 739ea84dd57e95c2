"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query materializes fully through the `noop` sink (no driver collect, no
result pruning), timed individually after a session warm-up. The headline set
spans the operator families: scan+agg, broadcast star join, top-k join,
windows, sessionization, as-of join, dedup (exact + MinHash LSH), ANN
similarity, text analysis, streaming batch-twin.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ir_analyses_spark.registry import all_queries  # noqa: E402
from ir_analyses_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "pricing_summary",
    "regional_revenue",
    "join_broadcast_dims",
    "join_multiway_topk",
    "join_asof",
    "latest_per_group",
    "window_ranking",
    "window_running_frames",
    "window_sessionize",
    "rollup_agg",
    "exact_dedup",
    "minhash_lsh_nearup",
    "ann_brute_topk",
    "text_stats",
    "quality_score",
    "stream_tumbling_batch",
]


WARMUP_SF_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def _sf_of(path: str) -> float | None:
    """Scale factor from a ``.../sf<N>`` directory name, or None — ONE
    parser shared by the record emitter and the prior-timings reader (an
    unguarded float() here would crash after all timed runs and lose the
    record)."""
    tail = path.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return None


def main() -> None:
    spark = get_spark(app_name="ir_analyses_spark_bench")
    queries = all_queries()
    # Warm-up: JVM, parquet footer caches, and — decisively — whole-stage
    # codegen compilation, by running every headline plan once at the tiny
    # SF. Generated-class compilation is a fixed per-plan cost (Janino
    # caches by source hash); timing it against sf0.1 data would charge a
    # constant to a throughput metric. The timed runs below measure the
    # data-proportional steady state, which is what scales to 100 TB.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        try:
            queries[name](spark, WARMUP_SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # warm-up is best-effort; the timed run will surface errors
    # Timed protocol (r5, per VERDICT r4 item 4): THREE timed repetitions
    # per query at the target SF, no separate target-SF warmup pass.
    #   - rep 1 is a cold-at-target-SF run — exactly the r1-r3 methodology
    #     (it still pays JVM JIT tier-up of the generated code at real row
    #     volume; measured on pricing_summary at sf0.1: first run
    #     ~1.9-2.0 s, later runs ~1.25 s — per-plan compilation, not IO).
    #   - the per-query MEDIAN of the 3 reps is the steady-state headline
    #     (what r4's extra warmup pass measured), and the median also
    #     damps the documented ±25% page-cache/co-tenant noise.
    # One record therefore carries BOTH numbers: "value" (median,
    # steady state) and "value_first_run" (r3-comparable cold pass), so
    # cross-round deltas decompose into methodology vs real gains.
    _N_REPS = 3
    reps: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for rep in range(_N_REPS):
        for name in HEADLINE:
            if name in errors:
                continue
            fn = queries[name]
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                reps.setdefault(name, []).append(time.perf_counter() - t0)
            except Exception as exc:  # one bad query must not lose the record
                errors[name] = f"{type(exc).__name__}: {str(exc)[:200]}"

    def _median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2.0

    # ADVICE r5: a query that errored on rep 2/3 has 1-2 timings — that is
    # NOT a steady-state median, and _best_prior_timings in a later round
    # would ingest it as one. Full-rep queries only; partials are recorded
    # under an explicit key that the cross-round reader never consumes.
    timings = {
        name: round(_median(ts), 3)
        for name, ts in reps.items()
        if len(ts) == _N_REPS
    }
    first_run = {
        name: round(ts[0], 3) for name, ts in reps.items() if len(ts) == _N_REPS
    }
    partial = {
        name: [round(t, 3) for t in ts]
        for name, ts in reps.items()
        if len(ts) < _N_REPS
    }

    record = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "warmup": "plans at tiny SF; timed = median of 3 reps at target SF",
        "value_first_run": round(sum(first_run.values()), 3),
        "queries_first_run": first_run,
        "methodology_note": (
            "value/queries are per-query medians of 3 target-SF reps "
            "(steady state, noise-damped); value_first_run/"
            "queries_first_run are the cold first reps - the r1-r3 "
            "methodology - so round deltas separate methodology from "
            "real gains"
        ),
    }
    if partial:
        record["partial"] = partial
    if errors:
        # a partial sum reads as a faster-looking total to any tool that
        # compares "value" across rounds — null it so an errored run can
        # never be mistaken for a full-run record
        record["value"] = None
        record["value_first_run"] = None
        record["errors"] = errors
    print(json.dumps(record))
    if errors:
        for name, msg in errors.items():
            print(f"BENCH ERROR {name}: {msg}", file=sys.stderr)
        sys.exit(1)

    # Regression gate: every headline query must stay within 2× of its best
    # recorded per-round time (BENCH_r*.json are the driver's artifacts).
    # Sub-second queries need an absolute floor too: at 0.3 s the timing is
    # dominated by scheduling jitter, and a 2× ratio alone would fail the
    # whole bench on noise. The JSON line above is already printed, so a
    # failure loses no record.
    best = _best_prior_timings()
    regressions = {
        name: (t, best[name])
        for name, t in timings.items()
        if name in best
        and best[name] > 0
        and t > 2.0 * best[name]
        and t - best[name] > 1.0
    }
    if regressions:
        for name, (now, prior) in regressions.items():
            print(
                f"REGRESSION {name}: {now:.2f}s vs best prior {prior:.2f}s "
                f"(>{2.0:.0f}x)",
                file=sys.stderr,
            )
        sys.exit(1)


def _best_prior_timings() -> dict[str, float]:
    """Best per-query wall time across all recorded rounds (BENCH_r*.json
    next to this script), at the same SF as this run."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    sf = _sf_of(SF_DIR)
    best: dict[str, float] = {}
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        # The driver wraps the bench JSON line under "parsed" (alongside
        # rc/tail); accept both the bare and the wrapped shape.
        if "parsed" in rec and isinstance(rec["parsed"], dict):
            rec = {**rec, **rec["parsed"]}
        try:
            same_sf = sf is not None and float(rec.get("sf")) == sf
        except (TypeError, ValueError):
            same_sf = False
        if not same_sf:
            continue
        if rec.get("errors"):
            # pre-r6 records from errored runs may carry 1-2-rep values in
            # "queries" (the writer now segregates those under "partial");
            # never read an errored run's timings as steady-state medians
            continue
        for name, t in (rec.get("queries") or {}).items():
            if isinstance(t, (int, float)):
                best[name] = min(best.get(name, float("inf")), float(t))
    return best


if __name__ == "__main__":
    main()
