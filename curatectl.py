#!/usr/bin/env python3
"""Curation CLI: run the WARC→corpus curation funnel (`llm/curate.py`)
over a crawl directory and write the curated corpus as parquet — the
operational edge of the crawl-curation surface, in the same shape as
`backfill.py` / `ingest.py` / `txnctl.py`.

Runs identically under plain python and spark-submit:

    python curatectl.py --warc-dir /crawl/segment0 --out-dir /data/corpus
    python curatectl.py --warc-dir ... --out-dir ... \\
        --blocklist blocked.txt --max-pages-per-domain 1000 \\
        --min-words 50 --report

Machine-readable output: ONE JSON line on stdout with the output row
count (plus the full per-stage attrition funnel when --report is
given — note --report recomputes each stage and is an audit mode, not
the hot path). Strict-mode parse errors fail the run loudly; default
is permissive (corrupt shards become `_error` records and are dropped
by the HTTP gate, matching crawl-consumer practice).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--warc-dir", required=True, help="directory of .warc/.warc.gz files")
    ap.add_argument("--out-dir", required=True, help="curated corpus output (parquet)")
    ap.add_argument(
        "--blocklist",
        default=None,
        help="file of blocked domains, one per line (# comments allowed)",
    )
    ap.add_argument("--max-pages-per-domain", type=int, default=100_000)
    ap.add_argument("--max-link-char-frac", type=float, default=0.5)
    ap.add_argument("--line-dedup-min-docs", type=int, default=2)
    ap.add_argument(
        "--min-words",
        type=int,
        default=None,
        help="override the Gopher min-word threshold (default 50)",
    )
    ap.add_argument(
        "--strict",
        action="store_true",
        help="fail loudly on malformed WARC data instead of emitting _error rows",
    )
    ap.add_argument(
        "--enforce-robots",
        action="store_true",
        help="extract the crawl's own robots.txt responses and drop "
        "pages their *-rules disallow",
    )
    ap.add_argument(
        "--report",
        action="store_true",
        help="also emit per-stage attrition counts (recomputes each stage)",
    )
    args = ap.parse_args(argv)

    blocked: list[str] = []
    if args.blocklist:
        with open(args.blocklist, encoding="utf-8") as fh:
            blocked = [
                ln.split("#")[0].strip()
                for ln in fh
                if ln.split("#")[0].strip()
            ]

    from ir_analyses_spark.llm.curate import curation_stages, funnel_counts
    from ir_analyses_spark.session import get_spark

    spark = get_spark(app_name="curatectl")
    thresholds = {"min_words": args.min_words} if args.min_words is not None else None
    stages = curation_stages(
        spark,
        args.warc_dir,
        blocked_domains=blocked or None,
        max_pages_per_domain=args.max_pages_per_domain,
        max_link_char_frac=args.max_link_char_frac,
        line_dedup_min_docs=args.line_dedup_min_docs,
        quality_thresholds=thresholds,
        permissive=not args.strict,
        enforce_robots=args.enforce_robots,
    )
    final = stages["final"]
    final.write.mode("overwrite").parquet(args.out_dir)
    out = {"out_dir": args.out_dir, "n_documents": spark.read.parquet(args.out_dir).count()}
    if args.report:
        out["funnel"] = funnel_counts(stages)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
