#!/usr/bin/env python3
"""retrievectl: operator CLI for the stored retrieval index — the
query-side sibling of ``curatectl`` (r13 VERDICT item 6; the
``--heavy-hitters-permille`` audit surface set the precedent). Builds
the segmented positional index ONCE over an exported corpus, then
answers phrase / top-k BM25 queries FROM STORAGE — each query reads
~the query tokens' (token, segment) rows (pushed token filter over
token-sorted row groups), never the corpus and never the full index
(``llm/retrieval.py`` stored-index route; plan pinned in
tests/test_retrieval.py).

    python retrievectl.py build --corpus /data/corpus --index-dir /data/ridx
    python retrievectl.py append --corpus /data/batch2 --index-dir /data/ridx
    python retrievectl.py stats --index-dir /data/ridx
    python retrievectl.py phrase --index-dir /data/ridx --terms "machine learning"
    python retrievectl.py topk --index-dir /data/ridx --query "spark shuffle" --k 10

``append`` merges a new batch byte-identically to a full rebuild over
old ∪ new (staged-swap crash safety; duplicate doc_ids refuse loudly)
— the incremental growth twin of ``curatectl --substring-store``.

One JSON line on stdout per invocation (machine-readable, like
bench.py / curatectl --report). Exit codes: 0 = ran, 2 = rejected
(bad arguments, missing corpus/index, format drift).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: phrase/topk output is top-N ranked rows — an unbounded phrase result
#: over a common pair could be corpus-sized, and a CLI that prints it
#: all is a driver-side collect of exactly the kind the engine bans;
#: the limit keeps the collect bounded by construction (heavy-hitters
#: precedent: result size bounded before the collect, not after)
_DEFAULT_LIMIT = 100


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build + persist the segmented index")
    b.add_argument("--corpus", required=True, metavar="PARQUET",
                   help="corpus parquet with doc_id/text columns (a "
                   "curatectl export)")
    b.add_argument("--index-dir", required=True,
                   help="output directory (postings/, doclens/, _index_meta)")
    b.add_argument("--seg-width", type=int, default=None,
                   help="doc_ids per postings segment (doc_id VALUE range). "
                   "Default: 2^52 — 4096 value-range segments over the full "
                   "signed-64-bit space, the hashed-xxhash64-id guidance "
                   "from llm/retrieval.py (sequential small ids should pass "
                   "an explicit width instead)")

    a = sub.add_parser(
        "append",
        help="merge a NEW batch into an existing index (byte-identical "
        "to a full rebuild over old ∪ new; staged-swap crash safety; "
        "duplicate doc_ids refuse loudly)",
    )
    a.add_argument("--corpus", required=True, metavar="PARQUET",
                   help="new-batch parquet with doc_id/text columns")
    a.add_argument("--index-dir", required=True)

    p = sub.add_parser("phrase", help="exact-phrase match from the stored index")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--terms", required=True, metavar='"T1 T2"',
                   help="the two-token phrase, space-separated")
    p.add_argument("--limit", type=int, default=_DEFAULT_LIMIT,
                   help=f"max rows printed, most occurrences first "
                   f"(default {_DEFAULT_LIMIT})")

    st = sub.add_parser(
        "stats",
        help="index observability: frozen build meta + live token/"
        "segment/payload counts, on-disk bytes, applied-epoch count",
    )
    st.add_argument("--index-dir", required=True)

    t = sub.add_parser("topk", help="top-k BM25 from the stored index")
    t.add_argument("--index-dir", required=True)
    t.add_argument("--query", required=True, action="append",
                   metavar='"W1 W2 ..."',
                   help="query terms, space-separated; repeat --query to "
                   "batch several queries through ONE salted two-phase "
                   "rank (query_id = 1-based flag order)")
    t.add_argument("--k", type=int, default=10)
    t.add_argument("--salt", type=int, default=16)

    args = ap.parse_args(argv)
    from ir_analyses_spark.session import get_spark

    spark = get_spark(app_name="retrievectl")
    t0 = time.monotonic()
    try:
        if args.cmd == "build":
            from ir_analyses_spark.llm.retrieval import write_retrieval_index

            corpus = spark.read.parquet(args.corpus)
            missing = {"doc_id", "text"} - set(corpus.columns)
            if missing:
                raise ValueError(
                    f"corpus at {args.corpus} lacks columns "
                    f"{sorted(missing)} (columns: {corpus.columns})"
                )
            seg_width = args.seg_width if args.seg_width is not None else 1 << 52
            meta = write_retrieval_index(
                corpus.select("doc_id", "text"), args.index_dir, seg_width
            )
            out = {"index_dir": args.index_dir, **meta}
        elif args.cmd == "append":
            from ir_analyses_spark.llm.retrieval import append_retrieval_index

            corpus = spark.read.parquet(args.corpus)
            missing = {"doc_id", "text"} - set(corpus.columns)
            if missing:
                raise ValueError(
                    f"corpus at {args.corpus} lacks columns "
                    f"{sorted(missing)} (columns: {corpus.columns})"
                )
            meta = append_retrieval_index(
                corpus.select("doc_id", "text"), args.index_dir
            )
            out = {"index_dir": args.index_dir, **meta}
        elif args.cmd == "stats":
            from ir_analyses_spark.llm.retrieval import retrieval_index_stats

            out = {
                "index_dir": args.index_dir,
                **retrieval_index_stats(spark, args.index_dir),
            }
        elif args.cmd == "phrase":
            from pyspark.sql import functions as F

            from ir_analyses_spark.llm.retrieval import phrase_search_stored

            terms = args.terms.split()
            if len(terms) != 2:
                raise ValueError(
                    f"--terms takes exactly two space-separated tokens, "
                    f"got {len(terms)}: {args.terms!r}"
                )
            if args.limit < 1:
                raise ValueError(f"--limit must be >= 1, got {args.limit}")
            df = phrase_search_stored(spark, args.index_dir, *terms)
            total = df.count()
            rows = (
                df.orderBy(F.desc("n_occurrences"), "doc_id")
                .limit(args.limit)
                .collect()
            )
            out = {
                "phrase": terms,
                "matched_docs": total,
                "rows_printed": len(rows),
                "rows": [r.asDict() for r in rows],
            }
        else:
            from ir_analyses_spark.llm.retrieval import bm25_topk_stored

            queries = {
                i + 1: tuple(q.split()) for i, q in enumerate(args.query)
            }
            if any(not ts for ts in queries.values()):
                raise ValueError("every --query needs at least one term")
            rows = (
                bm25_topk_stored(
                    spark, args.index_dir, queries, k=args.k, salt=args.salt
                )
                .orderBy("query_id", "rank")
                .collect()
            )
            out = {
                "queries": {str(i): list(ts) for i, ts in queries.items()},
                "k": args.k,
                "rows": [r.asDict() for r in rows],
            }
    except (ValueError, FileNotFoundError) as exc:
        print(f"retrievectl: {exc}", file=sys.stderr)
        return 2
    out["sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
