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
    python retrievectl.py boolean --index-dir /data/ridx --must "spark shuffle" --must-not "deprecated"
    python retrievectl.py proximity --index-dir /data/ridx --terms "spark shuffle" --window 6
    python retrievectl.py kwic --index-dir /data/ridx --corpus /data/corpus --term shuffle --width 5
    python retrievectl.py vocab --index-dir /data/ridx --prefix shuf
    python retrievectl.py delete --index-dir /data/ridx --doc-ids 17,42 --marker takedown-0007
    python retrievectl.py vacuum --index-dir /data/ridx

``append`` merges a new batch byte-identically to a full rebuild over
old ∪ new (staged-swap crash safety; duplicate doc_ids refuse loudly)
— the incremental growth twin of ``curatectl --substring-store``.
``delete``/``vacuum`` are the retention half: tombstoned docs stop
matching every query immediately (ranked top-k promotes the next-best
survivor; corpus stats stay frozen at build — Lucene semantics) and
``vacuum`` rewrites the postings to equal a fresh build over the
survivors, clearing the tombstone set in the same staged swap.

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
    p.add_argument("--terms", required=True, metavar='"T1 T2 [T3 ...]"',
                   help="the phrase, space-separated (2+ tokens; repeats "
                   "allowed)")
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

    bl = sub.add_parser(
        "boolean",
        help="boolean AND + NOT retrieval from the stored index",
    )
    bl.add_argument("--index-dir", required=True)
    bl.add_argument("--must", required=True, metavar='"T1 T2 ..."',
                    help="space-separated tokens a doc must ALL contain")
    bl.add_argument("--must-not", default="", metavar='"T1 ..."',
                    help="space-separated tokens a doc must contain NONE of")
    bl.add_argument("--limit", type=int, default=_DEFAULT_LIMIT,
                    help=f"max rows printed, highest tf_sum first "
                    f"(default {_DEFAULT_LIMIT})")

    kw = sub.add_parser(
        "kwic",
        help="keyword-in-context snippets: hit positions from the "
        "stored index, text from the corpus parquet",
    )
    kw.add_argument("--index-dir", required=True)
    kw.add_argument("--corpus", required=True, metavar="PARQUET",
                    help="corpus parquet with doc_id/text (snippets render "
                    "from text; the index stores positions only)")
    kw.add_argument("--term", required=True)
    kw.add_argument("--width", type=int, default=5,
                    help="tokens of context either side of the hit "
                    "(default 5)")
    kw.add_argument("--limit", type=int, default=_DEFAULT_LIMIT,
                    help=f"max rows printed, doc_id ascending "
                    f"(default {_DEFAULT_LIMIT})")

    px = sub.add_parser(
        "proximity",
        help="windowed co-occurrence (0 < |Δpos| ≤ d) from the stored index",
    )
    px.add_argument("--index-dir", required=True)
    px.add_argument("--terms", required=True, metavar='"T1 T2"',
                    help="the two tokens, space-separated")
    px.add_argument("--window", type=int, default=6,
                    help="max token distance d (default 6)")
    px.add_argument("--limit", type=int, default=_DEFAULT_LIMIT,
                    help=f"max rows printed, most pairs first "
                    f"(default {_DEFAULT_LIMIT})")

    vb = sub.add_parser(
        "vocab",
        help="prefix vocabulary stats (token, df, total_tf) from the "
        "stored index — StringStartsWith-pruned scan, postings never "
        "parsed",
    )
    vb.add_argument("--index-dir", required=True)
    vb.add_argument("--prefix", required=True)
    vb.add_argument("--limit", type=int, default=_DEFAULT_LIMIT,
                    help=f"max rows printed, highest df first "
                    f"(default {_DEFAULT_LIMIT})")

    dl_ = sub.add_parser(
        "delete",
        help="tombstone documents out of the index (masked from queries "
        "immediately; vacuum reclaims the space)",
    )
    dl_.add_argument("--index-dir", required=True)
    dl_.add_argument("--doc-ids", metavar="ID[,ID...]",
                     help="comma-separated doc_ids to delete")
    dl_.add_argument("--ids-parquet", metavar="PARQUET",
                     help="parquet with a doc_id column (large delete "
                     "sets: GDPR batches, takedown lists)")
    dl_.add_argument("--marker", default=None,
                     help="idempotency marker: re-running a delete with "
                     "the same marker is a no-op")

    vc = sub.add_parser(
        "vacuum",
        help="rewrite postings without the tombstoned docs (equals a "
        "fresh build over the survivors), refresh corpus stats, clear "
        "the tombstone set",
    )
    vc.add_argument("--index-dir", required=True)

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
            if len(terms) < 2:
                raise ValueError(
                    f"--terms takes at least two space-separated tokens, "
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
        elif args.cmd == "topk":
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
        elif args.cmd == "boolean":
            from pyspark.sql import functions as F

            from ir_analyses_spark.llm.retrieval import boolean_search_stored

            must = tuple(args.must.split())
            must_not = tuple(args.must_not.split())
            if args.limit < 1:
                raise ValueError(f"--limit must be >= 1, got {args.limit}")
            df = boolean_search_stored(spark, args.index_dir, must, must_not)
            total = df.count()
            rows = (
                df.orderBy(F.desc("tf_sum"), "doc_id")
                .limit(args.limit)
                .collect()
            )
            out = {
                "must": list(must),
                "must_not": list(must_not),
                "matched_docs": total,
                "rows_printed": len(rows),
                "rows": [r.asDict() for r in rows],
            }
        elif args.cmd == "kwic":
            from ir_analyses_spark.llm.retrieval import kwic_snippets_stored

            corpus = spark.read.parquet(args.corpus)
            missing = {"doc_id", "text"} - set(corpus.columns)
            if missing:
                raise ValueError(
                    f"corpus at {args.corpus} lacks columns "
                    f"{sorted(missing)} (columns: {corpus.columns})"
                )
            if args.limit < 1:
                raise ValueError(f"--limit must be >= 1, got {args.limit}")
            df = kwic_snippets_stored(
                spark, args.index_dir, corpus, args.term, args.width
            )
            total = df.count()
            rows = df.orderBy("doc_id").limit(args.limit).collect()
            out = {
                "term": args.term,
                "width": args.width,
                "matched_docs": total,
                "rows_printed": len(rows),
                "rows": [r.asDict() for r in rows],
            }
        elif args.cmd == "proximity":
            from pyspark.sql import functions as F

            from ir_analyses_spark.llm.retrieval import (
                proximity_search_stored,
            )

            terms = args.terms.split()
            if len(terms) != 2:
                raise ValueError(
                    f"--terms takes exactly two space-separated tokens, "
                    f"got {len(terms)}: {args.terms!r}"
                )
            if args.limit < 1:
                raise ValueError(f"--limit must be >= 1, got {args.limit}")
            df = proximity_search_stored(
                spark, args.index_dir, *terms, args.window
            )
            total = df.count()
            rows = (
                df.orderBy(F.desc("n_pairs"), "doc_id")
                .limit(args.limit)
                .collect()
            )
            out = {
                "terms": terms,
                "window": args.window,
                "matched_docs": total,
                "rows_printed": len(rows),
                "rows": [r.asDict() for r in rows],
            }
        elif args.cmd == "vocab":
            from pyspark.sql import functions as F

            from ir_analyses_spark.llm.retrieval import vocab_prefix_stored

            if args.limit < 1:
                raise ValueError(f"--limit must be >= 1, got {args.limit}")
            df = vocab_prefix_stored(spark, args.index_dir, args.prefix)
            total = df.count()
            rows = (
                df.orderBy(F.desc("df"), "token")
                .limit(args.limit)
                .collect()
            )
            out = {
                "prefix": args.prefix,
                "matched_tokens": total,
                "rows_printed": len(rows),
                "rows": [r.asDict() for r in rows],
            }
        elif args.cmd == "delete":
            from ir_analyses_spark.llm.retrieval import (
                delete_from_retrieval_index,
            )

            if bool(args.doc_ids) == bool(args.ids_parquet):
                raise ValueError(
                    "delete takes exactly one of --doc-ids or --ids-parquet"
                )
            if args.doc_ids:
                try:
                    ids = [int(s) for s in args.doc_ids.split(",") if s]
                except ValueError:
                    raise ValueError(
                        f"--doc-ids must be comma-separated integers: "
                        f"{args.doc_ids!r}"
                    )
            else:
                frame = spark.read.parquet(args.ids_parquet)
                if "doc_id" not in frame.columns:
                    raise ValueError(
                        f"ids parquet at {args.ids_parquet} lacks a doc_id "
                        f"column (columns: {frame.columns})"
                    )
                ids = frame.select("doc_id")
            res = delete_from_retrieval_index(
                spark, args.index_dir, ids, marker=args.marker
            )
            out = {"index_dir": args.index_dir, **res}
        else:
            from ir_analyses_spark.llm.retrieval import (
                vacuum_retrieval_index,
            )

            out = {
                "index_dir": args.index_dir,
                **vacuum_retrieval_index(spark, args.index_dir),
            }
    except (ValueError, FileNotFoundError) as exc:
        print(f"retrievectl: {exc}", file=sys.stderr)
        return 2
    out["sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
