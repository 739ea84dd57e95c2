#!/usr/bin/env python3
"""Composed-ladder scale run (r9 VERDICT item 7; WARC mode r10 VERDICT
item 5): synthesize a multi-million-page crawl and drive the FULL
curation funnel — including the substring-dedup rung and the quantized
classifier gate — in one session, timing every stage. SCALE.md's
per-stage throughputs were measured on 500k-doc single-stage runs;
this is the 5M+-doc composed evidence (stage outputs feed the next
stage's input, shuffles and persists included).

    python tools/scale_funnel.py --pages 5000000 --shards 64 \
        --out /tmp/wet_scale
    python tools/scale_funnel.py --out /tmp/wet_scale --skip-gen  # rerun
    python tools/scale_funnel.py --pages 5000000 --shards 64 \
        --format warc --out /tmp/warc_scale   # raw-crawl HTML route

``--format wet`` (default) synthesizes Common Crawl *conversion*
records (pre-extracted text — the funnel's WET fast path);
``--format warc`` synthesizes full HTTP *response* records with HTML
markup, driving the HTTP-parse, HTML-extraction, link-density and
NAV/FOOTER line-dedup chrome stages the WET path skips.

Corpus shape (deterministic, derived from sf0.1 document texts so the
vocabulary is the testdata's, not lorem ipsum):

- every page gets a unique suffix (survives exact dedup — the ladder
  must do real per-stage work, not fold 99.9% at the first rung);
- 2% exact cross-URL duplicates (exact-dedup work);
- 10% carry a shared 153-char disclaimer spliced MID-LINE (invisible
  to line dedup, cut by the substring rung from every copy but one —
  also a deliberate hot-key skew probe: one boilerplate shared by
  ~500k docs concentrates its winnowed fingerprint groups);
- 1% below the Gopher word floor (quality-gate work);
- 5k distinct domains (domain-cap window work at realistic fan-out).
"""

from __future__ import annotations

import argparse
import gzip
import json
import multiprocessing as mp
import os
import time

BOILER = (
    "this exact disclaimer sentence is repeated verbatim across the "
    "entire crawl and must be removed by the substring rung of the "
    "dedup ladder before training"
)

_TEXTS: list[str] = []


def _load_texts(src: str) -> list[str]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{src}/documents.parquet') "
        "WHERE length(text) >= 80"
    ).fetchall()
    return [r[0].replace("\n", " ") for r in rows]


def _mix(x: int) -> int:
    """Nonlinear 32-bit integer mixer (xorshift-multiply). A LINEAR
    marker function of (i, j) is NOT doc-unique enough (review-caught):
    the base-text cycle length can share factors with powers of 26, so
    markers of same-base documents share leading characters and extend
    cross-copy shared runs past the winnowing detection bound. The
    xor-shift steps break all modular structure."""
    x &= 0xFFFFFFFF
    x = ((x ^ (x >> 16)) * 0x45D9F3B) & 0xFFFFFFFF
    x = ((x ^ (x >> 16)) * 0x45D9F3B) & 0xFFFFFFFF
    return x ^ (x >> 16)


def _alpha(n: int) -> str:
    """Deterministic alphabetic token for ``n`` (keeps the Gopher
    alpha-word fraction intact — digit markers would fail it)."""
    n += 1
    s = ""
    while n:
        s += chr(97 + n % 26)
        n //= 26
    return s


def _page_text(i: int, texts: list[str]) -> str:
    """Mostly-unique page text: base vocabulary from the testdata
    documents, marker-separated single stopwords (max shared run
    " the " = 5 chars — far under k=16, so no gram can cover it)
    satisfying the Gopher stopword rule, and a
    DOC-UNIQUE alphabetic marker woven after every second base word so
    no cross-document shared run reaches the winnowing detection
    guarantee (window + k − 1 = 23 chars) except the spliced BOILER —
    the corpus must flow THROUGH the ladder, not be shredded by its
    first dedup rung (which is exactly what happened to a plain
    replicated corpus: every base text is a cross-doc duplicated run)."""
    if i % 100 == 9:
        return "tiny page"
    if i % 50 == 7:
        # exact duplicate of the previous page's content (different URL)
        return _page_text(i - 1, texts)
    # cap the base at 24 words: the 5M-page run's purpose is per-DOC
    # throughput; full-length bases put ~500M winnowed fingerprint rows
    # (22+ GB) through the substring rung's sort shuffle on one box and
    # exhausted local disk before measuring anything
    words = texts[i % len(texts)].split()[:24]
    # the stopwords are SCATTERED one per slot between doc-unique
    # markers, never as a phrase: winnowing's guarantee is one-sided —
    # any shared run >= k MAY be detected (and in a million-doc corpus
    # a universal run WILL be: even 4 random flanking marker chars
    # collide between some pair of docs), so a shared "the story of"
    # (14 chars, phrase + one flank char >= 16) was detected and cut
    # from 93% of a 1M corpus, gating them all on stopwords. Single
    # stopwords between markers cap the shared run at " the " = 5
    # chars, which no k=16 gram can ever cover alone.
    out = [_alpha(_mix(i + 0x5B1F2C)), "the",
           _alpha(_mix(i + 0x2E7A91)), "of", _alpha(_mix(i))]
    for j, w in enumerate(words):
        out.append(w)
        if j % 2 == 1:
            out.append(_alpha(_mix(i * 8191 + j)))
    if i % 10 == 3:
        mid = len(out) // 2
        out = out[:mid] + [BOILER] + out[mid:]
    return " ".join(out)


def _record(uri: str, body: bytes, seq: int) -> bytes:
    lines = [
        b"WARC/1.0",
        b"WARC-Type: conversion",
        f"WARC-Record-ID: <urn:uuid:s-{seq}>".encode(),
        b"WARC-Date: 2024-01-02T03:04:05Z",
        f"WARC-Target-URI: {uri}".encode(),
        f"Content-Length: {len(body)}".encode(),
    ]
    return b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"


#: crawl-universal chrome lines on every HTML page: extracted as their
#: own text lines, they are exactly what the GLOBAL line-dedup stage
#: exists to strip — and at 5M docs each is a maximal hot key for its
#: xxhash64(line) group (the skew probe of the HTML path)
NAV = "home products pricing about contact careers blog support"
FOOTER = "copyright example corporation all rights reserved worldwide"


def _http_record(
    uri: str,
    body: bytes,
    seq: int,
    status: str = "200 OK",
    ctype: str = "text/html; charset=utf-8",
) -> bytes:
    """A WARC *response* record carrying a full HTTP message — the
    Common Crawl raw-crawl layout (vs the WET conversion records above),
    so the run drives the HTTP-parse + HTML-extraction stages too."""
    payload = (
        f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n\r\n"
    ).encode() + body
    lines = [
        b"WARC/1.0",
        b"WARC-Type: response",
        f"WARC-Record-ID: <urn:uuid:s-{seq}>".encode(),
        b"WARC-Date: 2024-01-02T03:04:05Z",
        f"WARC-Target-URI: {uri}".encode(),
        b"Content-Type: application/http; msgtype=response",
        f"Content-Length: {len(payload)}".encode(),
    ]
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _html_record(i: int, uri: str, texts: list[str]) -> bytes:
    """One crawl page for the WARC (HTML) path. Text content comes from
    the SAME ``_page_text`` lattice as the WET corpus (unique markers,
    scattered stopwords, 2% exact dups, 10% mid-line boilerplate, 1%
    sub-floor pages), wrapped in markup with crawl-universal NAV/FOOTER
    chrome for the line-dedup stage; on top of that the HTTP/HTML-only
    gates get work: ~0.5% link farms (link-density rule), ~0.4% non-200
    or non-HTML responses (the HTTP gate)."""
    if i % 500 == 13:
        return _http_record(uri, b"gone away", i, status="404 Not Found")
    if i % 500 == 14:
        return _http_record(
            uri, b'{"api": true}', i, ctype="application/json"
        )
    if i % 200 == 11:
        anchors = "".join(
            f'<a href="/{i}/{j}">{_alpha(_mix(i * 31 + j))} link {j}</a> '
            for j in range(14)
        )
        return _http_record(
            uri, f"<html><body>{anchors}</body></html>".encode(), i
        )
    html = (
        f"<html><head><title>Page {_alpha(_mix(i + 7))}</title></head>"
        f"<body><p>{NAV}</p><p>{_page_text(i, texts)}</p>"
        f"<p>{FOOTER}</p></body></html>"
    )
    return _http_record(uri, html.encode(), i)


def _write_shard(args: tuple) -> int:
    shard, lo, hi, out_dir, fmt = args
    suffix = "warc.wet.gz" if fmt == "wet" else "warc.gz"
    path = os.path.join(out_dir, f"part-{shard:05d}.{suffix}")
    with open(path, "wb") as fh:
        buf = []
        for i in range(lo, hi):
            uri = f"http://site{i % 5000}.example/p/{i}"
            if fmt == "wet":
                rec = _record(uri, _page_text(i, _TEXTS).encode(), i)
            else:
                rec = _html_record(i, uri, _TEXTS)
            buf.append(gzip.compress(rec, 1))
            if len(buf) >= 2000:
                fh.write(b"".join(buf))
                buf = []
        fh.write(b"".join(buf))
    return hi - lo


def _init_worker(texts: list[str]) -> None:
    global _TEXTS
    _TEXTS = texts


def generate(
    out_dir: str, pages: int, shards: int, src: str, start: int = 0,
    fmt: str = "wet",
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    texts = _load_texts(src)
    per = (pages + shards - 1) // shards
    jobs = [
        (s, start + s * per, start + min((s + 1) * per, pages), out_dir, fmt)
        for s in range(shards)
        if s * per < pages
    ]
    with mp.Pool(
        min(16, len(jobs)), initializer=_init_worker, initargs=(texts,)
    ) as pool:
        total = sum(pool.map(_write_shard, jobs))
    print(f"generated {total} {fmt} pages in {len(jobs)} shards at {out_dir}")


class _RssPeak:
    """Peak resident-set size of THIS process's whole subtree (driver
    python + the Spark JVM + every forked Python worker), sampled from
    /proc once a second on a daemon thread. The binaryFile WARC route
    holds one whole decompressed shard per task in the Python workers;
    the streaming DataSource holds one record — the peak-RSS delta
    between the two routes on the same corpus IS the claim, so measure
    it instead of asserting it (r11 VERDICT item 4)."""

    def __init__(self) -> None:
        import threading

        self.peak_kib = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    @staticmethod
    def _sample(root: int) -> int:
        ppid: dict[int, int] = {}
        rss: dict[int, int] = {}
        for pid_s in os.listdir("/proc"):
            if not pid_s.isdigit():
                continue
            try:
                with open(f"/proc/{pid_s}/stat") as fh:
                    stat = fh.read()
                with open(f"/proc/{pid_s}/statm") as fh:
                    pages = int(fh.read().split()[1])
            except OSError:
                continue  # raced a process exit
            # field 4 of /proc/pid/stat is ppid; the comm field may
            # contain spaces but is parenthesized, so split after ')'
            ppid[int(pid_s)] = int(stat.rsplit(")", 1)[1].split()[1])
            rss[int(pid_s)] = pages * (os.sysconf("SC_PAGESIZE") // 1024)
        total, frontier = 0, {root}
        while frontier:
            total += sum(rss.get(p, 0) for p in frontier)
            frontier = {c for c, pp in ppid.items() if pp in frontier}
        return total

    def _loop(self) -> None:
        root = os.getpid()
        while not self._stop.is_set():
            try:
                self.peak_kib = max(self.peak_kib, self._sample(root))
            except OSError:
                pass
            self._stop.wait(1.0)

    def stop_gib(self) -> float:
        self._stop.set()
        self._thread.join(timeout=5)
        return round(self.peak_kib / 1024 / 1024, 2)


def run_funnel(
    out_dir: str,
    audit: bool = False,
    fmt: str = "wet",
    *,
    src: str | None = None,
    decontaminate: bool = False,
    decon_permille: int = 500,
    novelty: bool = False,
    novelty_permille: int = 250,
    dsir: bool = False,
    rss: bool = False,
    retrieval: bool = False,
    retrieval_stored: bool = False,
    retrieval_lifecycle: bool = False,
) -> dict:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from ir_analyses_spark.llm.clf_gate import score_gate_df
    from ir_analyses_spark.llm.curate import curation_stages
    from ir_analyses_spark.session import get_spark

    spark = get_spark(app_name="scale_funnel")
    timings: dict[str, dict] = {}
    sampler = _RssPeak() if rss else None
    opt: dict = {}
    if decontaminate or dsir:
        if not src:
            raise ValueError("--decontaminate/--dsir need --src documents")
        docs = spark.read.parquet(f"{src}/documents.parquet")
        if decontaminate:
            # the r11 CLI-run shape: a 25-doc "benchmark" drawn from the
            # same vocabulary the crawl was synthesized from, so grams
            # genuinely collide (a disjoint bench would gate nothing)
            opt["decontaminate_bench"] = docs.orderBy("doc_id").limit(25)
            opt["decontaminate_max_permille"] = decon_permille
        if dsir:
            # target domain = the longest quartile of the source docs —
            # a distribution genuinely shifted from the crawl's mix
            opt["dsir_target"] = (
                docs.orderBy(F.length("text").desc(), "doc_id").limit(500)
            )
    if novelty:
        opt["novelty_filter"] = True
        opt["novelty_min_permille"] = novelty_permille
    t0 = time.monotonic()
    stages = curation_stages(
        spark,
        out_dir,
        input_format=fmt,
        substring_dedup=True,
        persist_intermediates=True,
        # sf0.1 document texts run ~40-60 words; the default Gopher
        # floor (50 words) would gate most of the corpus and starve
        # the later rungs of work — the run measures throughput, so
        # keep the gates live but below the corpus's typical length
        quality_thresholds={"min_words": 10},
        **opt,
    )
    from pyspark import StorageLevel

    # persist the ladder's output before timing the gate, or the gate's
    # wall time would mostly be a re-run of the upstream funnel lineage
    final = stages["final"].persist(StorageLevel.MEMORY_AND_DISK)
    n_final = final.count()
    e2e = time.monotonic() - t0
    timings["e2e_through_substring_and_gopher"] = {
        "sec": round(e2e, 2),
        "rows_out": n_final,
    }
    t = time.monotonic()
    n_kept = score_gate_df(final).filter(F.col("kept")).count()
    timings["quantized_clf_gate"] = {
        "sec": round(time.monotonic() - t, 2),
        "rows_out": n_kept,
    }
    if retrieval:
        # r12 VERDICT item 6: the retrieval primitives composed with
        # the funnel — BM25 + the segmented postings index over the
        # CURATED corpus (hashed xxhash64 doc_ids, not the synthetic
        # table's sequential ones). seg_width = 2^52 puts the full
        # signed-64-bit id space into 2^12 = 4096 value-range
        # segments — the hashed-id guidance from the module docstring
        # (uniform hashes populate range segments evenly; sequential
        # small ids would all land in segment 0 at this width).
        from ir_analyses_spark.llm.retrieval import (
            bm25_scores,
            inverted_postings_sharded,
        )

        corpus = final.select("doc_id", "text")
        t = time.monotonic()
        n_scored = bm25_scores(corpus).count()
        timings["bm25_certificate_query"] = {
            "sec": round(time.monotonic() - t, 2),
            "rows_out": n_scored,
        }
        t = time.monotonic()
        idx = inverted_postings_sharded(corpus, seg_width=1 << 52)
        agg = idx.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("segment").alias("n_segments"),
            F.max(F.length("postings")).alias("max_postings_chars"),
            F.max("df_seg").alias("max_df_seg"),
        ).collect()[0]
        timings["sharded_postings_index"] = {
            "sec": round(time.monotonic() - t, 2),
            "rows_out": agg["rows"],
            "n_segments": agg["n_segments"],
            "max_postings_chars": agg["max_postings_chars"],
            "max_df_seg": agg["max_df_seg"],
        }
    if retrieval_stored:
        # r13 VERDICT item 5: the PRODUCTION read path — write the
        # segmented index to parquet ONCE (token-clustered), then
        # answer the phrase + batched-top-k certificate queries FROM
        # STORAGE. The evidence the pruned-scan plan pin certifies at
        # toy scale, measured at corpus scale: rows surviving the
        # pushed token filter vs the full index, and the actual
        # postings payload those rows carry (sum of string lengths —
        # the bytes the query PARSES; do not trust Hadoop FS or task
        # input-bytes counters here: both miss the local vectorized
        # parquet read path — measured 168 KB reported for a 41 MB
        # scan — so a "bytes_read" column from them would overstate
        # the pruning ~250x).
        from ir_analyses_spark.llm.retrieval import (
            _PHRASE,
            _QUERY_BATCH,
            bm25_topk_stored,
            phrase_search_stored,
            read_retrieval_index,
            write_retrieval_index,
        )
        from ir_analyses_spark.llm.substring_dedup import _dir_bytes

        # sibling of the crawl dir, not inside it — the scan route
        # must never see index parquet next to the warc shards. The
        # index is THIS run's derived artifact: clear any previous
        # run's copy first (write_retrieval_index refuses in-place
        # rebuilds by design)
        import shutil

        idx_dir = out_dir.rstrip("/") + "_retrieval_index"
        shutil.rmtree(idx_dir, ignore_errors=True)
        corpus = final.select("doc_id", "text")
        t = time.monotonic()
        meta = write_retrieval_index(corpus, idx_dir, seg_width=1 << 52)
        timings["stored_index_write"] = {
            "sec": round(time.monotonic() - t, 2),
            "index_bytes": _dir_bytes(f"{idx_dir}/postings"),
            "doclens_bytes": _dir_bytes(f"{idx_dir}/doclens"),
            **meta,
        }
        t = time.monotonic()
        n_ph = phrase_search_stored(spark, idx_dir, *_PHRASE).count()
        ph_sec = round(time.monotonic() - t, 2)
        postings, _, _ = read_retrieval_index(spark, idx_dir)

        def _pruned(terms) -> dict:
            row = (
                postings.filter(F.col("token").isin(*terms))
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum(F.length("postings")).alias("chars"),
                )
                .head()
            )
            return {
                "rows_scanned": row["rows"],
                "postings_chars_parsed": int(row["chars"] or 0),
                "index_rows_total": meta["postings_rows"],
            }

        timings["stored_phrase_query"] = {
            "sec": ph_sec,
            "matched_docs": n_ph,
            **_pruned(_PHRASE),
        }
        t = time.monotonic()
        n_tk = bm25_topk_stored(spark, idx_dir).count()
        timings["stored_topk_query"] = {
            "sec": round(time.monotonic() - t, 2),
            "rows_out": n_tk,
            **_pruned(
                sorted({w for ts in _QUERY_BATCH.values() for w in ts})
            ),
        }
    if retrieval_lifecycle:
        # r14 session 2: the remaining stored query forms (boolean,
        # kwic) and the DELETE → masked-query → VACUUM lifecycle at
        # corpus scale. Pruning evidence stays rows-passed +
        # postings-chars (the byte-counter caveat above).
        if not retrieval_stored:
            raise ValueError("--retrieval-lifecycle needs --retrieval-stored")
        from ir_analyses_spark.llm.retrieval import (
            _BOOL_MUST,
            _BOOL_NOT,
            _KWIC_TERM,
            _KWIC_W,
            boolean_search_stored,
            delete_from_retrieval_index,
            kwic_snippets_stored,
            retrieval_index_stats,
            vacuum_retrieval_index,
        )

        t = time.monotonic()
        n_bool = boolean_search_stored(
            spark, idx_dir, _BOOL_MUST, _BOOL_NOT
        ).count()
        timings["stored_boolean_query"] = {
            "sec": round(time.monotonic() - t, 2),
            "matched_docs": n_bool,
            **_pruned(_BOOL_MUST + _BOOL_NOT),
        }
        t = time.monotonic()
        n_kwic = kwic_snippets_stored(
            spark, idx_dir, corpus, _KWIC_TERM, _KWIC_W
        ).count()
        timings["stored_kwic_query"] = {
            "sec": round(time.monotonic() - t, 2),
            "matched_docs": n_kwic,
            **_pruned((_KWIC_TERM,)),
        }
        # delete ~0.1% of the corpus (hashed ids → pmod sampling),
        # measure the tombstone write, the masked re-query, and vacuum.
        # A smoke-scale corpus can sample ZERO victims (review-caught:
        # an empty delete set raises by design, which would discard the
        # whole run's report) — record the skip instead of crashing.
        victims = corpus.select("doc_id").filter(
            F.pmod(F.col("doc_id"), F.lit(1000)) == 3
        )
        if victims.limit(1).count() == 0:
            timings["index_delete_permille"] = {
                "skipped": "no doc_id sampled at 1 permille "
                "(corpus too small)",
            }
        else:
            t = time.monotonic()
            del_out = delete_from_retrieval_index(spark, idx_dir, victims)
            timings["index_delete_permille"] = {
                "sec": round(time.monotonic() - t, 2),
                **del_out,
            }
            t = time.monotonic()
            n_ph_masked = phrase_search_stored(
                spark, idx_dir, *_PHRASE
            ).count()
            timings["stored_phrase_query_masked"] = {
                "sec": round(time.monotonic() - t, 2),
                "matched_docs": n_ph_masked,
                "masked_out": n_ph - n_ph_masked,
            }
            t = time.monotonic()
            vac_out = vacuum_retrieval_index(spark, idx_dir)
            timings["index_vacuum"] = {
                "sec": round(time.monotonic() - t, 2),
                "removed_docs": vac_out["removed_docs"],
                "n_docs_after": vac_out["n_docs"],
                "postings_rows_after": vac_out["postings_rows"],
            }
            st = retrieval_index_stats(spark, idx_dir)
            timings["index_stats_after_vacuum"] = {
                k: st[k]
                for k in ("n_docs", "n_tombstones", "n_live_docs",
                          "postings_bytes")
            }
    if not audit:
        if sampler is not None:
            timings["peak_tree_rss_gib"] = sampler.stop_gib()
        return timings
    # per-stage attrition audit (persisted intermediates reused; doubles
    # the shuffle/spill volume, so it is opt-in at full scale)
    prev = None
    for name, df in stages.items():
        t = time.monotonic()
        n = df.count()
        timings[f"stage:{name}"] = {
            "sec": round(time.monotonic() - t, 2),
            "rows": n,
            "docs_per_sec": (
                round(prev / (time.monotonic() - t)) if prev else None
            ),
        }
        prev = n
    if sampler is not None:
        timings["peak_tree_rss_gib"] = sampler.stop_gib()
    return timings


def run_incremental(base_dir: str, pages: int, shards: int, src: str,
                    skip_gen: bool = False, fmt: str = "wet") -> dict:
    """Incremental production shape AT SCALE, through the real CLI:
    batch 1 (first half of the pages) runs the funnel+substring stage,
    exports, and seeds the versioned fingerprint store; batch 2 (second
    half — whose 10% boilerplate pages duplicate a run batch 1 already
    shipped) dedups INCREMENTALLY against the store. Evidence: batch
    2's output contains ZERO copies of the boilerplate (only the store
    knows batch 1 shipped it), and the timings show what a per-batch
    store join costs against a ~10^8-fingerprint store."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import curatectl
    from ir_analyses_spark.session import get_spark

    if pages < 2 or shards < 2:
        raise ValueError("--incremental needs pages >= 2 and shards >= 2")
    half = pages // 2
    b1, b2 = f"{base_dir}/batch1", f"{base_dir}/batch2"
    store = f"{base_dir}/fps_store"
    if os.path.exists(store):
        # a populated store flips batch 1 into INCREMENTAL mode against
        # the previous run's exports — every measurement would silently
        # be garbage (review-caught). The store is append-only by
        # design, so freshness is the caller's responsibility.
        raise ValueError(
            f"{store} already exists: delete it (the experiment "
            "requires a fresh store; it is append-only by design)"
        )
    if not skip_gen:
        gen_fmt = "warc" if fmt == "warc-stream" else fmt
        generate(b1, half, max(1, shards // 2), src, start=0, fmt=gen_fmt)
        generate(
            b2, pages - half, max(1, shards - shards // 2), src,
            start=half, fmt=gen_fmt,
        )
    timings: dict[str, dict] = {}
    spark = get_spark(app_name="scale_incremental")
    for name, d in (("batch1_seed", b1), ("batch2_incremental", b2)):
        t = time.monotonic()
        rc = curatectl.main([
            "--warc-dir", d, "--out-dir", f"{base_dir}/out_{name}",
            "--input-format", fmt, "--min-words", "10",
            "--substring-dedup", "--substring-store", store,
        ])
        sec = round(time.monotonic() - t, 2)  # count below is re-read
        assert rc == 0
        n_out = spark.read.parquet(f"{base_dir}/out_{name}").count()
        timings[name] = {"sec": sec, "rows_out": n_out}
    timings["store_fingerprints"] = {
        "rows": spark.read.parquet(f"{store}/fingerprints").count()
    }
    from pyspark.sql import functions as F

    timings["boiler_copies_in_batch2_output"] = {
        "rows": spark.read.parquet(f"{base_dir}/out_batch2_incremental")
        .filter(F.col("text").contains(BOILER)).count()
    }
    return timings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--pages", type=int, default=5_000_000)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument(
        "--src", default=os.environ.get(
            "SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--format", choices=("wet", "warc", "warc-stream"), default="wet",
        help="crawl distribution to synthesize/run: 'wet' (conversion "
        "records, the r10 runs) or 'warc' (full HTTP responses + HTML "
        "markup — drives the HTTP-parse, HTML-extraction, link-density "
        "and line-dedup chrome stages too); 'warc-stream' is the same "
        "WARC bytes scanned through the record-streaming Python "
        "DataSource instead of binaryFile",
    )
    ap.add_argument(
        "--decontaminate", action="store_true",
        help="enable the Bloom benchmark-decontamination stage (25-doc "
        "bench drawn from --src, 500 permille)",
    )
    ap.add_argument(
        "--novelty", action="store_true",
        help="enable the first-seen n-gram novelty gate (250 permille)",
    )
    ap.add_argument(
        "--dsir", action="store_true",
        help="enable DSIR importance selection against a 500-doc "
        "target drawn from --src",
    )
    ap.add_argument(
        "--retrieval", action="store_true",
        help="after the funnel, run the retrieval primitives over the "
        "CURATED corpus: BM25 certificate query + the segmented "
        "postings index at the hashed-id segment width (2^52 -> 4096 "
        "value-range segments)",
    )
    ap.add_argument(
        "--retrieval-stored", action="store_true",
        help="after the funnel, write the segmented index to parquet "
        "once (token-clustered + doclen sidecar + frozen corpus-stat "
        "meta) and answer the phrase + batched-top-k certificate "
        "queries FROM STORAGE, reporting per-query wall, bytes read "
        "(Hadoop FS counters), and rows surviving the pushed token "
        "filter vs the full index — the production read path the "
        "pruned-scan plan pin certifies at toy scale",
    )
    ap.add_argument(
        "--retrieval-lifecycle", action="store_true",
        help="with --retrieval-stored: also answer the boolean + kwic "
        "certificate queries from storage, then run the DELETE (~1‰ "
        "of docs tombstoned) → masked-phrase → VACUUM lifecycle, "
        "reporting per-step wall and the pruned rows/chars evidence",
    )
    ap.add_argument(
        "--rss", action="store_true",
        help="sample and report the process tree's peak resident set "
        "(the warc vs warc-stream route comparison)",
    )
    ap.add_argument(
        "--audit", action="store_true",
        help="also count every stage (re-runs lineage; doubles spill)",
    )
    ap.add_argument(
        "--incremental", action="store_true",
        help="two-batch store flow through curatectl instead of the "
        "single composed run (see run_incremental)",
    )
    args = ap.parse_args()
    if args.retrieval_lifecycle and not args.retrieval_stored:
        # fail at parse time, not after the full funnel has run
        # (review-caught: the in-function raise fires only once the
        # corpus has already been curated — hours of discarded work
        # at real scale)
        ap.error("--retrieval-lifecycle needs --retrieval-stored")
    if args.incremental:
        print(json.dumps(run_incremental(
            args.out, args.pages, args.shards, args.src,
            skip_gen=args.skip_gen, fmt=args.format), indent=1))
        return 0
    if not args.skip_gen:
        t = time.monotonic()
        # warc-stream reads the identical WARC bytes; only the scan
        # route differs, so the generator writes plain 'warc' shards
        gen_fmt = "warc" if args.format == "warc-stream" else args.format
        generate(args.out, args.pages, args.shards, args.src, fmt=gen_fmt)
        print(f"generation: {time.monotonic() - t:.1f}s")
    print(json.dumps(run_funnel(
        args.out, audit=args.audit, fmt=args.format, src=args.src,
        decontaminate=args.decontaminate, novelty=args.novelty,
        dsir=args.dsir, rss=args.rss, retrieval=args.retrieval,
        retrieval_stored=args.retrieval_stored,
        retrieval_lifecycle=args.retrieval_lifecycle), indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
