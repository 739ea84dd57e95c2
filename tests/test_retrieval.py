"""Retrieval primitives invariants (llm/retrieval.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
BM25 algebra against an independent pure-Python model, the postings
format contract, and branch non-vacuity at the correctness SFs.
"""

from __future__ import annotations

import math
import re

import pytest

from ir_analyses_spark.llm.retrieval import (
    INVERTED_INDEX_POSTINGS_SHARDED_SQL,
    bm25_score_docs,
    bm25_scores,
    inverted_postings,
    inverted_postings_sharded,
)


def _bm25_model(texts: dict, terms) -> dict:
    """Independent reference: textbook BM25 (k1=1.2, b=0.75) computed
    float-first, no integer rescaling — agreement within the round-6
    quantum proves the rational rearrangement is the same function."""
    toks = {d: t.split(" ") for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, ws in toks.items():
        s = 0.0
        hit = 0
        for q in terms:
            tf = ws.count(q)
            if not tf:
                continue
            hit += 1
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log((n - df + 0.5) / (df + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
        if hit:
            out[d] = (hit, s)
    return out


def test_bm25_matches_independent_model(spark):
    texts = {
        1: "cat dog cat fish",
        2: "cat bird",
        3: "dog dog dog dog dog dog",
        4: "fish",
        5: "bird bird bird",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_scores(docs, ("cat", "dog")).collect()
    }
    want = _bm25_model(texts, ("cat", "dog"))
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 2e-6, (d, got[d], want[d])


def test_bm25_rarer_term_scores_higher(spark):
    """Same tf and dl, rarer term → higher idf → higher score."""
    rows = [(1, "rare a"), (2, "common a"), (3, "common b"), (4, "common c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ("rare", "common")).collect()
    }
    assert got[1] > got[2]


def test_registry_branches_fire(spark):
    """At the correctness SFs: some docs unmatched (score absent), and
    both single- and multi-term matches exist — otherwise the idf join
    or the per-doc sum could be broken with parity still green."""
    rows = bm25_score_docs(spark, "/root/testdata/sf0.001").collect()
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert 0 < len(rows) < n_docs
    n_terms = {r["n_terms"] for r in rows}
    assert min(n_terms) >= 1 and max(n_terms) > 1


def test_postings_exact_format(spark):
    docs = spark.createDataFrame(
        [(2, "b a b"), (1, "a b a")], "doc_id long, text string"
    )
    got = {r["token"]: r for r in inverted_postings(docs).collect()}
    assert got["a"]["postings"] == "1:1,3;2:2"
    assert got["b"]["postings"] == "1:2;2:1,3"
    assert got["a"]["df"] == 2 and got["a"]["total_tf"] == 3
    assert got["b"]["df"] == 2 and got["b"]["total_tf"] == 3


def test_postings_plan_two_aggregations_no_join(spark):
    """Index build is two grouped aggregations over one scan — any Join
    in the plan means the construction regressed to a join-back."""
    plan = (
        inverted_postings(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_bm25_stat_frames_broadcast(spark):
    """The idf table (bounded by query length) and the 1-row totals
    must ride broadcast joins; only doc-cardinality frames may shuffle."""
    plan = (
        bm25_score_docs(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 3


def test_sharded_segments_split_on_boundary(spark):
    """doc_ids straddling a segment boundary (255 | 256 at the default
    width) put one token's entries in two rows; encoding matches the
    certificate's within each segment."""
    docs = spark.createDataFrame(
        [(255, "a b a"), (256, "a"), (0, "b")], "doc_id long, text string"
    )
    rows = {
        (r["token"], r["segment"]): r
        for r in inverted_postings_sharded(docs).collect()
    }
    assert set(rows) == {("a", 0), ("a", 1), ("b", 0)}
    assert rows[("a", 0)]["postings"] == "255:1,3"
    assert rows[("a", 1)]["postings"] == "256:1"
    assert rows[("b", 0)]["postings"] == "0:1;255:2"
    assert rows[("a", 0)]["df_seg"] == 1 and rows[("a", 0)]["total_tf"] == 2


def test_sharded_reconstructs_certificate(spark):
    """Concatenating a token's segment postings ascending reproduces the
    single-string certificate byte-for-byte, and the per-segment df/tf
    partial sums recover the certificate's totals — the twin is the
    same index, sharded."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cert = {r["token"]: r for r in inverted_postings(docs).collect()}
    segs: dict = {}
    for r in inverted_postings_sharded(docs).collect():
        segs.setdefault(r["token"], []).append(r)
    assert set(segs) == set(cert)
    n_multi = 0
    for tok, rows in segs.items():
        rows.sort(key=lambda r: r["segment"])
        n_multi += len(rows) > 1
        assert ";".join(r["postings"] for r in rows) == cert[tok]["postings"]
        assert sum(r["df_seg"] for r in rows) == cert[tok]["df"]
        assert sum(r["total_tf"] for r in rows) == cert[tok]["total_tf"]
    # non-vacuity: the SF exercises multi-segment AND single-segment
    # tokens (50 docs / width 256 would be one segment — sf0.001 has
    # 50 docs, so shrink the width to force both shapes)
    if not n_multi:
        segs2: dict = {}
        for r in inverted_postings_sharded(docs, seg_width=16).collect():
            segs2.setdefault(r["token"], []).append(r)
        assert any(len(v) > 1 for v in segs2.values())


def test_sharded_div_matches_duckdb_on_negative_ids(spark):
    """Hashed 64-bit doc_ids can be negative; Spark `div` and DuckDB
    `//` must assign identical segments (both truncate toward zero) or
    the oracle would silently diverge exactly at the hashed-identity
    deployment shape."""
    import duckdb
    import pandas as pd

    rows = [(-513, "a b"), (-512, "a"), (-1, "b"), (0, "a"), (511, "b a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["token"], r["segment"], r["postings"])
        for r in inverted_postings_sharded(docs, seg_width=512).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        ),
    )
    sql = INVERTED_INDEX_POSTINGS_SHARDED_SQL.replace("// 256", "// 512")
    want = {(r[0], r[1], r[4]) for r in con.execute(sql).fetchall()}
    assert got == want


def test_sharded_plan_no_single_key_postings_agg(spark):
    """The scale pin (r12 VERDICT item 2): every aggregation that
    carries postings state must group on (token, segment) — a
    single-key [w] aggregate is the unbounded-stopword straggler the
    twin exists to remove."""
    plan = (
        inverted_postings_sharded(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # still two grouped aggs over one scan
    postings_aggs = [
        k
        for k in re.findall(r"keys=\[([^\]]*)\]", plan)
        if re.search(r"\bw#\d+", k)
    ]
    assert postings_aggs, plan
    for k in postings_aggs:
        # every per-token aggregate also keys on doc_id (the per-doc
        # position list) or seg (the segmented postings) — never w alone
        assert re.search(r"\b(seg|doc_id)#\d+", k), (k, plan)


def test_bm25_overflow_guard_fires(spark):
    """Past the int64 rescale bound the guard must raise, never score
    wrapped (r12 ADVICE: DuckDB promotes to HUGEINT, Spark wraps — a
    silent divergence at the advertised scale). The ceiling is shrunk
    via the test-only knob; the production ceiling is 2^63-1."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "cat dog cat fish"), (2, "cat bird")], "doc_id long, text string"
    )
    # 6 tokens, max_dl 4: 23*4*6 = 552 > 500 → must raise
    with pytest.raises(Exception, match="int64 rescale bound"):
        bm25_scores(docs, ("cat",), _i64=500).collect()
    # comfortably under the real ceiling → scores normally
    assert bm25_scores(docs, ("cat",)).count() == 2


def test_phrase_search_exact_semantics(spark):
    """Adjacency, not co-occurrence: doc 1 has the phrase twice, doc 2
    has both words non-adjacent (must NOT match), doc 257 puts the
    match in a different segment, and a self-phrase (t1 == t2) counts
    adjacent runs correctly."""
    from ir_analyses_spark.llm.retrieval import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "x part filter y part filter"),
            (2, "part x filter part y"),
            (257, "z part filter"),
        ],
        "doc_id long, text string",
    )
    idx = inverted_postings_sharded(docs)
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(idx, "part", "filter").collect()
    }
    assert got == {1: 2, 257: 1}
    # self-phrase: "a a a" contains "a a" at positions (1,2) and (2,3)
    docs2 = spark.createDataFrame([(7, "a a a b a")], "doc_id long, text string")
    got2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(inverted_postings_sharded(docs2), "a", "a").collect()
    }
    assert got2 == {7: 2}


def test_phrase_registry_and_bite(spark):
    """At sf0.001 the certificate phrase matches a strict subset of the
    docs containing its first term (adjacency bites beyond mere
    containment) and multi-occurrence docs exist."""
    from ir_analyses_spark.llm.retrieval import phrase_search_postings

    rows = phrase_search_postings(spark, "/root/testdata/sf0.001").collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    n_t1 = docs.filter(
        F.array_contains(F.split("text", " "), "part")
    ).count()
    assert 0 < len(rows) < n_t1
    assert max(r["n_occurrences"] for r in rows) > 1


def test_phrase_plan_token_filter_pushed_below_index_build(spark):
    """Query-time selectivity: Catalyst must push the two-token filter
    BELOW the inline index build's aggregations to the token-explode
    scan — the phrase query over an index never aggregates postings
    for tokens outside the query."""
    from ir_analyses_spark.llm.retrieval import phrase_search_postings

    plan = (
        phrase_search_postings(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the self-join rebuilds the inline index in BOTH branches, so the
    # plan contains the build subtree twice; in EVERY branch the pushed
    # token filter must sit directly above the token explode (below all
    # of that branch's aggregations)
    explodes = [m.start() for m in re.finditer(r"Generate posexplode", plan)]
    assert explodes, plan
    for pos in explodes:
        assert re.search(r"IN \(part,filter\)", plan[max(0, pos - 300):pos]), (
            plan[max(0, pos - 300):pos + 100]
        )


def test_bm25_topk_matches_single_query_form(spark):
    """A one-query batch must reproduce bm25_scores' scores exactly and
    rank by (score desc, doc_id): the batched form is the same algebra
    plus ranking."""
    from ir_analyses_spark.llm.retrieval import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    single = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_scores(docs, ("customer", "filter")).collect()
    }
    got = bm25_topk(docs, {9: ("customer", "filter")}, k=5).collect()
    assert len(got) == 5 and {r["query_id"] for r in got} == {9}
    want_order = sorted(single.items(), key=lambda kv: (-kv[1][1], kv[0]))[:5]
    for r, (doc, (n_terms, score)) in zip(
        sorted(got, key=lambda r: r["rank"]), want_order
    ):
        assert r["doc_id"] == doc and r["n_terms"] == n_terms
        assert abs(r["score"] - score) < 1e-9


def test_bm25_topk_salted_phase_never_evicts_winner(spark):
    """Phase 1 keeps k per (query, salt bucket); with salt greater than
    the candidate count every bucket holds at most one doc — the global
    top-k must still come out exactly (a winner is top-k in any subset
    it belongs to, whatever the bucketing)."""
    from ir_analyses_spark.llm.retrieval import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r["rank"], r["doc_id"])
        for r in bm25_topk(docs, {1: ("customer",)}, k=5, salt=2).collect()
    )
    b = sorted(
        (r["rank"], r["doc_id"])
        for r in bm25_topk(docs, {1: ("customer",)}, k=5, salt=997).collect()
    )
    assert a == b and len(a) == 5


def test_bm25_topk_plan_two_phase_rank(spark):
    """The scale pin: TWO row_number windows — the first keyed on
    (query_id, salt), so no single task ever sorts one query's full
    scored corpus; the per-query window only sees phase-1 survivors."""
    from ir_analyses_spark.llm.retrieval import bm25_topk_queries

    qe = bm25_topk_queries(spark, "/root/testdata/sf0.001")._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert plan.count("row_number()") >= 2, plan
    # phase 1: partitioned on (query_id, salt) — the spec carries TWO
    # partition columns before the ordering keys
    assert re.search(
        r"windowspecdefinition\(query_id#\d+, _w\d+#\d+, sdec#\d+ DESC", plan
    ), plan
    # phase 2: per-query only, over phase-1 survivors
    assert re.search(
        r"windowspecdefinition\(query_id#\d+, sdec#\d+ DESC", plan
    ), plan
    # the salt really is pmod(hash(doc_id)) (projected into _w0 by the
    # optimizer, so pin it on the optimized plan)
    assert "pmod(hash(doc_id" in qe.optimizedPlan().toString()


def test_phrase_search_over_stored_index_prunes_scan(spark, tmp_path):
    """The production claim in phrase_search's docstring, executed: the
    index written to parquet and read back, the phrase query's scans
    must push the token predicate into the parquet reader
    (PushedFilters In(token, ...)) and prune to the postings columns —
    a query-time read touches only the two query tokens' rows, never
    the full index."""
    from ir_analyses_spark.llm.retrieval import phrase_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "postings_index")
    inverted_postings_sharded(docs).write.parquet(path)
    stored = spark.read.parquet(path)
    q = phrase_search(stored, "part", "filter")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[[^\]]*In\(token", plan), plan
    # column pruning: the scan reads the three columns the query needs,
    # not df_seg/total_tf
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "df_seg" not in m.group(0) and "total_tf" not in m.group(0)
    # and the stored-index result equals the inline-build result
    inline = {
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search(
            inverted_postings_sharded(docs), "part", "filter"
        ).collect()
    }
    assert {
        (r["doc_id"], r["n_occurrences"]) for r in q.collect()
    } == inline


def test_guards_fail_loudly_not_degrade(spark):
    """Degenerate parameters raise instead of silently degrading:
    seg_width 0 would collapse all postings into one NULL segment,
    salt 0 would put every doc in one null rank bucket, and a repeated
    term inside one query would double-count through the join."""
    import pytest

    from ir_analyses_spark.llm.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "cat")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="seg_width"):
        inverted_postings_sharded(docs, seg_width=0)
    with pytest.raises(ValueError, match="salt"):
        bm25_topk(docs, {1: ("cat",)}, salt=0)
    with pytest.raises(ValueError, match="k and salt"):
        bm25_topk(docs, {1: ("cat",)}, k=0)
    # duplicate term within one query scores once, not twice
    once = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, {1: ("cat",)}).collect()
    }
    dup = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, {1: ("cat", "cat")}).collect()
    }
    assert once == dup


def test_bm25_empty_corpus_scores_nothing_not_raises(spark):
    """An empty corpus makes the totals row NULL; the overflow guard
    must pass the NULL through (empty result downstream), not raise a
    misleading overflow error out of the NULL comparison."""
    from ir_analyses_spark.llm.retrieval import bm25_topk

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_scores(empty, ("cat",)).count() == 0
    assert bm25_topk(empty, {1: ("cat",)}).count() == 0


def test_oracle_qterms_share_dedup_by_construction():
    """r13 ADVICE 3: the DuckDB oracle's qterms VALUES list is built
    from _qterm_pairs — the SAME rows bm25_topk joins against — so a
    repeated term in a future _QUERY_BATCH edit dedups on BOTH sides
    instead of double-counting in the oracle only."""
    from ir_analyses_spark.llm.retrieval import (
        _QB_SQL,
        _QUERY_BATCH,
        _qterm_pairs,
    )

    # the helper dedups within a query but not across queries
    assert _qterm_pairs({1: ("cat", "cat", "dog"), 2: ("cat",)}) == [
        (1, "cat"),
        (1, "dog"),
        (2, "cat"),
    ]
    # and the shipped oracle VALUES list is exactly the helper's rows
    want = ", ".join(f"({q}, '{t}')" for q, t in _qterm_pairs(_QUERY_BATCH))
    assert _QB_SQL == want


def test_stored_index_roundtrip_and_query_parity(spark, tmp_path):
    """r13 VERDICT items 5/6: the stored-index production route. The
    index writes once (token-clustered postings + doclen sidecar +
    frozen corpus-stat meta) and BOTH query forms answered from
    storage equal their from-text/from-inline-index twins row for
    row — the text→storage→parse→score round trip is lossless."""
    from ir_analyses_spark.llm.retrieval import (
        _PHRASE,
        _QUERY_BATCH,
        bm25_topk,
        bm25_topk_stored,
        phrase_search,
        phrase_search_stored,
        read_retrieval_index,
        write_retrieval_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx_dir = str(tmp_path / "ridx")
    meta = write_retrieval_index(docs, idx_dir, seg_width=256)
    assert meta["n_docs"] == docs.count()
    assert meta["t_tokens"] > 0 and meta["max_dl"] > 0
    postings, doclens, rmeta = read_retrieval_index(spark, idx_dir)
    assert rmeta["seg_width"] == 256
    assert doclens.count() == meta["n_docs"]
    # stored postings ARE the inline index (same rows)
    inline = inverted_postings_sharded(docs, 256)
    assert postings.count() == meta["postings_rows"] == inline.count()
    assert (
        postings.exceptAll(inline).count() == 0
        and inline.exceptAll(postings).count() == 0
    )

    # phrase: stored == inline-built
    want_ph = sorted(
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search(inline, *_PHRASE).collect()
    )
    got_ph = sorted(
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search_stored(spark, idx_dir, *_PHRASE).collect()
    )
    assert got_ph == want_ph and len(got_ph) > 0

    # top-k: stored == from-text, rank included (exact-decimal ties)
    want_tk = sorted(
        tuple(r) for r in bm25_topk(docs, _QUERY_BATCH).collect()
    )
    got_tk = sorted(
        tuple(r)
        for r in bm25_topk_stored(spark, idx_dir, _QUERY_BATCH).collect()
    )
    assert got_tk == want_tk and len(got_tk) == 30


def test_stored_topk_plan_pushes_token_filter(spark, tmp_path):
    """The stored top-k's scan must read ~the query tokens' rows: the
    token IN-filter reaches the parquet scan (PushedFilters) and the
    postings ReadSchema carries no column the scorer never parses."""
    from ir_analyses_spark.llm.retrieval import (
        bm25_topk_stored,
        write_retrieval_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx_dir = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx_dir)
    df = bm25_topk_stored(spark, idx_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert re.search(r"PushedFilters: \[.*In\(token", plan), plan
    # and the result is non-vacuous
    assert df.count() == 30


def test_stored_index_guards(spark, tmp_path):
    """Missing index and format drift fail loudly; the int64 overflow
    bound re-checks at query time from the frozen meta (shrunken
    ceiling proves the guard bites on the stored route too)."""
    import pytest

    from ir_analyses_spark.llm.retrieval import (
        bm25_topk_stored,
        read_retrieval_index,
        write_retrieval_index,
    )

    with pytest.raises(FileNotFoundError, match="no retrieval index"):
        read_retrieval_index(spark, str(tmp_path / "nope"))

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog")], "doc_id long, text string"
    )
    idx_dir = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx_dir)
    with pytest.raises(ValueError, match="exceeds the int64 rescale"):
        bm25_topk_stored(spark, idx_dir, {1: ("cat",)}, _i64=100)
    with pytest.raises(ValueError, match="k and salt"):
        bm25_topk_stored(spark, idx_dir, {1: ("cat",)}, k=0)


def test_proximity_search_exact_semantics(spark):
    """Windowed co-occurrence parsed from the segmented index equals a
    brute-force position model: n_pairs counts 0 < |p1-p2| <= d pairs,
    min_dist is the smallest, docs outside the window drop even when
    both terms co-occur (the distance filter must BITE)."""
    from ir_analyses_spark.llm.retrieval import proximity_search

    texts = {
        1: "a x b",                  # dist 2: within d=2
        2: "a x x x b",              # dist 4: both terms, OUTSIDE d=2
        3: "a b a x b",              # pairs: |1-2|=1,|1-5|=4,|3-2|=1,|3-5|=2
        4: "a a a",                  # t2 absent
        5: "b x a",                  # dist 2 (order-insensitive)
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    idx = inverted_postings_sharded(docs, seg_width=2)
    got = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_search(idx, "a", "b", 2).collect()
    }
    assert got == {1: (1, 2), 3: (3, 1), 5: (1, 2)}
    # d widens -> doc 2 enters, doc 3 gains its dist-4 pair
    got4 = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_search(idx, "a", "b", 4).collect()
    }
    assert got4 == {1: (1, 2), 2: (1, 4), 3: (4, 1), 5: (1, 2)}
    # t1 == t2: each unordered self-pair once (p1 < p2), zero excluded
    self_pairs = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_search(idx, "a", "a", 2).collect()
    }
    assert self_pairs == {3: (1, 2), 4: (3, 1)}
    import pytest

    with pytest.raises(ValueError, match="d must be"):
        proximity_search(idx, "a", "b", 0)


def test_proximity_registry_bites(spark):
    """The certificate pair/window is non-vacuous at the correctness
    SF AND the distance filter excludes real co-occurring docs."""
    from ir_analyses_spark.llm.retrieval import (
        _PROX,
        _PROX_D,
        proximity_search_postings,
    )

    got = proximity_search_postings(spark, "/root/testdata/sf0.001")
    n_within = got.count()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = inverted_postings_sharded(docs)
    from ir_analyses_spark.llm.retrieval import proximity_search

    n_both = proximity_search(idx, *_PROX, 10_000).count()
    assert 0 < n_within < n_both  # filter bites, result non-empty


def test_append_equals_full_rebuild(spark, tmp_path):
    """Incremental index growth: append(batch2 into index(batch1)) is
    BYTE-IDENTICAL to build(batch1 ∪ batch2) — postings strings, stats
    rows, doclens, and meta all equal — so queries cannot tell how the
    index was grown (the fingerprint store's batch discipline applied
    to retrieval)."""
    from ir_analyses_spark.llm.retrieval import (
        _QUERY_BATCH,
        append_retrieval_index,
        bm25_topk,
        bm25_topk_stored,
        read_retrieval_index,
        write_retrieval_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b1 = docs.filter("doc_id % 3 != 0")
    b2 = docs.filter("doc_id % 3 = 0")
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    write_retrieval_index(b1, inc_dir, seg_width=256)
    out = append_retrieval_index(b2, inc_dir)
    want = write_retrieval_index(docs, full_dir, seg_width=256)
    assert out == want
    pi, di, mi = read_retrieval_index(spark, inc_dir)
    pf, df_, mf = read_retrieval_index(spark, full_dir)
    assert mi == mf
    assert pi.exceptAll(pf).count() == 0 and pf.exceptAll(pi).count() == 0
    assert di.exceptAll(df_).count() == 0 and df_.exceptAll(di).count() == 0
    # and the query surface agrees with the from-text form end to end
    want_tk = sorted(tuple(r) for r in bm25_topk(docs, _QUERY_BATCH).collect())
    got_tk = sorted(
        tuple(r) for r in bm25_topk_stored(spark, inc_dir, _QUERY_BATCH).collect()
    )
    assert got_tk == want_tk


# slow: append crash-recovery lifecycle; the staged-swap invariant is pinned in test_retrieval_stream
@pytest.mark.slow
def test_append_guards_and_crash_recovery(spark, tmp_path):
    """Duplicate doc_ids (within the batch or vs the index) refuse
    loudly; a promotion crashed between its two renames reads from the
    __old remnant (read-around, mutation-free) and the next append
    repairs it."""
    import os

    import pytest

    from ir_analyses_spark.llm.retrieval import (
        append_retrieval_index,
        phrase_search_stored,
        read_retrieval_index,
        write_retrieval_index,
    )

    d1 = spark.createDataFrame(
        [(1, "part filter part"), (2, "scan part")], "doc_id long, text string"
    )
    idx = str(tmp_path / "ridx")
    write_retrieval_index(d1, idx, seg_width=256)
    # batch repeating a doc_id internally
    with pytest.raises(ValueError, match="repeats doc_ids"):
        append_retrieval_index(
            spark.createDataFrame(
                [(9, "a"), (9, "b")], "doc_id long, text string"
            ),
            idx,
        )
    # batch colliding with the index
    with pytest.raises(ValueError, match="already indexed"):
        append_retrieval_index(
            spark.createDataFrame([(2, "x")], "doc_id long, text string"),
            idx,
        )
    # simulate the between-renames crash window: only __old exists
    os.rename(idx, idx + "__old")
    _, _, meta = read_retrieval_index(spark, idx)  # read-around resolves
    assert meta["n_docs"] == 2
    # the next WRITE repairs the shape, then appends
    out = append_retrieval_index(
        spark.createDataFrame([(3, "part filter")], "doc_id long, text string"),
        idx,
    )
    assert out["n_docs"] == 3
    assert not os.path.exists(idx + "__old")
    assert {r["doc_id"] for r in
            phrase_search_stored(spark, idx, "part", "filter").collect()} == {1, 3}


# slow: guard-refusal lifecycle; builds a full store per spelling
@pytest.mark.slow
def test_build_refuses_existing_index_and_append_path_spellings(spark, tmp_path):
    """Hardening (r14 self-review): building over an existing index
    raises — a crash mid-overwrite would leave the OLD meta over
    half-written postings, and readers would answer from garbage
    believing it real. And append normalizes Hadoop's local file:
    spellings onto its rename path while refusing remote ones."""
    import pytest

    from ir_analyses_spark.llm.retrieval import (
        append_retrieval_index,
        read_retrieval_index,
        write_retrieval_index,
    )

    docs = spark.createDataFrame(
        [(1, "part filter"), (2, "scan part")], "doc_id long, text string"
    )
    idx = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx, seg_width=256)
    with pytest.raises(ValueError, match="already exists"):
        write_retrieval_index(docs, idx, seg_width=256)
    # file:///abs and file:/abs spell the same local dir — append works
    more = spark.createDataFrame(
        [(3, "part filter again")], "doc_id long, text string"
    )
    out = append_retrieval_index(more, "file://" + idx)
    assert out["n_docs"] == 3
    _, _, meta = read_retrieval_index(spark, idx)
    assert meta["n_docs"] == 3
    out2 = append_retrieval_index(
        spark.createDataFrame([(4, "part")], "doc_id long, text string"),
        "file:" + idx,
    )
    assert out2["n_docs"] == 4
    # remote spellings refuse loudly (rename-based promotion is local)
    with pytest.raises(ValueError, match="requires a local index"):
        append_retrieval_index(more, "s3a://bucket/ridx")
    with pytest.raises(ValueError, match="requires a local index"):
        append_retrieval_index(more, "file://host/ridx")


def test_boolean_search_exact_semantics(spark):
    """AND + NOT set algebra with the tf payload: doc 1 carries both
    must terms (tf_sum counts every occurrence), doc 2 misses one must
    term, doc 3 carries both but also the banned term (NOT bites),
    doc 257 matches from a different segment."""
    from ir_analyses_spark.llm.retrieval import boolean_search

    docs = spark.createDataFrame(
        [
            (1, "customer x filter customer y"),
            (2, "customer only here"),
            (3, "customer filter dup"),
            (257, "filter z customer"),
        ],
        "doc_id long, text string",
    )
    idx = inverted_postings_sharded(docs)
    got = {
        r["doc_id"]: r["tf_sum"]
        for r in boolean_search(idx, ("customer", "filter"), ("dup",)).collect()
    }
    assert got == {1: 3, 257: 2}
    # without the NOT, doc 3 matches too — the exclusion is what
    # removed it, not the AND
    got_and = {
        r["doc_id"]: r["tf_sum"]
        for r in boolean_search(idx, ("customer", "filter")).collect()
    }
    assert got_and == {1: 3, 3: 2, 257: 2}


def test_boolean_search_guards_fail_loudly(spark):
    """An empty must-list (vacuous AND) and a term in both lists (a
    contradiction that silently matches nothing) both raise; a
    duplicated must term dedups instead of demanding tf twice."""
    import pytest

    from ir_analyses_spark.llm.retrieval import boolean_search

    docs = spark.createDataFrame(
        [(1, "customer filter")], "doc_id long, text string"
    )
    idx = inverted_postings_sharded(docs)
    with pytest.raises(ValueError, match="must-terms may not be empty"):
        boolean_search(idx, ())
    with pytest.raises(ValueError, match="both must and must_not"):
        boolean_search(idx, ("customer",), ("customer",))
    got = {
        r["doc_id"]: r["tf_sum"]
        for r in boolean_search(idx, ("customer", "customer")).collect()
    }
    assert got == {1: 1}


def test_boolean_registry_not_bites(spark):
    """At sf0.001 the certificate's NOT-term excludes a non-empty strict
    subset of the AND matches — the driver hash certifies exclusion,
    not mere conjunction."""
    from ir_analyses_spark.llm.retrieval import (
        _BOOL_MUST,
        boolean_search,
        boolean_search_postings,
    )

    masked = boolean_search_postings(spark, "/root/testdata/sf0.001").count()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    unmasked = boolean_search(
        inverted_postings_sharded(docs), _BOOL_MUST
    ).count()
    assert 0 < masked < unmasked


def test_boolean_plan_no_sort_and_pushed_tokens(spark):
    """Boolean retrieval is joins + one bounded aggregate: no window,
    no global sort anywhere in the plan, and the query-token filter is
    pushed below the inline index build to the token explode."""
    from ir_analyses_spark.llm.retrieval import boolean_search_postings

    plan = (
        boolean_search_postings(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "TakeOrdered" not in plan
    explodes = [m.start() for m in re.finditer(r"Generate posexplode", plan)]
    assert explodes, plan
    for pos in explodes:
        assert re.search(
            r"IN \(customer,filter,dup\)", plan[max(0, pos - 300):pos]
        ), plan[max(0, pos - 300):pos + 100]


def test_kwic_exact_semantics(spark):
    """Clamped windowing around the FIRST occurrence: doc 1 middle hit
    (full window), doc 2 hit at position 1 (left clamp), doc 3 hit at
    the last token (right clamp), doc 4 multi-occurrence (first wins),
    doc 257 matches from a different segment."""
    from ir_analyses_spark.llm.retrieval import kwic_snippets

    docs = spark.createDataFrame(
        [
            (1, "a b c line d e f"),
            (2, "line x y"),
            (3, "p q r line"),
            (4, "u line v w line z"),
            (257, "m line n"),
        ],
        "doc_id long, text string",
    )
    idx = inverted_postings_sharded(docs)
    got = {
        r["doc_id"]: (r["p_first"], r["snippet"])
        for r in kwic_snippets(docs, idx, "line", 2).collect()
    }
    assert got == {
        1: (4, "b c line d e"),
        2: (1, "line x y"),
        3: (4, "q r line"),
        4: (2, "u line v w"),
        257: (2, "m line n"),
    }
    import pytest

    with pytest.raises(ValueError, match="width must be >= 1"):
        kwic_snippets(docs, idx, "line", 0)


def test_kwic_registry_clamps_and_first_bite(spark):
    """At sf0.001 the certificate term produces left-clamped snippets
    (hit inside the first W tokens), right-clamped snippets (hit inside
    the last W), and multi-occurrence docs where only the FIRST
    occurrence is rendered — all three edge behaviors are inside the
    driver hash."""
    from pyspark.sql import functions as F

    from ir_analyses_spark.llm.retrieval import (
        _KWIC_W,
        kwic_snippets_postings,
    )

    rows = kwic_snippets_postings(spark, "/root/testdata/sf0.001").collect()
    assert rows
    n_tok = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    full = 2 * _KWIC_W + 1
    left = [r for r in rows if r["p_first"] <= _KWIC_W]
    right = [r for r in rows if r["p_first"] + _KWIC_W > n_tok[r["doc_id"]]]
    assert left and right
    for r in rows:
        want_len = (
            min(r["p_first"] + _KWIC_W, n_tok[r["doc_id"]])
            - max(r["p_first"] - _KWIC_W, 1)
            + 1
        )
        toks = r["snippet"].split(" ")
        assert len(toks) == want_len <= full
        # the rendered window really is centered on an occurrence
        assert toks[min(r["p_first"], _KWIC_W + 1) - 1] == "line"


def test_kwic_plan_no_position_unroll(spark):
    """p_first reads element 0 of the entry's position list — the plan
    explodes postings entries (one Generate per doc-entry) but NEVER
    the positions inside an entry: exactly one explode beyond the
    inline build's posexplode."""
    from ir_analyses_spark.llm.retrieval import kwic_snippets_postings

    plan = (
        kwic_snippets_postings(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Generate explode", plan)) == 1, plan
    assert "Window" not in plan


# slow: delete lifecycle breadth; the core mask is oracle-checked (retrieval_delete_search)
@pytest.mark.slow
def test_delete_masks_all_stored_queries_and_promotes_next_best(spark, tmp_path):
    """Tombstoning doc 1 removes it from phrase / boolean / kwic /
    proximity results immediately, and the top-k rank PROMOTES the
    next-best survivor (a k-row result, never k−1) while surviving
    docs' scores stay frozen (Lucene deletion semantics)."""
    from ir_analyses_spark.llm.retrieval import (
        bm25_topk_stored,
        boolean_search_stored,
        delete_from_retrieval_index,
        kwic_snippets_stored,
        phrase_search_stored,
        proximity_search_stored,
        retrieval_index_stats,
        write_retrieval_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "part filter part filter line"),
            (2, "part filter x line y"),
            (3, "part filter y line part"),
            (4, "part z q filter dup"),
            # filler docs WITHOUT the query terms, so df('part') < N/2
            # and idf is positive (df = N would flip the ranking)
            (5, "x y"),
            (6, "y z"),
            (7, "z w"),
            (8, "w x"),
            (9, "x z"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx, seg_width=256)
    before = bm25_topk_stored(spark, idx, {1: ("part",)}, k=2)
    assert [r["doc_id"] for r in before.orderBy("rank").collect()] == [1, 3]
    out = delete_from_retrieval_index(spark, idx, [1])
    assert out == {"deleted": 1, "n_tombstones": 1}
    assert {
        r["doc_id"]
        for r in phrase_search_stored(spark, idx, "part", "filter").collect()
    } == {2, 3}
    assert {
        r["doc_id"]
        for r in boolean_search_stored(
            spark, idx, ("part", "filter"), ("dup",)
        ).collect()
    } == {2, 3}
    assert {
        r["doc_id"]
        for r in kwic_snippets_stored(spark, idx, docs, "line", 1).collect()
    } == {2, 3}
    assert {
        r["doc_id"]
        for r in proximity_search_stored(spark, idx, "part", "filter", 3).collect()
    } == {2, 3, 4}
    after = bm25_topk_stored(spark, idx, {1: ("part",)}, k=2)
    rows = after.orderBy("rank").collect()
    # doc 3 promoted to rank 1, the next-best survivor takes the freed
    # rank 2 (k rows, never k−1) — and doc 3's score is IDENTICAL
    # pre/post delete (frozen stats)
    assert len(rows) == 2 and rows[0]["doc_id"] == 3
    assert rows[1]["doc_id"] in (2, 4)
    s3_before = {r["doc_id"]: r["score"] for r in before.collect()}[3]
    assert rows[0]["score"] == s3_before
    st = retrieval_index_stats(spark, idx)
    assert (st["n_docs"], st["n_tombstones"], st["n_live_docs"]) == (9, 1, 8)


# slow: delete guard/replay lifecycle variant of the oracle-checked path
@pytest.mark.slow
def test_delete_guards_and_idempotent_replay(spark, tmp_path):
    """Unknown doc_ids raise (a typo'd delete must not report success),
    an empty set raises, a bad marker raises, and replaying the same
    delete batch (by ids or by marker) is a no-op that converges."""
    import pytest

    from ir_analyses_spark.llm.retrieval import (
        delete_from_retrieval_index,
        write_retrieval_index,
    )

    docs = spark.createDataFrame(
        [(1, "part filter"), (2, "scan part")], "doc_id long, text string"
    )
    idx = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx, seg_width=256)
    with pytest.raises(ValueError, match="never indexed"):
        delete_from_retrieval_index(spark, idx, [99])
    with pytest.raises(ValueError, match="empty doc_id set"):
        delete_from_retrieval_index(spark, idx, [])
    with pytest.raises(ValueError, match="safe filename"):
        delete_from_retrieval_index(spark, idx, [1], marker="a/b")
    out = delete_from_retrieval_index(spark, idx, [1], marker="batch-A")
    assert out == {"deleted": 1, "n_tombstones": 1}
    replay = delete_from_retrieval_index(spark, idx, [1], marker="batch-A")
    assert replay["deleted"] == 0 and replay["replayed_noop"]
    # reusing a marker for a DIFFERENT doc set is not a replay — a
    # silent no-op would report success for a record that still
    # matches every query (review-caught)
    with pytest.raises(ValueError, match="cannot name two different"):
        delete_from_retrieval_index(spark, idx, [2], marker="batch-A")
    # remote spellings refuse loudly (rename-based maintenance scope)
    with pytest.raises(ValueError, match="requires a local index"):
        delete_from_retrieval_index(spark, "s3a://b/ridx", [1])


# slow: stored-index lifecycle; delete masking itself is oracle-checked (retrieval_delete_search)
@pytest.mark.slow
def test_stored_queries_see_tombstones_through_file_spelling(spark, tmp_path):
    """file:///p and /p name the same index and must agree about
    deletions: a delete through the plain path masks queries and
    reports stats through the file: spelling too (review-caught — an
    unnormalized probe would silently resurrect deleted docs)."""
    from ir_analyses_spark.llm.retrieval import (
        delete_from_retrieval_index,
        phrase_search_stored,
        retrieval_index_stats,
        write_retrieval_index,
    )

    docs = spark.createDataFrame(
        [(1, "part filter"), (2, "part filter x")], "doc_id long, text string"
    )
    idx = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx, seg_width=256)
    delete_from_retrieval_index(spark, idx, [1])
    for spelling in (f"file://{idx}", f"file:{idx}"):
        assert {
            r["doc_id"]
            for r in phrase_search_stored(
                spark, spelling, "part", "filter"
            ).collect()
        } == {2}, spelling
        st = retrieval_index_stats(spark, spelling)
        assert (st["n_tombstones"], st["n_live_docs"]) == (1, 1), spelling


# slow: crash-ordering lifecycle variant of the oracle-checked delete path
@pytest.mark.slow
def test_delete_crash_remnant_never_surfaces(spark, tmp_path):
    """A delete that crashed mid-parquet-write leaves only a __tmp
    remnant: readers must NOT surface it as tombstones (the batch's
    delete call never returned), and the next delete clears it."""
    import os

    from ir_analyses_spark.llm.retrieval import (
        _read_tombstones,
        delete_from_retrieval_index,
        phrase_search_stored,
        write_retrieval_index,
    )

    docs = spark.createDataFrame(
        [(1, "part filter"), (2, "part filter x")], "doc_id long, text string"
    )
    idx = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx, seg_width=256)
    # simulate the crash: a fully-written parquet dir still named __tmp
    tmp = os.path.join(idx, "_tombstones", "del-000000__tmp")
    spark.createDataFrame([(1,)], "doc_id long").coalesce(1).write.parquet(tmp)
    assert _read_tombstones(spark, idx) is None
    assert phrase_search_stored(spark, idx, "part", "filter").count() == 2
    out = delete_from_retrieval_index(spark, idx, [2])
    assert out == {"deleted": 1, "n_tombstones": 1}
    assert not os.path.exists(tmp)
    assert {
        r["doc_id"]
        for r in phrase_search_stored(spark, idx, "part", "filter").collect()
    } == {1}


# slow: vacuum lifecycle; the masked-read contract is oracle-checked (retrieval_delete_search)
@pytest.mark.slow
def test_vacuum_equals_fresh_build_and_clears_tombstones(spark, tmp_path):
    """Vacuum is a rebuild in place: postings, doclens and meta of the
    vacuumed index equal a fresh build over exactly the surviving docs
    (so post-vacuum scores are rebuild scores), the tombstone set is
    consumed in the same promotion, a tombstone-free vacuum is a no-op,
    and a reclaimed doc_id may be re-appended."""
    from ir_analyses_spark.llm.retrieval import (
        _read_tombstones,
        append_retrieval_index,
        delete_from_retrieval_index,
        read_retrieval_index,
        vacuum_retrieval_index,
        write_retrieval_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx, fresh = str(tmp_path / "ridx"), str(tmp_path / "fresh")
    write_retrieval_index(docs, idx, seg_width=256)
    assert vacuum_retrieval_index(spark, idx)["replayed_noop"]
    delete_from_retrieval_index(
        spark, idx, docs.filter("doc_id % 10 = 3").select("doc_id")
    )
    out = vacuum_retrieval_index(spark, idx)
    assert out["removed_docs"] == 50 and out["n_docs"] == 450
    write_retrieval_index(
        docs.filter("doc_id % 10 != 3"), fresh, seg_width=256
    )
    pv, dv, mv = read_retrieval_index(spark, idx)
    pf, df_, mf = read_retrieval_index(spark, fresh)
    assert mv == mf
    assert pv.exceptAll(pf).count() == 0 and pf.exceptAll(pv).count() == 0
    assert dv.exceptAll(df_).count() == 0 and df_.exceptAll(dv).count() == 0
    assert _read_tombstones(spark, idx) is None
    # the reclaimed ids are re-appendable (they are really gone)
    out2 = append_retrieval_index(
        docs.filter("doc_id = 3"), idx
    )
    assert out2["n_docs"] == 451


# slow: append+tombstone lifecycle; append==rebuild stays fast in-suite
@pytest.mark.slow
def test_append_carries_tombstones_and_tombstoned_refuses_reappend(
    spark, tmp_path
):
    """Deletion is independent of growth: an append promotes the index
    WITH its pending tombstones (masking survives), and re-appending a
    tombstoned-but-unvacuumed doc_id still refuses (its postings are
    masked, not gone — appending would interleave duplicates)."""
    import pytest

    from ir_analyses_spark.llm.retrieval import (
        append_retrieval_index,
        delete_from_retrieval_index,
        phrase_search_stored,
        write_retrieval_index,
    )

    docs = spark.createDataFrame(
        [(1, "part filter"), (2, "part filter x")], "doc_id long, text string"
    )
    idx = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx, seg_width=256)
    delete_from_retrieval_index(spark, idx, [1])
    with pytest.raises(ValueError, match="already indexed"):
        append_retrieval_index(
            spark.createDataFrame([(1, "part filter again")],
                                  "doc_id long, text string"),
            idx,
        )
    append_retrieval_index(
        spark.createDataFrame([(3, "part filter z")],
                              "doc_id long, text string"),
        idx,
    )
    assert {
        r["doc_id"]
        for r in phrase_search_stored(spark, idx, "part", "filter").collect()
    } == {2, 3}


def test_delete_registry_bites(spark):
    """At sf0.001 the certificate delete set removes phrase-matching
    docs: the masked result is a non-empty strict subset of the
    unmasked one, and no surviving row carries a deleted id."""
    from ir_analyses_spark.llm.retrieval import (
        _DEL_MOD,
        _DEL_REM,
        phrase_search_postings,
        retrieval_delete_search,
    )

    masked = retrieval_delete_search(spark, "/root/testdata/sf0.001").collect()
    unmasked = phrase_search_postings(spark, "/root/testdata/sf0.001").count()
    assert 0 < len(masked) < unmasked
    assert all(r["doc_id"] % _DEL_MOD != _DEL_REM for r in masked)


def test_phrase_n_exact_semantics(spark):
    """n-token adjacency: a 3-phrase counts every occurrence, a
    REPEATED token inside the phrase joins the same frame at two
    offsets (doc 5: 'g g g' contains 'g g' twice but 'x g g' once),
    cross-segment docs match, a doc with all tokens non-adjacent does
    NOT, n = 4 works, and n = 1 raises."""
    import pytest

    from ir_analyses_spark.llm.retrieval import phrase_search, phrase_search_n

    docs = spark.createDataFrame(
        [
            (1, "a b c d a b c"),
            (2, "a c b d"),
            (5, "x g g g y"),
            (257, "q a b c"),
        ],
        "doc_id long, text string",
    )
    idx = inverted_postings_sharded(docs)
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search_n(idx, ("a", "b", "c")).collect()
    }
    assert got == {1: 2, 257: 1}
    rep = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search_n(idx, ("x", "g", "g")).collect()
    }
    assert rep == {5: 1}
    rep2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search_n(idx, ("g", "g")).collect()
    }
    assert rep2 == {5: 2}
    four = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search_n(idx, ("a", "b", "c", "d")).collect()
    }
    assert four == {1: 1}
    # the 2-token special case IS phrase_search (delegation, not twins)
    assert sorted(
        tuple(r) for r in phrase_search(idx, "a", "b").collect()
    ) == sorted(tuple(r) for r in phrase_search_n(idx, ("a", "b")).collect())
    with pytest.raises(ValueError, match="needs >= 2 tokens"):
        phrase_search_n(idx, ("a",))


def test_phrase_multi_registry_bites(spark):
    """At sf0.001 the 3-token certificate matches a non-empty strict
    subset of its own 2-token prefix's matches — the THIRD adjacency
    constraint (on a repeated token) is what the driver hash pins."""
    from ir_analyses_spark.llm.retrieval import (
        _PHRASE3,
        phrase_multi_search_postings,
        phrase_search,
    )

    rows = phrase_multi_search_postings(spark, "/root/testdata/sf0.001").count()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prefix = phrase_search(
        inverted_postings_sharded(docs), _PHRASE3[0], _PHRASE3[1]
    ).count()
    assert 0 < rows < prefix


def test_stored_boolean_and_kwic_prune_scan(spark, tmp_path):
    """The stored boolean and kwic routes push their token filters to
    the postings parquet scan (PushedFilters), the same pruning pin as
    the stored phrase/top-k routes."""
    from ir_analyses_spark.llm.retrieval import (
        boolean_search_stored,
        kwic_snippets_stored,
        write_retrieval_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx, seg_width=256)
    plan_b = (
        boolean_search_stored(spark, idx, ("customer", "filter"), ("dup",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"PushedFilters: .*In\(token, \[customer,dup,filter\]", plan_b) or \
        re.search(r"PushedFilters: .*In\(token", plan_b), plan_b
    plan_k = (
        kwic_snippets_stored(spark, idx, docs, "line", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(token), EqualTo(token,line)]" in plan_k, plan_k


def test_vocab_prefix_semantics_and_guard(spark):
    """Per-token df/total_tf recomposed from segment partial sums: a
    token split across segments re-sums correctly, non-matching tokens
    are absent, and the empty prefix (whole-vocabulary aggregation)
    raises."""
    import pytest

    from ir_analyses_spark.llm.retrieval import vocab_prefix

    docs = spark.createDataFrame(
        [
            (1, "scan sort scan x"),
            (2, "sort y"),
            (257, "scan z sort sort"),
        ],
        "doc_id long, text string",
    )
    idx = inverted_postings_sharded(docs)
    got = {
        r["token"]: (r["df"], r["total_tf"])
        for r in vocab_prefix(idx, "s").collect()
    }
    assert got == {"scan": (2, 3), "sort": (3, 4)}
    assert {
        r["token"] for r in vocab_prefix(idx, "sc").collect()
    } == {"scan"}
    with pytest.raises(ValueError, match="empty prefix"):
        vocab_prefix(idx, "")


def test_vocab_prefix_registry_bites(spark):
    """At sf0.001 the certificate prefix matches several tokens but a
    strict subset of the vocabulary — the prefix filter is what the
    driver hash pins, not a full-vocabulary dump."""
    from ir_analyses_spark.llm.retrieval import vocab_prefix_postings

    rows = vocab_prefix_postings(spark, "/root/testdata/sf0.001").collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    n_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w").distinct().count()
    )
    assert 1 < len(rows) < n_vocab
    assert all(r["token"].startswith("s") for r in rows)
    assert all(r["total_tf"] >= r["df"] >= 1 for r in rows)


def test_vocab_prefix_stored_pushes_startswith(spark, tmp_path):
    """The stored route's prefix predicate reaches the parquet scan as
    StringStartsWith over the token-sorted layout — the prefix query
    never reads the non-matching vocabulary."""
    from ir_analyses_spark.llm.retrieval import (
        vocab_prefix_stored,
        write_retrieval_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "ridx")
    write_retrieval_index(docs, idx, seg_width=256)
    df = vocab_prefix_stored(spark, idx, "s")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith(token,s)" in plan, plan
    assert df.count() > 1


def test_randomized_reference_corpus(spark):
    """Seeded random corpus (200 docs, 7-token vocab → dense
    collisions, every doc-length edge) checked against pure-Python
    references in one pass per query form — the certificate phrases
    are fixed, this pins the OPERATORS on adversarial inputs: phrases
    of length 2/3/4 incl. all-same-token runs, boolean AND+NOT, kwic
    clamps, vocab prefix and proximity all agree with a direct
    recomputation from the raw text."""
    import random

    from ir_analyses_spark.llm.retrieval import (
        boolean_search,
        kwic_snippets,
        phrase_search_n,
        proximity_search,
        vocab_prefix,
    )

    rnd = random.Random(20260816)
    vocab = ["aa", "ab", "ba", "cc", "cd", "dd", "e"]
    docs = {
        i: " ".join(
            rnd.choice(vocab) for _ in range(rnd.randint(1, 30))
        )
        for i in range(1, 201)
    }
    docs[300] = "aa ab aa"  # force a second segment at seg_width=64
    df = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    )
    idx = inverted_postings_sharded(df, seg_width=64)
    toks = {d: t.split(" ") for d, t in docs.items()}

    def count_phrase(ws, ph):
        return sum(
            1
            for i in range(len(ws) - len(ph) + 1)
            if tuple(ws[i:i + len(ph)]) == ph
        )

    for ph in [("aa", "ab"), ("aa", "aa"), ("aa", "ab", "aa"),
               ("cc", "cc", "cc"), ("ab", "ba", "cc", "cd")]:
        want = {
            d: c for d, ws in toks.items() if (c := count_phrase(ws, ph))
        }
        got = {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_search_n(idx, ph).collect()
        }
        assert got == want, ph

    want_b = {
        d: ws.count("aa") + ws.count("ba")
        for d, ws in toks.items()
        if "aa" in ws and "ba" in ws and "cc" not in ws
    }
    got_b = {
        r["doc_id"]: r["tf_sum"]
        for r in boolean_search(idx, ("aa", "ba"), ("cc",)).collect()
    }
    assert got_b == want_b

    W = 3
    want_k = {}
    for d, ws in toks.items():
        if "cd" in ws:
            p = ws.index("cd") + 1
            lo, hi = max(p - W, 1), min(p + W, len(ws))
            want_k[d] = (p, " ".join(ws[lo - 1:hi]))
    got_k = {
        r["doc_id"]: (r["p_first"], r["snippet"])
        for r in kwic_snippets(df, idx, "cd", W).collect()
    }
    assert got_k == want_k

    want_v = {}
    for d, ws in toks.items():
        for w in ws:
            if w.startswith("a"):
                df_, tf_ = want_v.get(w, (set(), 0))
                df_.add(d)
                want_v[w] = (df_, tf_ + 1)
    got_v = {
        r["token"]: (r["df"], r["total_tf"])
        for r in vocab_prefix(idx, "a").collect()
    }
    assert got_v == {w: (len(df_), tf_) for w, (df_, tf_) in want_v.items()}

    D = 4
    want_p = {}
    for d, ws in toks.items():
        pairs = [
            (i + 1, j + 1)
            for i, w1 in enumerate(ws) if w1 == "ab"
            for j, w2 in enumerate(ws) if w2 == "dd"
            if 0 < abs(i - j) <= D
        ]
        if pairs:
            want_p[d] = (len(pairs), min(abs(i - j) for i, j in pairs))
    got_p = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_search(idx, "ab", "dd", D).collect()
    }
    assert got_p == want_p
