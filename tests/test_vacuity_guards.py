"""Vacuity guards: a filtering query whose predicate never fires (or
always fires) passes its cross-engine oracle trivially while testing none
of its advertised semantics. This bug class has now appeared three times —
Q22's URGENT anti-join (vacuous until 2af3644), Q11's 0.18-then-0.168
threshold (vacuous at growing SF until the /6 fix), and vocab_oov_rate's
top-1000 cut over a 31-token domain (identically-zero OOV until the
top-16 fix). These guards assert BOTH the keep and the drop path produce
rows at the correctness scale factors, so a data regeneration or constant
tweak that re-introduces vacuity fails loudly here instead of silently
greening the parity sweep.

The guards run the ORACLE SQL in DuckDB (milliseconds, no Spark session):
oracle parity already pins Spark == oracle, so oracle-side non-vacuity is
engine non-vacuity.
"""

from __future__ import annotations

import re

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _con(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf{sf}/{t}.parquet')"
        )
    return con


def _oracle(name: str) -> str:
    from ir_analyses_spark.registry import all_oracles

    return all_oracles()[name]


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def con(request):
    return _con(request.param)


def test_q11_threshold_splits_the_domain(con):
    """concentrated_part_types must keep ≥1 AND drop ≥1 of the 6 part
    types — the HAVING > total/6 cut is above-mean by construction, so
    both sides are non-empty unless shares are exactly uniform."""
    kept = con.execute(_oracle("concentrated_part_types")).fetchall()
    n_types = con.execute(
        "SELECT COUNT(DISTINCT p_type) FROM part"
    ).fetchone()[0]
    assert 1 <= len(kept) < n_types


def test_q22_anti_join_splits_customers(con):
    """idle_customer_balances: the NOT-EXISTS branch must exclude SOME
    positive-balance customers (those holding an order under the
    predicate) and keep others — an order-status predicate matching no
    orders would make the anti-join a no-op."""
    sql = _oracle("idle_customer_balances")
    kept_total = sum(r[1] for r in con.execute(sql).fetchall())
    # widen: same query without the NOT EXISTS must count MORE customers
    relaxed = re.sub(
        r"AND NOT EXISTS \((?:[^()]|\([^()]*\))*\)", "", sql, flags=re.S
    )
    assert relaxed != sql, "anti-join clause not found — guard is stale"
    relaxed_total = sum(r[1] for r in con.execute(relaxed).fetchall())
    assert 0 < kept_total < relaxed_total


def test_q21_exists_and_not_exists_both_fire(con):
    """suppliers_with_waiting_orders: rows survive (EXISTS keeps some)
    and the NOT-EXISTS drops some — dropping it must change the result."""
    sql = _oracle("suppliers_with_waiting_orders")
    base = con.execute(sql).fetchall()
    relaxed = re.sub(r"AND NOT EXISTS \((?:[^()]|\([^()]*\))*\)", "", sql, flags=re.S)
    assert relaxed != sql
    relaxed_rows = con.execute(relaxed).fetchall()
    assert len(base) > 0
    assert base != relaxed_rows


def test_small_quantity_revenue_filter_fires(con):
    """Q17 shape: the 0.4·avg correlated cut must keep a strict, non-empty
    subset of the joined rows — AND it must actually be CORRELATED. r6
    review lesson: this guard previously hand-inlined `= p_partkey` while
    the production query said `= l_partkey` (an inner-scope tautology =
    the global average), so the guard certified a predicate the query
    never ran. It now derives the count from the PRODUCTION sql text and
    additionally pins that the correlated result differs from the
    uncorrelated (global-average) rewrite."""
    from ir_analyses_spark.ops.subqueries import SMALL_QUANTITY_REVENUE_SQL

    counted = SMALL_QUANTITY_REVENUE_SQL.replace(
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7\n"
        "         AS avg_weekly_revenue",
        "COUNT(*) AS n",
    )
    assert "COUNT(*)" in counted  # the rewrite found the projection
    n_kept = con.execute(counted).fetchone()[0]
    n_all = con.execute(
        "SELECT COUNT(*) FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_size < 10"
    ).fetchone()[0]
    assert 0 < n_kept < n_all
    correlated = con.execute(SMALL_QUANTITY_REVENUE_SQL).fetchone()[0]
    uncorrelated = con.execute(
        SMALL_QUANTITY_REVENUE_SQL.replace(
            "WHERE l2.l_partkey = p_partkey", ""
        )
    ).fetchone()[0]
    assert correlated != uncorrelated


def test_vocab_oov_both_branches_fire(con):
    """vocab_oov_rate: every source must see in-vocab AND out-of-vocab
    tokens — the top-K cut must sit strictly inside the token domain."""
    rows = con.execute(_oracle("vocab_oov_rate")).fetchall()
    assert rows
    for source, n_tokens, n_oov, oov_share in rows:
        assert 0 < n_oov < n_tokens, f"{source}: OOV branch vacuous"


def test_containment_and_jaccard_nonempty(con):
    """The near-dup detectors must find pairs at correctness SF (the
    corpus is seeded with near-duplicates) — and containment must catch
    directional pairs, not just mirror the symmetric Jaccard output."""
    cont = con.execute(_oracle("containment_nearup")).fetchall()
    jac = con.execute(_oracle("ngram_jaccard_nearup")).fetchall()
    assert cont and jac


def test_q6_band_keeps_and_drops(con):
    """forecast_revenue_change: the 3-predicate band must keep a strict,
    non-empty subset of lineitem."""
    n_kept = con.execute(
        "SELECT COUNT(*) FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01'"
        "  AND l_shipdate < TIMESTAMP '1998-01-01'"
        "  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24"
    ).fetchone()[0]
    n_all = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert 0 < n_kept < n_all


def test_q13_zero_bucket_real(con):
    """customer_order_distribution: the c_count=0 bucket (customers with
    no 2001 order) must exist alongside nonzero buckets — it's the outer
    join's null branch, and the whole point of the left-outer shape."""
    rows = con.execute(_oracle("customer_order_distribution")).fetchall()
    counts = {r[0] for r in rows}
    assert 0 in counts and counts - {0}


def test_q16_denylist_excludes_someone(con):
    """supplier_part_variety: dropping the NOT IN must grow some group's
    distinct-supplier count — the denylist has to bite."""
    sql = _oracle("supplier_part_variety")
    relaxed = re.sub(
        r"AND l_suppkey NOT IN \((?:[^()]|\([^()]*\))*\)", "", sql, flags=re.S
    )
    assert relaxed != sql
    assert con.execute(sql).fetchall() != con.execute(relaxed).fetchall()


def test_q18_threshold_selective_nonempty(con):
    """large_volume_customers: the HAVING>250 subquery must qualify some
    but not all orders."""
    n_q = con.execute(
        "SELECT COUNT(*) FROM (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)"
    ).fetchone()[0]
    n_all = con.execute(
        "SELECT COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()[0]
    assert 0 < n_q < n_all


def test_q20_nested_in_selective_nonempty(con):
    """promo_stock_suppliers: the nested IN must admit some suppliers and
    reject others."""
    n_kept = len(con.execute(_oracle("promo_stock_suppliers")).fetchall())
    n_all = con.execute("SELECT COUNT(*) FROM supplier").fetchone()[0]
    assert 0 < n_kept < n_all


def test_recursive_chain_both_clamps_bind(con):
    """recursive_inventory_chain: the LEAST/GREATEST band must actually
    clamp — some quarter pinned at 0, some at cap, and some strictly
    interior. A never-firing bound would collapse the recurrence into a
    window-expressible prefix sum (lower clamp alone has the Lindley
    reflection closed form) and the recursion would certify nothing."""
    rows = con.execute(_oracle("recursive_inventory_chain")).fetchall()
    cap = con.execute(
        "SELECT (SUM(d) * 3) // (COUNT(*) * 4) FROM ("
        "  SELECT SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100"
        "             AS BIGINT)) AS d"
        "  FROM orders GROUP BY CONCAT(CAST(YEAR(o_orderdate) AS VARCHAR),"
        "                              '-Q',"
        "                              CAST(QUARTER(o_orderdate) AS VARCHAR)))"
    ).fetchone()[0]
    vals = [v for (_, v) in rows]
    assert len(rows) > 10, "quarterly series unexpectedly short"
    assert any(v == 0 for v in vals), "lower clamp never fired"
    assert any(v == cap for v in vals), "upper clamp never fired"
    assert any(0 < v < cap for v in vals), "no interior state"
    assert all(0 <= v <= cap for v in vals)


def test_lateral_limit_actually_cuts(con):
    """lateral_topk_per_group: every nation must have MORE than 2
    customers at the test SFs, so the per-group LIMIT 2 genuinely
    discards rows (otherwise the lateral subquery is a plain join)."""
    n_nations = con.execute("SELECT COUNT(*) FROM nation").fetchone()[0]
    rows = con.execute(_oracle("lateral_topk_per_group")).fetchall()
    assert len(rows) == 2 * n_nations
    min_per_nation = con.execute(
        "SELECT MIN(c) FROM (SELECT COUNT(*) AS c FROM customer "
        "GROUP BY c_nationkey)"
    ).fetchone()[0]
    assert min_per_nation > 2


def test_token_topk_sketch_capacity_and_cut(con):
    """token_topk_sketch: the exact-oracle contract holds only while the
    sketch never purges (|vocab| ≤ 1024 tracked items), and the top-25 is
    only a real cut if the vocabulary exceeds 25. Also pin that rank 25
    and 26 are not count-tied, so the boundary is deterministic even
    across engines' differing tie orders."""
    n_vocab = con.execute(
        "SELECT COUNT(DISTINCT token) FROM "
        "(SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)"
    ).fetchone()[0]
    assert 25 < n_vocab <= 1024
    boundary = con.execute(
        "WITH c AS (SELECT token, COUNT(*) AS cnt FROM "
        "  (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)"
        "  GROUP BY token),"
        "r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) rn FROM c)"
        "SELECT (SELECT cnt FROM r WHERE rn = 25), (SELECT cnt FROM r WHERE rn = 26)"
    ).fetchone()
    assert boundary[0] != boundary[1]


def test_pivot_sql_clause_literal_types_all_exist(con):
    """pivot_sql_clause hard-codes the six part types in its IN list (SQL
    PIVOT cannot discover columns at runtime); a data regeneration that
    changes the type domain must fail here, not silently produce all-zero
    pivot columns."""
    types = {
        r[0] for r in con.execute("SELECT DISTINCT p_type FROM part").fetchall()
    }
    assert types == {"PROMO", "ECONOMY", "MEDIUM", "SMALL", "LARGE", "STANDARD"}


def test_collation_mangling_mixes_case(con):
    """collated_string_ops only tests collation if the mangled column
    actually mixes spellings of the same value — i.e. some types appear in
    BOTH cases, so case-sensitive grouping would produce more groups."""
    n_cs, n_ci = con.execute(
        "SELECT COUNT(DISTINCT mangled), COUNT(DISTINCT lower(mangled)) FROM "
        "(SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type END"
        " AS mangled FROM part)"
    ).fetchone()
    assert n_ci < n_cs


def test_bpe_merge_rounds_progress(con):
    """bpe_train_merges: the three rounds must pick three DISTINCT pairs
    with positive, monotone non-increasing counts (a merged pair cannot
    re-form, and any pair a merge creates inherits at most the merged
    pair's count, so a violation means the merge was never applied)."""
    rows = con.execute(_oracle("bpe_train_merges")).fetchall()
    assert len(rows) == 3
    pairs = [(r[1], r[2]) for r in rows]
    assert len(set(pairs)) == 3
    counts = [r[3] for r in rows]
    assert all(c > 0 for c in counts)
    assert counts == sorted(counts, reverse=True)


def test_iqr_fences_flag_some_but_not_all(con):
    """outlier_iqr_flags: every event type must flag SOME outliers and
    keep most rows inside the fences — all-zero (fences too wide /
    comparison broken) or near-total flagging would pass the oracle
    trivially while testing nothing."""
    rows = con.execute(_oracle("outlier_iqr_flags")).fetchall()
    assert rows
    for _etype, n, n_out, _lo, _hi in rows:
        assert 0 < n_out < n // 4


def test_doc_chunking_multi_chunk_and_short_tail(con):
    """doc_chunking: the corpus must actually produce multi-chunk docs
    (otherwise the stride logic is untested) and short tail chunks
    (otherwise the length-clamp is untested); offsets step by exactly the
    150 stride."""
    rows = con.execute(_oracle("doc_chunking")).fetchall()
    by_doc: dict = {}
    for doc_id, chunk_id, offset, chunk_len, _md5 in rows:
        by_doc.setdefault(doc_id, []).append((chunk_id, offset, chunk_len))
    assert any(len(v) > 1 for v in by_doc.values())
    assert any(cl < 200 for v in by_doc.values() for (_, _, cl) in v)
    for v in by_doc.values():
        v.sort()
        for (c1, o1, _), (c2, o2, _) in zip(v, v[1:]):
            assert c2 == c1 + 1 and o2 - o1 == 150


def test_bfs_hops_structure_nontrivial(con):
    """trade_bfs_hops: the 90th-percentile sparsification must leave a
    graph where BFS is non-vacuous — some node strictly beyond hop 1,
    and some nation unreachable (NULL). A near-complete graph (every
    node at hop 1) would make the relaxation loop dead weight."""
    rows = con.execute(_oracle("trade_bfs_hops")).fetchall()
    hops = [h for (_n, h) in rows]
    assert any(h is not None and h >= 2 for h in hops)
    assert any(h is None for h in hops)
    assert sum(1 for h in hops if h == 0) == 1


def test_benchmark_decontaminate_threshold_fires_at_correctness_sfs(con):
    """r6 review: the 2·shared < n containment cut must keep a strict,
    non-empty subset at the driver's correctness SFs — at sf0.1 the
    synthetic generator's ~31-token vocabulary saturates the 8-char
    shingle space and the keep branch legitimately empties (documented
    in the operator docstring); this guard pins that the THRESHOLD does
    real work where correctness is graded. Derived from the PRODUCTION
    oracle text (the Q17 lesson: a hand-inlined predicate copy certifies
    a cut the query may no longer run)."""
    from ir_analyses_spark.llm.sampling import (
        _BENCH_MOD,
        BENCHMARK_DECONTAMINATE_SQL,
    )

    kept = len(con.execute(BENCHMARK_DECONTAMINATE_SQL).fetchall())
    total = con.execute(
        f"SELECT COUNT(*) FROM documents WHERE doc_id % {_BENCH_MOD} <> 0"
    ).fetchone()[0]
    assert 0 < kept < total


def test_clf_gate_threshold_splits_the_corpus(con):
    """quality_classifier_gate must keep some AND drop some documents
    at the correctness SFs — a weight table whose scores never cross 0
    would green the oracle while certifying a constant."""
    rows = con.execute(_oracle("quality_classifier_gate")).fetchall()
    kept = sum(1 for _, _, k in rows if k)
    assert 0 < kept < len(rows), (kept, len(rows))


def test_substring_rebuild_actually_cuts(con):
    """substring_dedup_rebuild must modify some documents AND leave the
    corpus-wide winners intact — a corpus with no 17+-char cross-doc
    runs (or a selection that marks everything) would be vacuous."""
    rebuilt = dict(con.execute(_oracle("substring_dedup_rebuild")).fetchall())
    orig = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    changed = sum(1 for d, t in rebuilt.items() if orig[d] != t)
    assert 0 < changed, "no document was modified"
    # removal is range-scoped, never doc-dropping
    assert set(rebuilt) == set(orig)
    # at least one modified doc keeps a nonempty remainder (range-scoped
    # cutting, not whole-doc blanking)
    assert any(orig[d] != t and len(t) > 0 for d, t in rebuilt.items())


def test_winnow_density_bound(con):
    """winnow_fingerprints_select must select far fewer fingerprints
    than one per character (the 2/(w+1) winnowing density is the whole
    scale argument) while still selecting from every long-enough doc."""
    n_fps = con.execute(
        f"SELECT COUNT(*) FROM ({_oracle('winnow_fingerprints_select')})"
    ).fetchone()[0]
    n_chars, n_docs = con.execute(
        "SELECT SUM(length(text)), COUNT(*) FROM documents WHERE length(text) >= 17"
    ).fetchone()
    assert 0 < n_fps < n_chars / 2
    n_docs_with = con.execute(
        f"SELECT COUNT(DISTINCT doc_id) FROM ({_oracle('winnow_fingerprints_select')})"
    ).fetchone()[0]
    assert n_docs_with == n_docs


def test_substring_incremental_store_path_bites(con):
    """substring_dedup_incremental must exercise BOTH loser rules: some
    new-batch selection loses purely to the STORE (its (fp, probe) has
    exactly one new-batch doc, so intra-batch dedup alone could never
    cut it), and the result must differ from running the batch remover
    on the new batch alone — otherwise the incremental query certifies
    nothing beyond substring_dedup_rebuild."""
    sql = _oracle("substring_dedup_incremental")
    # splice a diagnostic on the oracle's own CTEs: store-only losers
    probe_sql = sql.split("), grp AS")[0] + ")" + """
SELECT COUNT(*) FROM new_p p
JOIN store s ON p.fp = s.fp AND p.probe = s.probe
WHERE (SELECT COUNT(DISTINCT q.doc_id) FROM new_p q
       WHERE q.fp = p.fp AND q.probe = p.probe) = 1
"""
    store_only_losers = con.execute(probe_sql).fetchone()[0]
    assert store_only_losers > 0, "store rule never fired alone"
    incr = dict(con.execute(sql).fetchall())
    orig = dict(
        con.execute(
            "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1"
        ).fetchall()
    )
    assert set(incr) == set(orig)  # cleaning never drops docs
    assert any(incr[d] != orig[d] for d in incr), "nothing was cut"
