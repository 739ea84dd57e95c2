"""Registry queries + DuckDB oracles for the winnowing substring-dedup
surface (`llm/substring_dedup.py`) — r8 VERDICT item 2: both operators
are deterministic and the robust-winnowing selection rule is
SQL-expressible (per-window struct MIN with rightmost tie), so they
take full hash-oracled driver rows.

Cross-engine hash: xxhash64 has no DuckDB twin, so these queries swap
in a PORTABLE k-gram hash via ``winnow_fingerprints``'s ``hash_fn``
hook — Σ codepoint(c_j)·B^(K−1−j) mod M with B=131, M=1e9+7: every
intermediate stays far under 2^63, each term is exact integer
arithmetic in Spark, DuckDB, and Python, and ties (M ≈ 2^30, so they
exist) are resolved identically by both engines' rightmost-tie rule.
The JVM-expression hash path re-seeks character offsets per gram
(UTF8String substr is O(pos)), which is fine for the dimension-sized
``documents`` texts here and exactly why the SCALE path uses the
vectorized rolling hash inside the Arrow worker instead (see
`llm/substring_dedup._select_fingerprints_udf`).

New module per the evidence-ledger rule (`llm/substring_dedup.py`
itself stays registry-free so future edits there only stale these two
rows, not unrelated certified queries — the module-granular staleness
rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from .porthash import port_hash_expr, port_hash_kgrams_np, port_hash_sql
from .substring_dedup import (
    compact_fingerprint_store,
    read_fingerprint_store,
    remove_duplicated_substrings,
    remove_substrings_against_store,
    winnow_fingerprints,
    write_fingerprint_store,
)

_K = 12
_W = 6


def _portable_hash(gram):
    """The shared portable polynomial over the K-char gram column —
    ONE definition for Spark, DuckDB, and Python (`llm/porthash.py`,
    review-caught triplication)."""
    return port_hash_expr(gram, _K)


# r14 (guide §4): the attached numpy twin moves k-gram hashing into
# the winnow's Arrow worker (`substring_dedup._winnow_raw` detects it)
# — bit-exact with the JVM expression (see port_hash_kgrams_np), so
# the DuckDB oracles and the store's scheme tag are untouched, but the
# O(pos)-per-substr JVM projection (measured 19-20 s at sf0.1, ~90% of
# every winnow pass these queries run) is gone.
_portable_hash.np_kgrams = port_hash_kgrams_np


def winnow_fingerprints_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-winnowing fingerprint selection over the documents table:
    (doc_id, pos, fp, probe), K=12 / W=6 (detection guarantee: shared
    runs of ≥ 17 chars). The vocabulary-limited synthetic texts share
    many such runs, so the selection is exercised on real overlaps."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return winnow_fingerprints(
        docs, k=_K, window=_W, hash_fn=_portable_hash
    ).select("doc_id", "pos", "fp", "probe")


def substring_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End state of duplicated-substring removal over the documents
    table: (doc_id, text) with every cross-document duplicated run cut
    from all but its corpus-wide smallest (doc_id, pos) occurrence."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return remove_duplicated_substrings(
        docs, k=_K, window=_W, hash_fn=_portable_hash
    ).select("doc_id", "text")


def substring_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental duplicated-substring removal against an exported
    corpus' fingerprint store (r9 VERDICT item 3's operator,
    `llm/substring_dedup.remove_substrings_against_store`): the even
    doc_ids play the ALREADY-EXPORTED corpus (their winnowed
    fingerprints are the store), the odd doc_ids are the NEW batch.
    Store hits are cut from EVERY new occurrence (first-seen-wins
    across batches — the shipped copy is canonical); runs new to the
    store dedup within the batch by the corpus-wide-smallest rule.
    Returns the cleaned new batch (doc_id, text)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    exported = docs.filter(F.col("doc_id") % 2 == 0)
    new_batch = docs.filter(F.col("doc_id") % 2 == 1)
    store = winnow_fingerprints(
        exported, k=_K, window=_W, hash_fn=_portable_hash
    )
    cleaned, _ = remove_substrings_against_store(
        new_batch, store, k=_K, window=_W, hash_fn=_portable_hash
    )
    return cleaned.select("doc_id", "text")


#: scheme tag for the portable polynomial these oracle-facing queries
#: hash with (`llm/porthash.py`: B=131, M=1e9+7) — distinct from the
#: production Arrow path's DEFAULT_HASH_SCHEME so a store built by one
#: can never silently join the other's fingerprints
_PORTHASH_SCHEME = "porthash-b131-m1e9+7"


def fingerprint_store_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-maintenance certificate (r10 VERDICT item 3): build the
    even-docs fingerprint store ON DISK via the real lifecycle ops —
    `write_fingerprint_store` called TWICE with the same batch (a
    re-run appends duplicate rows by design), then
    `compact_fingerprint_store` — and return the store's
    post-compaction (fp, probe) rows read back through
    `read_fingerprint_store`. The oracle recomputes the DISTINCT
    winnowed (fp, probe) set in DuckDB, so the driver hash proves both
    directions: a compaction that keeps any duplicate doubles the row
    count, one that drops a fingerprint breaks the value hash.

    Each run builds its store under a fresh ``tempfile.mkdtemp``; the
    returned DataFrame lazily reads from it, so it cannot be deleted
    here — cleanup is left to /tmp hygiene, the same documented
    contract as the on-disk txn certification queries
    (`io/txn_queries.py`)."""
    import tempfile

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    exported = docs.filter(F.col("doc_id") % 2 == 0)
    # r14 (guide §1.2 / the module's multi-consumer discipline): the
    # winnowing scan — the Arrow selection UDF over the whole exported
    # half, the operator's entire cost — feeds BOTH store appends;
    # without materialization each append re-ran it from the parquet
    # scan up (measured sf0.1: ~11-12 s per append). Checkpoint the
    # winnowed-density rows once; the two appends then write the SAME
    # computed rows, which is exactly what the certificate tests (the
    # duplicate-append semantics live in the store, not in recompute).
    fps = winnow_fingerprints(
        exported, k=_K, window=_W, hash_fn=_portable_hash
    ).localCheckpoint(eager=True)
    store = tempfile.mkdtemp(prefix="fp_store_compact_")
    write_fingerprint_store(fps, store, _K, _W, hash_scheme=_PORTHASH_SCHEME)
    write_fingerprint_store(fps, store, _K, _W, hash_scheme=_PORTHASH_SCHEME)
    res = compact_fingerprint_store(spark, store)
    if res["rows_after"] > res["rows_before"]:
        # loud invariant, not an oracle job: compaction can only shrink
        raise RuntimeError(f"compaction grew the store: {res}")
    compacted, _meta = read_fingerprint_store(spark, store)
    return compacted.select("fp", "probe")


def _gram_hash_sql() -> str:
    return port_hash_sql(f"substr(d.text, CAST(t.i AS INT), {_K})", _K)


#: grams -> per-window struct MIN (rightmost tie via negated pos) —
#: shared head of both oracles. ``WHERE pos >= W-1`` keeps only full
#: windows (the window frame is ROWS W-1 PRECEDING .. CURRENT ROW, so
#: earlier rows see truncated frames).
def _selection_cte() -> str:
    return f"""
grams AS (
  SELECT d.doc_id, CAST(t.i - 1 AS INT) AS pos, {_gram_hash_sql()} AS h
  FROM documents d,
  LATERAL unnest(generate_series(1, greatest(length(d.text) - {_K - 1}, 0)))
    t(i)
), win AS (
  SELECT doc_id, pos,
         MIN({{'h': h, 'np': -pos}}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {_W - 1} PRECEDING AND CURRENT ROW) AS m
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, CAST(-(m.np) AS INT) AS pos, m.h AS fp
  FROM win
  WHERE pos >= {_W - 1}
)"""


#: losers -> merged ranges -> per-doc splice — the shared tail of both
#: removal oracles (factored like ``_selection_cte``, review-caught
#: duplication: a one-sided edit would silently desynchronize them).
#: Expects a ``losers(doc_id, pos)`` CTE in scope; emits ``rebuilt``.
def _rebuild_cte() -> str:
    return f"""marked AS (
  -- a mark starts a new range when it clears every previous mark's
  -- end (cumulative max of pos+K over earlier rows); two CTE steps
  -- because window calls cannot nest
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + {_K}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1)
              THEN 1 ELSE 0 END AS brk
  FROM losers
), marks AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
), ranges AS (
  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {_K} AS e
  FROM marks GROUP BY doc_id, island
), cuts AS (
  SELECT doc_id, s, e,
         LAG(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS pe
  FROM ranges
), rebuilt AS (
  SELECT c.doc_id,
         COALESCE(STRING_AGG(substr(d.text, c.pe + 1, c.s - c.pe), ''
                             ORDER BY c.s), '')
           || substr(d.text, MAX(c.e) + 1) AS text
  FROM cuts c JOIN documents d USING (doc_id)
  GROUP BY c.doc_id, d.text
)"""


WINNOW_FPS_SQL = f"""
WITH {_selection_cte().lstrip()}
SELECT f.doc_id, f.pos, f.fp,
       substr(d.text, f.pos + 1, 8) AS probe
FROM fps f JOIN documents d USING (doc_id)
"""


SUBSTRING_REBUILD_SQL = f"""
WITH {_selection_cte().lstrip()},
probed AS (
  SELECT f.doc_id, f.pos, f.fp, substr(d.text, f.pos + 1, 8) AS probe
  FROM fps f JOIN documents d USING (doc_id)
), grp AS (
  SELECT fp, probe,
         COUNT(DISTINCT doc_id) AS n_docs,
         MIN({{'d': doc_id, 'p': pos}}) AS w
  FROM probed GROUP BY fp, probe
), losers AS (
  SELECT p.doc_id, p.pos
  FROM probed p JOIN grp g ON p.fp = g.fp AND p.probe = g.probe
  WHERE g.n_docs >= 2 AND (p.doc_id != g.w.d OR p.pos != g.w.p)
), {_rebuild_cte()}
SELECT d.doc_id, COALESCE(r.text, d.text) AS text
FROM documents d LEFT JOIN rebuilt r USING (doc_id)
"""


#: incremental twin of SUBSTRING_REBUILD_SQL: the selection runs once
#: over all documents (winnowing is per-doc, so selecting on the full
#: table equals selecting per batch), the even half's (fp, probe) set
#: is the store, and a NEW-batch selection loses when it hits the
#: store (every occurrence) or is an intra-batch non-winner duplicate.
SUBSTRING_INCREMENTAL_SQL = f"""
WITH {_selection_cte().lstrip()},
probed AS (
  SELECT f.doc_id, f.pos, f.fp, substr(d.text, f.pos + 1, 8) AS probe
  FROM fps f JOIN documents d USING (doc_id)
), store AS (
  SELECT DISTINCT fp, probe FROM probed WHERE doc_id % 2 = 0
), new_p AS (
  SELECT * FROM probed WHERE doc_id % 2 = 1
), grp AS (
  SELECT fp, probe,
         COUNT(DISTINCT doc_id) AS n_docs,
         MIN({{'d': doc_id, 'p': pos}}) AS w
  FROM new_p GROUP BY fp, probe
), losers AS (
  SELECT p.doc_id, p.pos
  FROM new_p p
  JOIN grp g ON p.fp = g.fp AND p.probe = g.probe
  LEFT JOIN store s ON p.fp = s.fp AND p.probe = s.probe
  WHERE s.fp IS NOT NULL
     OR (g.n_docs >= 2 AND (p.doc_id != g.w.d OR p.pos != g.w.p))
), {_rebuild_cte()}
SELECT d.doc_id, COALESCE(r.text, d.text) AS text
FROM documents d LEFT JOIN rebuilt r USING (doc_id)
WHERE d.doc_id % 2 = 1
"""


#: the distinct winnowed (fp, probe) set of the even (exported) docs —
#: exactly what a correct double-append + compact must leave on disk
FP_STORE_COMPACT_SQL = f"""
WITH {_selection_cte().lstrip()}
SELECT DISTINCT f.fp, substr(d.text, f.pos + 1, 8) AS probe
FROM fps f JOIN documents d USING (doc_id)
WHERE d.doc_id % 2 = 0
"""


QUERIES = {
    "winnow_fingerprints_select": winnow_fingerprints_select,
    "substring_dedup_rebuild": substring_dedup_rebuild,
    "substring_dedup_incremental": substring_dedup_incremental,
    "fingerprint_store_compact": fingerprint_store_compact,
}

ORACLES = {
    "winnow_fingerprints_select": WINNOW_FPS_SQL,
    "substring_dedup_rebuild": SUBSTRING_REBUILD_SQL,
    "substring_dedup_incremental": SUBSTRING_INCREMENTAL_SQL,
    "fingerprint_store_compact": FP_STORE_COMPACT_SQL,
}
