"""llm/substring_queries.py + llm/clf_gate.py: randomized cross-engine
battery — the registry oracles re-run against a DuckDB table of random
corpora (NULLs, empties, unicode incl. astral plane, vertical tabs,
heavy cross-doc duplication) and must match the Spark implementations
exactly on every draw. The driver certifies one fixed corpus; this
battery certifies the CLASS of corpora."""

from __future__ import annotations

import random

import duckdb
import pytest

from ir_analyses_spark.llm.clf_gate import GATE_SQL, score_gate_df
from ir_analyses_spark.llm.substring_queries import (
    _K,
    _W,
    _portable_hash,
    SUBSTRING_REBUILD_SQL,
    WINNOW_FPS_SQL,
)
from ir_analyses_spark.llm.substring_dedup import (
    remove_duplicated_substrings,
    winnow_fingerprints,
)

_FRAGS = [
    "THE-COMMON-BOILERPLATE-RUN-REPEATED-ACROSS-DOCS",
    "another shared disclaimer fragment of real length",
    "tiny",
    "tab\x0bseparated vertical fragment with enough chars",
    "café déjà vu naïve unicode ÆØÅ shared run here",
    "astral \U0001F600\U0001F680 emoji run with padding chars",
]


def _random_corpus(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        roll = rng.random()
        if roll < 0.06:
            text = None
        elif roll < 0.12:
            text = ""
        elif roll < 0.18:
            text = "x" * rng.randint(1, _K - 1)  # below k
        else:
            junk = "".join(
                rng.choice("abcdefghij \x0b") for _ in range(rng.randint(0, 60))
            )
            frag = rng.choice(_FRAGS) if rng.random() < 0.7 else ""
            tail = "".join(
                rng.choice("klmnopqrs ") for _ in range(rng.randint(0, 40))
            )
            text = junk + frag + tail
        rows.append((i, text))
    return rows


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_winnow_and_rebuild_match_oracle_on_random_corpora(spark, seed):
    rng = random.Random(seed)
    rows = _random_corpus(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = _duck(rows)
    # fingerprints
    got = {
        (r["doc_id"], r["pos"], r["fp"], r["probe"])
        for r in winnow_fingerprints(
            docs, _K, _W, hash_fn=_portable_hash
        ).collect()
    }
    want = set(map(tuple, con.execute(WINNOW_FPS_SQL).fetchall()))
    assert got == want, f"seed {seed}: fingerprint mismatch"
    # removal end state
    got_t = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_substrings(
            docs, _K, _W, hash_fn=_portable_hash
        ).collect()
    }
    want_t = dict(con.execute(SUBSTRING_REBUILD_SQL).fetchall())
    assert got_t == want_t, f"seed {seed}: rebuild mismatch"
    # NULL/short docs pass through untouched
    for i, t in rows:
        if t is None or (t is not None and len(t) < _K):
            assert got_t[i] == t


@pytest.mark.parametrize("seed", [44, 55])
def test_gate_matches_oracle_on_random_corpora(spark, seed):
    rng = random.Random(seed)
    vocab = ["table", "query", "click", "free", "café", "\U0001F600", "a"]
    rows = []
    for i in range(80):
        roll = rng.random()
        if roll < 0.08:
            text = None
        elif roll < 0.15:
            text = " \t\x0b "  # whitespace-only
        else:
            text = "\x0b".join(
                " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
                for _ in range(rng.randint(1, 3))
            )
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = _duck(rows)
    got = {
        r["doc_id"]: (r["score_millionths"], r["kept"])
        for r in score_gate_df(docs).collect()
    }
    want = {d: (s, k) for d, s, k in con.execute(GATE_SQL).fetchall()}
    assert got == want, f"seed {seed}"


@pytest.mark.parametrize("seed", [7, 8])
def test_porthash_numpy_twin_is_bit_exact(seed):
    """The r14 worker-side twin (`port_hash_kgrams_np`) must equal the
    per-gram Python reference on arbitrary unicode — it replaces the
    JVM expression inside the winnow's Arrow worker, so a single
    diverging gram silently un-joins fingerprints across engines."""
    from ir_analyses_spark.llm.porthash import (
        port_hash_kgrams_np,
        port_hash_py,
    )

    rng = random.Random(seed)
    pool = [chr(c) for c in list(range(32, 127))] + [
        "あ", "中", "\U0001F600", "\U0010FFFF", "\t", "\n", "\x0b"
    ]
    for _ in range(150):
        k = rng.randint(2, 16)
        n = rng.randint(0, 120)
        s = "".join(rng.choice(pool) for _ in range(n))
        got = port_hash_kgrams_np(s, k).tolist()
        want = [
            port_hash_py(s[i : i + k], k) for i in range(max(0, n - k + 1))
        ]
        assert got == want, (seed, k, s)


def test_winnow_twin_equals_jvm_expression_path(spark):
    """winnow_fingerprints over the SAME corpus must emit identical
    rows whether the portable hash runs as the JVM expression or as
    the attached numpy twin (the r14 scale route)."""
    from ir_analyses_spark.llm.porthash import port_hash_expr
    from ir_analyses_spark.llm.substring_dedup import winnow_fingerprints

    rng = random.Random(99)
    rows = _random_corpus(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def jvm_only(gram):  # no .np_kgrams attribute -> JVM expression path
        return port_hash_expr(gram, _K)

    a = sorted(
        map(tuple, winnow_fingerprints(docs, _K, _W, hash_fn=jvm_only).collect())
    )
    b = sorted(
        map(
            tuple,
            winnow_fingerprints(docs, _K, _W, hash_fn=_portable_hash).collect(),
        )
    )
    assert _portable_hash.np_kgrams is not None  # the twin is attached
    assert a == b and len(a) > 0
