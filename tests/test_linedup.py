"""Line/paragraph dedup (llm/linedup.py) vs an independent pure-Python
reference on a crafted corpus, plus plan-shape and real-corpus checks."""

from __future__ import annotations

import re

import pytest

from ir_analyses_spark.llm.linedup import (
    dedup_units_within_doc,
    global_frequent_units,
    remove_global_duplicate_units,
)

FOOTER = "copyright 2023 example corp all rights reserved"
NAV = "home | products | about us"
CORPUS = [
    (0, f"unique opening line\n{NAV}\nsome real content here\n{FOOTER}"),
    (1, f"{NAV}\nanother page entirely\nmore body text\n{FOOTER}"),
    (2, f"{FOOTER}\nthird page content\nthird page extra line"),
    (3, "repeated inside\nrepeated inside\nrepeated inside\nonly here once"),
    (4, ""),
    (5, f"  {NAV}  \n\n{FOOTER}"),  # whitespace-padded units still match
    (6, "para one\n\npara shared\n\npara one"),
    (7, "para shared\n\npara solo"),
]


def _py_units(text: str, unit: str) -> list[str]:
    pat = r"\n" if unit == "line" else r"\n{2,}"
    return [u.strip() for u in re.split(pat, text) if u.strip()]


def _py_within(text: str, unit: str) -> str:
    seen, out = set(), []
    for u in _py_units(text, unit):
        if u not in seen:
            seen.add(u)
            out.append(u)
    return ("\n" if unit == "line" else "\n\n").join(out)


def _py_global(corpus, unit, min_doc_count):
    from collections import Counter

    docs_per_unit = Counter()
    for _, text in corpus:
        for u in set(_py_units(text, unit)):
            docs_per_unit[u] += 1
    frequent = {u for u, n in docs_per_unit.items() if n >= min_doc_count}
    out = {}
    for doc_id, text in corpus:
        kept = [u for u in _py_units(text, unit) if u not in frequent]
        out[doc_id] = ("\n" if unit == "line" else "\n\n").join(kept)
    return frequent, docs_per_unit, out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.mark.parametrize("unit", ["line", "paragraph"])
def test_within_doc_matches_reference(corpus_df, unit):
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_units_within_doc(corpus_df, unit).collect()
    }
    for doc_id, text in CORPUS:
        assert got[doc_id] == _py_within(text, unit), (doc_id, unit)


def test_within_doc_actually_removes(corpus_df):
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_units_within_doc(corpus_df, "line").collect()
    }
    assert got[3] == "repeated inside\nonly here once"


@pytest.mark.parametrize("unit,min_n", [("line", 2), ("line", 3), ("paragraph", 2)])
def test_global_frequency_table_matches_reference(corpus_df, unit, min_n):
    frequent, counts, _ = _py_global(CORPUS, unit, min_n)
    got = {
        r["unit_text"]: r["n_docs"]
        for r in global_frequent_units(corpus_df, unit, min_n).collect()
    }
    assert set(got) == frequent
    for u, n in got.items():
        assert n == counts[u], u


@pytest.mark.parametrize("unit,min_n", [("line", 2), ("line", 3), ("paragraph", 2)])
def test_global_removal_matches_reference(corpus_df, unit, min_n):
    _, _, want = _py_global(CORPUS, unit, min_n)
    for bcast in (None, True, False):  # adaptive / forced / pinned-shuffle
        got = {
            r["doc_id"]: r["text"]
            for r in remove_global_duplicate_units(
                corpus_df, unit, min_n, broadcast_frequent=bcast
            ).collect()
        }
        assert got == want, (unit, min_n, bcast)


def test_global_removal_semantics(corpus_df):
    got = {
        r["doc_id"]: r["text"]
        for r in remove_global_duplicate_units(corpus_df, "line", 2).collect()
    }
    # boilerplate gone everywhere, body text intact
    assert FOOTER not in got[0] and NAV not in got[0]
    assert "some real content here" in got[0]
    # doc whose every unit was boilerplate survives as empty text
    assert got[5] == ""
    # within-doc repetition is NOT global (1 distinct doc) and stays
    assert got[3].count("repeated inside") == 3
    assert set(got) == {d for d, _ in CORPUS}


def test_global_join_broadcasts_hash_only(corpus_df):
    """Plan pins the scale posture: forcing broadcast_frequent=True
    puts a broadcast anti-join on the 64-bit hash (never the unit
    text) into the plan."""
    plan = remove_global_duplicate_units(
        corpus_df, "line", 2, broadcast_frequent=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "xxhash64" in plan


def _run_and_final_plan(df):
    rows = df.collect()  # execute THIS query execution (AQE final plan)
    return rows, df._jdf.queryExecution().executedPlan().toString()


def test_global_join_strategy_is_adaptive(spark, corpus_df):
    """r7 VERDICT item 4: the default strategy must be picked from the
    frequent set's REAL size — broadcast below the AQE threshold,
    shuffle above it, identical output either way; explicit False pins
    the shuffled path even when AQE would broadcast."""
    _, _, want = _py_global(CORPUS, "line", 2)
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        # below threshold (defaults): the tiny frequent set broadcasts
        rows, plan = _run_and_final_plan(
            remove_global_duplicate_units(corpus_df, "line", 2)
        )
        assert {r["doc_id"]: r["text"] for r in rows} == want
        assert any(
            "BroadcastHashJoin" in l and "LeftAnti" in l
            for l in plan.splitlines()
        )
        # above threshold (simulated by disabling broadcast): the SAME
        # default call stays a shuffled anti-join — no driver OOM path
        for k in keys:
            spark.conf.set(k, "-1")
        rows, plan = _run_and_final_plan(
            remove_global_duplicate_units(corpus_df, "line", 2)
        )
        assert {r["doc_id"]: r["text"] for r in rows} == want
        lines = plan.splitlines()
        assert not any("BroadcastHashJoin" in l and "LeftAnti" in l for l in lines)
        assert any("LeftAnti" in l for l in lines)
    finally:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    # pinned shuffle: False refuses broadcast even under permissive
    # confs (the reassembly LEFT join may still broadcast — only the
    # ANTI join's strategy is pinned)
    rows, plan = _run_and_final_plan(
        remove_global_duplicate_units(corpus_df, "line", 2, broadcast_frequent=False)
    )
    assert {r["doc_id"]: r["text"] for r in rows} == want
    lines = plan.splitlines()
    assert not any("BroadcastHashJoin" in l and "LeftAnti" in l for l in lines)
    assert any("ShuffledHashJoin" in l and "LeftAnti" in l for l in lines)


def test_invalid_args(corpus_df):
    with pytest.raises(ValueError, match="unit must be"):
        dedup_units_within_doc(corpus_df, "clause")
    with pytest.raises(ValueError, match="min_doc_count"):
        global_frequent_units(corpus_df, "line", 0)
    with pytest.raises(ValueError, match="min_doc_count"):
        remove_global_duplicate_units(corpus_df, "line", 0)


def test_real_corpus_invariants(spark, sf_dir):
    """On the single-line synthetic documents table: within-doc dedup is
    an identity on text modulo trimming, and global removal at
    min_doc_count=2 keeps every doc row present."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    assert dedup_units_within_doc(docs, "line").count() == n
    out = remove_global_duplicate_units(docs, "line", 2)
    assert out.count() == n


SENT_A = "First unique thought. The shared run begins here. It continues right along. And it ends here. A final unique close."
SENT_B = "Different opener for b! The shared run begins here. It continues right along. And it ends here. Something else entirely?"
SENT_C = "No overlap with anything. Just two sentences."
SPAN_CORPUS = [(0, SENT_A), (1, SENT_B), (2, SENT_C), (3, ""), (4, "One. One. One. One. One.")]


def _py_remove_spans(corpus, span, unit="sentence"):
    from collections import defaultdict

    pat = {"line": r"\n", "paragraph": r"\n{2,}", "sentence": r"(?<=[.!?])\s+"}[unit]
    joiner = {"line": "\n", "paragraph": "\n\n", "sentence": " "}[unit]
    units = {
        d: [u.strip() for u in re.split(pat, t) if u.strip()] for d, t in corpus
    }
    occ = defaultdict(list)
    for d in sorted(units):
        us = units[d]
        for p in range(len(us) - span + 1):
            occ["\x1f".join(us[p : p + span])].append((d, p))
    removed = defaultdict(set)
    for lst in occ.values():
        if len(lst) >= 2:
            w = min(lst)
            for d, p in lst:
                if (d, p) != w:
                    removed[d].update(range(p, p + span))
    return {
        d: joiner.join(u for i, u in enumerate(us) if i not in removed[d])
        for d, us in units.items()
    }


@pytest.fixture(scope="module")
def span_df(spark):
    return spark.createDataFrame(SPAN_CORPUS, "doc_id long, text string")


@pytest.mark.parametrize("span", [1, 2, 3])
def test_span_dedup_matches_reference(span_df, span):
    from ir_analyses_spark.llm.linedup import remove_duplicate_spans

    want = _py_remove_spans(SPAN_CORPUS, span)
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(span_df, span).collect()
    }
    assert got == want, span


def test_span_dedup_semantics(span_df):
    from ir_analyses_spark.llm.linedup import remove_duplicate_spans

    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(span_df, 3).collect()
    }
    # doc 0 (smaller doc_id) keeps the shared 3-sentence run; doc 1 loses it
    assert "The shared run begins here." in got[0]
    assert "The shared run begins here." not in got[1]
    assert got[1].startswith("Different opener for b!")
    assert got[1].endswith("Something else entirely?")
    # untouched doc unchanged; empty doc survives empty
    assert got[2] == SENT_C
    assert got[3] == ""
    assert set(got) == {0, 1, 2, 3, 4}


def test_sentence_unit_within_doc(spark):
    from ir_analyses_spark.llm.linedup import dedup_units_within_doc

    df = spark.createDataFrame(
        [(0, "Buy now! Buy now! A real sentence. Buy now!")],
        "doc_id long, text string",
    )
    got = dedup_units_within_doc(df, "sentence").collect()[0]["text"]
    assert got == "Buy now! A real sentence."


def test_tab_padded_units_still_dedup(spark):
    """F.trim strips only spaces; units padded with tabs must still
    hash equal (full-whitespace trim, matching the references' strip)."""
    df = spark.createDataFrame(
        [(0, "footer text\t\nbody a"), (1, "\tfooter text \nbody b")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_global_duplicate_units(df, "line", 2).collect()
    }
    assert got == {0: "body a", 1: "body b"}
