"""Property-style randomized tests for the crawl-curation surface
(SURVEY §5 extension, same shape as test_parser_properties.py):
hundreds of seeded-random cases evaluated in ONE Spark job per suite,
compared against independent Python models re-derived from the
documented semantics — never from the Column implementations."""

from __future__ import annotations

import gzip
import random
import re

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.io.warc import iter_warc_records
from ir_analyses_spark.llm.linedup import (
    remove_duplicate_spans,
    remove_global_duplicate_units,
)
from ir_analyses_spark.llm.quality_rules import quality_signals_df
from ir_analyses_spark.llm.robots import parse_robots_expr
from ir_analyses_spark.llm.textnorm import clean_text_df, py_clean_text
from ir_analyses_spark.llm.url_ops import normalize_url_expr
from tests.test_linedup import _py_global, _py_remove_spans
from tests.test_robots import _py_star_rules
from tests.test_url_ops import _py_normalize

# ---------------------------------------------------------------------------
# WARC record round-trip (pure Python walker — no Spark needed)
# ---------------------------------------------------------------------------


def _serialize(records: list[tuple[dict, bytes]]) -> bytes:
    out = []
    for headers, payload in records:
        lines = ["WARC/1.0"]
        for k, v in headers.items():
            lines.append(f"{k}: {v}")
        lines.append(f"Content-Length: {len(payload)}")
        out.append(
            "\r\n".join(lines).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )
    return b"".join(out)


def test_warc_roundtrip_random_payloads():
    """Payloads containing CRLFCRLF, 'WARC/' markers, or raw bytes must
    carve EXACTLY by Content-Length — the walker may never resync off
    payload content."""
    rng = random.Random(20260815)
    evil_chunks = [b"\r\n\r\n", b"WARC/1.0\r\n", b"\r\n", b"\x00\xff", b""]
    for trial in range(200):
        records = []
        for i in range(rng.randint(1, 6)):
            payload = b"".join(
                rng.choice(evil_chunks)
                + bytes(rng.randrange(256) for _ in range(rng.randint(0, 12)))
                for _ in range(rng.randint(0, 5))
            )
            headers = {
                "WARC-Type": rng.choice(["response", "request", "conversion"]),
                "WARC-Record-ID": f"<urn:uuid:{trial}-{i}>",
            }
            if rng.random() < 0.7:
                headers["WARC-Target-URI"] = f"http://h{i}.example/p{trial}"
            records.append((headers, payload))
        parsed = list(iter_warc_records(_serialize(records)))
        assert len(parsed) == len(records), trial
        for (want_h, want_p), (got_h, got_p) in zip(records, parsed):
            assert got_p == want_p, trial
            for k, v in want_h.items():
                assert got_h[k.lower()] == v, (trial, k)


def test_warc_roundtrip_gzip_members():
    """Drive the READER's own member decompression (_file_records), not
    test-side gzip.decompress — a regression that stops after the first
    member must fail here."""
    from ir_analyses_spark.io.warc import _file_records

    rng = random.Random(7)
    records = [
        ({"WARC-Type": "response"}, bytes(rng.randrange(256) for _ in range(50)))
        for _ in range(5)
    ]
    blob = b"".join(
        gzip.compress(_serialize([r])) for r in records
    )
    rows = list(_file_records("t.warc.gz", blob, False, False))
    assert [r["payload"] for r in rows] == [p for _, p in records]
    assert [r["record_seq"] for r in rows] == list(range(5))


# ---------------------------------------------------------------------------
# quality signals: full independent model over random texts, one job
# ---------------------------------------------------------------------------

_VOCAB = [
    "a", "bb", "the", "of", "and", "that", "have", "with", "Z9", "é",
    "#", "...", "…", "-", "*", "•", "!", "word", "x" * 12,
]
_SEP = [" ", " ", " ", "\t", "\n", "\n\n", "\n \n", "  "]


def _rand_text(rng: random.Random) -> str:
    n = rng.randint(0, 40)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(_VOCAB))
        parts.append(rng.choice(_SEP))
    return "".join(parts)


def _model_signals(text: str) -> dict:
    words = [w for w in re.split(r"\s+", text) if w != ""]
    lines = [l for l in text.split("\n") if re.search(r"\S", l)]
    paras = [p for p in re.split(r"\n{2,}", text) if re.search(r"\S", p)]
    nonspace = len(re.sub(r"\s", "", text))
    symbols = len(re.findall(r"#|\.\.\.|…", text))
    nw, nl, np_ = len(words), len(lines), len(paras)

    def frac(num, den):
        return num / den if den > 0 else None

    def first_distinct(xs):
        seen, out = set(), []
        for x in xs:
            if x not in seen:
                seen.add(x)
                out.append(x)
        return out

    dl, dp = first_distinct(lines), first_distinct(paras)
    lc, dlc = sum(map(len, lines)), sum(map(len, dl))
    pc, dpc = sum(map(len, paras)), sum(map(len, dp))
    from ir_analyses_spark.llm.quality_rules import GOPHER_STOPWORDS

    return {
        "n_words": nw,
        "mean_word_len": frac(nonspace, nw),
        "symbol_word_ratio": frac(symbols, nw),
        "alpha_word_frac": frac(
            sum(1 for w in words if re.search("[A-Za-z]", w)), nw
        ),
        "stopwords_present": sum(int(s in words) for s in GOPHER_STOPWORDS),
        "n_lines": nl,
        "bullet_line_frac": frac(
            sum(1 for l in lines if re.search(r"^\s*[-*•]", l)), nl
        ),
        "ellipsis_line_frac": frac(
            sum(1 for l in lines if re.search(r"(…|\.\.\.)\s*$", l)), nl
        ),
        "dup_line_frac": frac(nl - len(dl), nl),
        "dup_line_char_frac": frac(lc - dlc, lc),
        "n_paras": np_,
        "dup_para_frac": frac(np_ - len(dp), np_),
        "dup_para_char_frac": frac(pc - dpc, pc),
    }


def test_quality_signals_random_corpus_matches_model(spark):
    rng = random.Random(1234)
    corpus = [(i, _rand_text(rng)) for i in range(150)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in quality_signals_df(df).collect()}
    for doc_id, text in corpus:
        want = _model_signals(text)
        g = got[doc_id]
        for k, v in want.items():
            assert g[k] == v, (doc_id, k, g[k], v, repr(text))


# ---------------------------------------------------------------------------
# line/span dedup: random corpora vs the independent references
# ---------------------------------------------------------------------------


def _rand_unit_corpus(rng: random.Random, n_docs: int):
    pool = [f"line {i}" for i in range(12)]  # small pool → real collisions
    corpus = []
    for d in range(n_docs):
        units = [rng.choice(pool) for _ in range(rng.randint(0, 8))]
        sep = rng.choice(["\n", "\n\n"])
        corpus.append((d, sep.join(units)))
    return corpus


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_global_line_dedup_random_matches_reference(spark, seed):
    rng = random.Random(seed)
    corpus = _rand_unit_corpus(rng, 40)
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    _, _, want = _py_global(corpus, "line", 2)
    got = {
        r["doc_id"]: r["text"]
        for r in remove_global_duplicate_units(df, "line", 2).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed,span", [(11, 2), (12, 3)])
def test_span_dedup_random_matches_reference(spark, seed, span):
    rng = random.Random(seed)
    pool = ["One.", "Two!", "Three?", "Four.", "Five."]
    corpus = [
        (d, " ".join(rng.choice(pool) for _ in range(rng.randint(0, 9))))
        for d in range(30)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    want = _py_remove_spans(corpus, span)
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(df, span).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# textnorm: random strings vs the Python reference + idempotence
# ---------------------------------------------------------------------------


def test_clean_text_random_matches_reference_and_is_idempotent(spark):
    rng = random.Random(99)
    chars = (
        "ab c\t\n\u3000\u200b\ufeff\u00ad\u2028\u2029\x01\x07\x7f"
        "\u00e9#\u2026!"
    )
    corpus = [
        (i, "".join(rng.choice(chars) for _ in range(rng.randint(0, 60))))
        for i in range(250)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in clean_text_df(df).collect()}
    for doc_id, text in corpus:
        want = py_clean_text(text)
        assert got[doc_id] == want, (doc_id, repr(text))
        assert py_clean_text(want) == want, doc_id  # fixpoint


# ---------------------------------------------------------------------------
# URL normalization: random structured URLs vs the urllib reference
# ---------------------------------------------------------------------------


def _rand_url(rng: random.Random) -> str:
    scheme = rng.choice(["http", "https", "HTTP"])
    host = ".".join(
        rng.choice(["WWW", "sub", "Example", "shop", "co", "uk", "org"])
        for _ in range(rng.randint(1, 4))
    )
    port = rng.choice(["", ":80", ":8080"])
    path = "".join(
        f"/{rng.choice(['a', 'B', 'p1', ''])}" for _ in range(rng.randint(0, 4))
    )
    if rng.random() < 0.3:
        path += "/" * rng.randint(1, 3)
    params = [
        rng.choice(["a=1", "b=2", "utm_source=x", "gclid=7", "flag", "z="])
        for _ in range(rng.randint(0, 4))
    ]
    query = "?" + "&".join(params) if params else ""
    frag = rng.choice(["", "#frag"])
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def test_normalize_url_random_matches_reference(spark):
    rng = random.Random(4321)
    urls = [(i, _rand_url(rng)) for i in range(300)]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r["doc_id"]: r["norm"]
        for r in df.select(
            "doc_id", normalize_url_expr(F.col("url")).alias("norm")
        ).collect()
    }
    for doc_id, url in urls:
        assert got[doc_id] == _py_normalize(url), (doc_id, url)


# ---------------------------------------------------------------------------
# robots parser: random rule files vs the independent parser
# ---------------------------------------------------------------------------


def _rand_robots(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(0, 14)):
        kind = rng.random()
        if kind < 0.3:
            agent = rng.choice(["*", "googlebot", "evilbot", "*"])
            lines.append(f"User-agent: {agent}")
        elif kind < 0.6:
            val = rng.choice(["/private/", "/tmp", "", "/", "/a:b"])
            lines.append(f"Disallow: {val}")
        elif kind < 0.7:
            lines.append(f"Allow: /{rng.randint(0, 9)}")
        elif kind < 0.8:
            lines.append(f"# comment {rng.randint(0, 9)}")
        elif kind < 0.9:
            lines.append("")
        else:
            lines.append("Crawl-delay: 10")
    eol = rng.choice(["\n", "\r\n"])
    return eol.join(lines)


def test_robots_random_matches_reference(spark):
    rng = random.Random(777)
    files = [(i, _rand_robots(rng)) for i in range(200)]
    df = spark.createDataFrame(files, "doc_id long, text string")
    got = {
        r["doc_id"]: r["rules"]
        for r in df.select(
            "doc_id", parse_robots_expr("text").alias("rules")
        ).collect()
    }
    for doc_id, text in files:
        assert got[doc_id] == _py_star_rules(text), (doc_id, repr(text))
