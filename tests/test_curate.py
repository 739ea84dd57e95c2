"""End-to-end crawl curation (llm/curate.py) on a synthesized
multi-domain crawl exercising every funnel stage."""

from __future__ import annotations

import gzip

import pytest

from ir_analyses_spark.llm.curate import curation_stages, funnel_counts

NAV = "home | products | about"
FOOTER = "copyright example corp"


def _page(body_paras: list[str], title: str = "t") -> bytes:
    body = "".join(f"<p>{p}</p>" for p in body_paras)
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<p>{NAV}</p>{body}<p>{FOOTER}</p></body></html>"
    ).encode()


GOOD_A = _page(
    ["the quick brown fox jumps over the lazy dog and runs to the river bank today"],
    "Page A",
)
GOOD_B = _page(
    ["an entirely different body of text that still has enough real words in the line"],
    "Page B",
)
GOOD_C = _page(
    ["a third page with its own long and unique sentence about the weather and the sea"],
    "Page C",
)
SHORT = _page(["tiny"], "Too Short")
LINKFARM = (
    b"<html><body>"
    + b"".join(
        f'<a href="/{i}">link text number {i} goes here</a>'.encode()
        for i in range(12)
    )
    + b"</body></html>"
)


def _record(uri: str, body: bytes, ctype: str = "text/html; charset=utf-8",
            status: str = "200 OK", rtype: str = "response", seq: int = 0) -> bytes:
    payload = (
        f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n\r\n"
    ).encode() + body
    if rtype != "response":
        payload = body
    lines = [
        b"WARC/1.0",
        f"WARC-Type: {rtype}".encode(),
        f"WARC-Record-ID: <urn:uuid:c-{seq}>".encode(),
        b"WARC-Date: 2024-01-02T03:04:05Z",
        f"WARC-Target-URI: {uri}".encode(),
    ]
    if rtype == "response":
        lines.append(b"Content-Type: application/http; msgtype=response")
    lines.append(f"Content-Length: {len(payload)}".encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


CRAWL = [
    _record("http://goodsite.com/a", GOOD_A, seq=0),
    _record("http://goodsite.com/b", GOOD_B, seq=1),
    # URL-duplicate of /a (tracking param → same canonical URL)
    _record("http://goodsite.com/a?utm_source=feed", GOOD_A, seq=2),
    _record("http://other.org/c", GOOD_C, seq=3),
    # exact-content duplicate of A on a different site
    _record("http://dupe.net/copy", GOOD_A, seq=4),
    _record("http://spam.example/z", GOOD_B, seq=5),  # blocked domain
    _record("http://linkfarm.com/l", LINKFARM, seq=6),  # link density
    _record("http://goodsite.com/short", SHORT, seq=7),  # fails quality
    _record("http://goodsite.com/gone", b"nope", status="404 Not Found", seq=8),
    _record("http://goodsite.com/api", b'{"j":1}', ctype="application/json", seq=9),
    _record("http://goodsite.com/a", b"GET /a HTTP/1.1\r\n\r\n", rtype="request", seq=10),
]


@pytest.fixture(scope="module")
def crawl_stages(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("crawl")
    (d / "crawl.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in CRAWL))
    return curation_stages(
        spark,
        str(d),
        blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
    )


def test_funnel_attrition(crawl_stages):
    n = funnel_counts(crawl_stages)
    assert n["records"] == 11
    assert n["pages"] == 8          # drops 404, json, request
    assert n["unblocked"] == 7      # drops spam.example
    assert n["url_deduped"] == 6    # folds the utm duplicate of /a
    assert n["capped"] == 6
    assert n["extracted"] == 6
    assert n["content_like"] == 5   # drops the link farm
    assert n["normalized"] == 5     # 1:1 cleanup, no attrition
    assert n["exact_deduped"] == 4  # folds dupe.net's copy of A
    assert n["line_deduped"] == 4
    assert n["final"] == 3          # quality gate drops the short page


def test_final_corpus_content(crawl_stages):
    rows = crawl_stages["final"].collect()
    by_title = {r["title"]: r for r in rows}
    assert set(by_title) == {"Page A", "Page B", "Page C"}
    for r in rows:
        # cross-document boilerplate removed, body text intact
        assert NAV not in r["text"]
        assert FOOTER not in r["text"]
    assert "quick brown fox" in by_title["Page A"]["text"]
    # the exact-dedup winner between the byte-identical A pages is the
    # lowest doc_id, and doc_ids hash the (run-specific) file path —
    # either twin is a correct survivor
    assert by_title["Page A"]["url"] in {
        "http://goodsite.com/a",
        "http://dupe.net/copy",
    }
    assert by_title["Page C"]["url"] == "http://other.org/c"


def test_domain_cap_stage(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("capped_crawl")
    (d / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL)
    )
    stages = curation_stages(
        spark,
        str(d),
        blocked_domains=["spam.example"],
        max_pages_per_domain=1,
        quality_thresholds={"min_words": 10},
    )
    capped = stages["capped"].collect()
    domains = [r["url"].split("/")[2] for r in capped]
    assert len(domains) == len(set(domains))  # ≤1 per registered domain


# slow: optional-stage wiring; the operators have their own fast tests (test_robots, test_lm_score)
@pytest.mark.slow
def test_optional_robots_and_perplexity_stages(spark, tmp_path_factory):
    from ir_analyses_spark.llm.curate import curate_crawl
    from ir_analyses_spark.llm.lm_score import train_char_lm

    d = tmp_path_factory.mktemp("crawl_opt")
    robots = _record(
        "http://goodsite.com/robots.txt",
        b"User-agent: *\r\nDisallow: /b\r\n",
        ctype="text/plain",
        seq=90,
    )
    (d / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL + [robots])
    )
    base = curation_stages(
        spark, str(d), blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
    )
    with_robots = curation_stages(
        spark, str(d), blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10}, enforce_robots=True,
    )
    assert "robots_allowed" not in base
    n = funnel_counts(with_robots)
    assert n["robots_allowed"] == n["pages"] - 1  # /b disallowed
    titles = {r["title"] for r in with_robots["final"].collect()}
    assert titles == {"Page A", "Page C"}  # Page B at /b is robots-blocked

    train = spark.createDataFrame(
        [(0, "the quick brown fox and the lazy dog with that story")],
        "doc_id long, text string",
    )
    lm = train_char_lm(train, n=3)
    with pytest.raises(ValueError, match="max_ppl_bucket"):
        curation_stages(spark, str(d), perplexity_lm=lm)
    lenient = curation_stages(
        spark, str(d), blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
        perplexity_lm=lm, max_ppl_bucket=3,
    )
    nn = funnel_counts(lenient)
    assert nn["ppl_filtered"] == nn["line_deduped"]  # bucket ≤ 3 keeps all
    assert nn["final"] == 3
    strictest = curate_crawl(
        spark, str(d), blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
        perplexity_lm=lm, max_ppl_bucket=1,
    )
    assert strictest.count() < 3  # tercile 1 only: somebody gets cut


def test_robots_matches_raw_uri_not_canonical(spark, tmp_path_factory):
    """'Disallow: /private/' must block the page crawled at /private/
    even though URL canonicalization collapses the trailing slash."""
    d = tmp_path_factory.mktemp("crawl_slash")
    recs = [
        _record(
            "http://s.example/robots.txt",
            b"User-agent: *\r\nDisallow: /private/\r\n",
            ctype="text/plain",
            seq=0,
        ),
        _record("http://s.example/private/", GOOD_A, seq=1),
        _record("http://s.example/open", GOOD_B, seq=2),
    ]
    (d / "c.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))
    stages = curation_stages(
        spark, str(d), enforce_robots=True,
        quality_thresholds={"min_words": 10},
    )
    titles = {r["title"] for r in stages["final"].collect()}
    assert titles == {"Page B"}


WET_TEXT_A = "the quick brown fox jumps over the lazy dog and runs to the river bank today"
WET_TEXT_B = "an entirely different body of text that still has enough real words in the line"
WET_TEXT_C = "a third page with its own long and unique sentence about the weather and the sea"


def _wet_crawl() -> list[bytes]:
    """WET twin of CRAWL: pre-extracted conversion records covering the
    same funnel behaviors (URL dup via tracking param, exact content
    dup across hosts, blocked domain, quality failure)."""
    return [
        _record("http://goodsite.com/a", WET_TEXT_A.encode(), rtype="conversion", seq=0),
        _record("http://goodsite.com/b", WET_TEXT_B.encode(), rtype="conversion", seq=1),
        _record("http://goodsite.com/a?utm_source=feed", WET_TEXT_A.encode(), rtype="conversion", seq=2),
        _record("http://other.org/c", WET_TEXT_C.encode(), rtype="conversion", seq=3),
        _record("http://dupe.net/copy", WET_TEXT_A.encode(), rtype="conversion", seq=4),
        _record("http://spam.example/z", WET_TEXT_B.encode(), rtype="conversion", seq=5),
        _record("http://goodsite.com/short", b"tiny", rtype="conversion", seq=6),
        _record("http://goodsite.com/info", b"software: wet", rtype="warcinfo", seq=7),
    ]


def test_wet_fast_path_skips_extraction(spark, tmp_path_factory):
    """r7 VERDICT item 8: WET input enters the funnel downstream of the
    HTML stages — no extract/content_like stage exists, titles are
    NULL, and the dedup/quality semantics are unchanged."""
    d = tmp_path_factory.mktemp("wet_crawl")
    (d / "c.warc.wet.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _wet_crawl())
    )
    stages = curation_stages(
        spark, str(d),
        blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
        input_format="wet",
    )
    assert "extracted" not in stages and "content_like" not in stages
    counts = funnel_counts(stages)
    assert counts["records"] == 8
    assert counts["pages"] == 7          # warcinfo dropped
    assert counts["unblocked"] == 6      # blocklist bound
    assert counts["url_deduped"] == 5    # tracking-param re-fetch folded
    assert counts["exact_deduped"] == 4  # cross-host copy folded
    assert counts["final"] == 3          # 'tiny' quality-gated
    rows = stages["final"].collect()
    assert {r["text"] for r in rows} == {WET_TEXT_A, WET_TEXT_B, WET_TEXT_C}
    assert all(r["title"] is None for r in rows)
    assert all(r["url"] is not None for r in rows)


def test_wet_enforce_robots_refuses(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("wet_ref")
    with pytest.raises(ValueError, match="enforce_robots is unavailable for WET"):
        curation_stages(spark, str(d), input_format="wet", enforce_robots=True)
    with pytest.raises(ValueError, match="input_format"):
        curation_stages(spark, str(d), input_format="arc")


def test_substring_dedup_stage(spark, tmp_path_factory):
    """The optional ladder bottom rung: a long run duplicated MID-LINE
    (different line contexts, so line dedup cannot see it) is cut from
    every occurrence except the corpus-wide smallest (doc_id, pos).

    Fixture contract (the r9 flake, VERDICT r9 finding 1): the funnel's
    ``doc_id`` hashes the crawl PATH, so WHICH duplicate wins keep-one
    flips with the pytest tmp dir — both permutations must survive every
    downstream gate. The cut operates at k-gram granularity and in the
    worst case swallows the whole cross-doc shared run (`` {boiler} and
    a ``), so each page carries ≥2 Gopher stopwords BOTH in its opening
    (before the boiler) and in its tail strictly after the shared run,
    and the openings/tails share no cross-doc substring ≥ k=16 chars
    (which would widen the cut). Keep-one itself is asserted on
    ``stages["substring_deduped"]`` — the stage under test — with one
    integration assertion on ``final``."""
    boiler = "this exact disclaimer sentence is repeated verbatim across publishers"
    # openings: ≥2 stopwords each, mutually distinct phrasing
    page1 = _page(
        [f"alpha opening sentences with the details {boiler}"
         " and a first unique tail with words of substance"],
        "Dup One",
    )
    page2 = _page(
        [f"beta report preamble that covers the summary {boiler}"
         " and a second unique tail that keeps the theme"],
        "Dup Two",
    )
    page3 = _page(
        ["gamma page with none of the shared boilerplate and only original words"],
        "Clean",
    )
    # executable fixture contract: under EITHER winner permutation the
    # loser's worst-case post-cut text (opening + tail after the shared
    # run, boundary words fused by the k-gram cut) keeps ≥2 stopwords
    from ir_analyses_spark.llm.quality_rules import GOPHER_STOPWORDS
    for worst in (
        "alpha opening sentences with the detailsfirst unique tail"
        " with words of substance",
        "beta report preamble that covers the summarysecond unique tail"
        " that keeps the theme",
    ):
        words = worst.split()
        assert sum(w in GOPHER_STOPWORDS for w in words) >= 2
        assert len(words) >= 8  # min_words under the worst-case fusion
    recs = [
        _record("http://a.com/1", page1, seq=0),
        _record("http://b.com/2", page2, seq=1),
        _record("http://c.com/3", page3, seq=2),
    ]
    d = tmp_path_factory.mktemp("subdup")
    (d / "c.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))
    stages = curation_stages(
        spark,
        str(d),
        quality_thresholds={"min_words": 8},
        substring_dedup=True,
        line_dedup_min_docs=3,  # NAV/FOOTER lines repeat in all 3 docs
    )
    assert "substring_deduped" in stages
    # keep-one asserted at the stage under test: exactly one copy of the
    # boiler survives the cut, losers keep their unique tails (whichever
    # doc the path-hash permutation made the winner)
    cut_texts = {r["url"]: r["text"] for r in stages["substring_deduped"].collect()}
    assert sum(1 for t in cut_texts.values() if boiler in t) == 1
    stage_losers = [t for t in cut_texts.values() if boiler not in t
                    and ("first unique tail" in t or "second unique tail" in t)]
    assert len(stage_losers) == 1
    # integration: both permutations clear the Gopher gates into `final`
    texts = {r["url"]: r["text"] for r in stages["final"].collect()}
    assert len(texts) == 3
    with_boiler = [u for u, t in texts.items() if boiler in t]
    assert len(with_boiler) == 1  # exactly the winner keeps it
    # losers keep their unique tails around the cut
    loser = next(
        t for u, t in texts.items()
        if boiler not in t and ("first unique tail" in t or "second unique tail" in t)
    )
    assert loser
    assert "gamma page" in next(t for t in texts.values() if "gamma" in t)
    # stage off -> key absent, boilerplate kept everywhere it occurs
    base = curation_stages(
        spark, str(d), quality_thresholds={"min_words": 8},
        line_dedup_min_docs=3,
    )
    assert "substring_deduped" not in base
    base_texts = [r["text"] for r in base["final"].collect()]
    assert sum(1 for t in base_texts if boiler in t) == 2


# slow: route-parity certificate; row-level scan parity pinned fast in test_warc_datasource
@pytest.mark.slow
def test_warc_stream_route_identical_funnel(spark, tmp_path_factory):
    """input_format='warc-stream' reads the SAME crawl through the
    streaming DataSource (r11 VERDICT item 4): every stage count and
    the final corpus must be byte-identical to the binaryFile route —
    only the scan's memory posture changes."""
    d = tmp_path_factory.mktemp("crawl_stream")
    (d / "crawl.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL)
    )
    kw = dict(
        blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
        persist_intermediates=False,
    )
    via_files = curation_stages(spark, str(d), input_format="warc", **kw)
    via_stream = curation_stages(
        spark, str(d), input_format="warc-stream", **kw
    )
    assert funnel_counts(via_files) == funnel_counts(via_stream)
    # FULL byte equality, doc_id/url included: the DataSource's path
    # column is canonicalized to binaryFile's rendering (r12 fix), so
    # document identity — xxhash64(path#record_seq) — is route-
    # independent and every min-doc_id tie-break lands identically.
    # (Before the fix only (title, text) could be compared, and at
    # 1M pages even that diverged: the substring rung's first-seen
    # winner flipped with doc_id and the kept-vs-cut text then passed
    # the word floor differently.)
    key = lambda rows: sorted(map(tuple, rows))
    assert key(via_files["final"].collect()) == key(
        via_stream["final"].collect()
    )


def test_novelty_and_dsir_stages(spark, tmp_path_factory):
    """The novelty gate and DSIR selection stages wire into the funnel
    in order (after decontamination, before the model gates), and each
    only appears when enabled."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("crawl_gates")
    (d / "crawl.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL)
    )
    base = curation_stages(
        spark,
        str(d),
        blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
        persist_intermediates=False,
    )
    assert "novelty_filtered" not in base and "dsir_selected" not in base
    target = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], "text string"
    )
    # persist_intermediates stays ON (the default): this test fires five
    # actions over the gated graph (three counts + two collects), and
    # with persists off each one re-ran the whole parse+dedup funnel —
    # 84 s of suite wall for no extra coverage
    gated = curation_stages(
        spark,
        str(d),
        blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
        novelty_filter=True,
        novelty_min_permille=1,  # permissive: drop only all-dup docs
        dsir_target=target,
    )
    assert list(gated).index("novelty_filtered") < list(gated).index(
        "dsir_selected"
    )
    # count only the three stages the assertions read: a full
    # funnel_counts fired one action per stage with NOTHING persisted,
    # re-running the whole upstream funnel (parse + dedups + gates) ~13
    # times — this one test cost 131 s of the suite for counts it never
    # asserted on (r15 suite-runtime fix; coverage unchanged)
    n = {
        name: gated[name].count()
        for name in ("line_deduped", "novelty_filtered", "dsir_selected")
    }
    # both stages only ever shrink, and DSIR's above-mean gate always
    # drops SOMETHING on a >1-doc corpus (mean is strict)
    assert n["novelty_filtered"] <= n["line_deduped"]
    assert 0 < n["dsir_selected"] < max(n["novelty_filtered"], 2)
    # stage frames keep the funnel's passthrough shape
    assert set(gated["dsir_selected"].columns) == {
        "doc_id", "url", "title", "text"
    }
    # the DSIR-kept docs are exactly the gate's own verdict on the
    # novelty stage's output (composition, not re-derivation)
    from ir_analyses_spark.llm.dsir import dsir_gate

    want = {
        r["doc_id"]
        for r in dsir_gate(
            gated["novelty_filtered"].select("doc_id", "text"), target
        ).collect()
    }
    got = {r["doc_id"] for r in gated["dsir_selected"].collect()}
    for s in gated.values():
        s.unpersist()
    assert got == want
