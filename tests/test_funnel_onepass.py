"""funnel_counts_onepass (r15, guide §2.3/§5.2): the one-job
conditional-aggregate audit must equal funnel_counts(curation_stages(...))
— same dict, same order — on crawls exercising every attrition edge the
shared predicates gate: non-page records, blocked domains, URL
duplicates, an unparseable target URI, the per-domain cap actually
binding, link-density drops, exact-content duplicates, docs hollowed to
empty text by global line dedup, and the quality gate. This is the
non-divergence pin the stage-predicate sharing promises."""

from __future__ import annotations

import gzip

import pytest

from ir_analyses_spark.llm.curate import (
    curation_stages,
    funnel_counts,
    funnel_counts_onepass,
)

from .test_curate import CRAWL, _page, _record

# three docs whose every body line appears in ≥2 documents: all three
# survive exact dedup (distinct texts) but come out of line dedup with
# EMPTY text — counted in line_deduped, dropped by the quality gate
HOLLOW_1 = _page(
    [
        "shared line alpha beta gamma delta with plenty of words",
        "shared line epsilon zeta eta theta with plenty of words",
    ],
    "H1",
)
HOLLOW_2 = _page(
    [
        "shared line alpha beta gamma delta with plenty of words",
        "shared line iota kappa lambda mu with plenty of words",
    ],
    "H2",
)
HOLLOW_3 = _page(
    [
        "shared line epsilon zeta eta theta with plenty of words",
        "shared line iota kappa lambda mu with plenty of words",
    ],
    "H3",
)

# one domain with three distinct pages so a k=2 cap actually binds
_CAP = [
    _record(
        f"http://capme.io/p{i}",
        _page([f"cap page {i} has its own unique and long body line here"], f"C{i}"),
        seq=30 + i,
    )
    for i in (1, 2, 3)
]

EXTRA = [
    _record("http://hollow.org/h1", HOLLOW_1, seq=20),
    _record("http://hollow.org/h2", HOLLOW_2, seq=21),
    _record("http://hollow.org/h3", HOLLOW_3, seq=22),
    # non-null target URI with no parseable host: normalized URL is NULL,
    # so it is a page-stage drop in both implementations
    _record("not a url at all", _page(["body"], "NoHost"), seq=23),
    *_CAP,
]


@pytest.fixture(scope="module")
def crawl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("onepass_crawl")
    (d / "crawl.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in CRAWL + EXTRA)
    )
    return str(d)


def _stage_graph_counts(spark, crawl_dir, **kwargs):
    # default persists stay on: funnel_counts fires one action per stage
    # and an unpersisted graph re-parses the crawl for each (persistence
    # does not change any count — the one-pass side is the subject here)
    stages = curation_stages(spark, crawl_dir, **kwargs)
    counts = funnel_counts(stages)
    for s in stages.values():
        s.unpersist()
    return counts


def test_onepass_equals_stage_graph_default(spark, crawl_dir):
    kwargs = dict(
        blocked_domains=["spam.example"],
        quality_thresholds={"min_words": 10},
    )
    want = _stage_graph_counts(spark, crawl_dir, **kwargs)
    got = funnel_counts_onepass(spark, crawl_dir, **kwargs)
    # order matters too: the funnel query feeds the dict straight into
    # its (stage, n_rows) output frame
    assert list(got.items()) == list(want.items())
    # the crawl actually exercises the attrition edges this pin is for
    assert want["records"] > want["pages"] > want["unblocked"]
    assert want["unblocked"] > want["url_deduped"]
    assert want["content_like"] < want["extracted"]
    assert want["exact_deduped"] < want["content_like"]
    assert want["final"] < want["line_deduped"]


def test_onepass_equals_stage_graph_cap_binds_no_blocklist(spark, crawl_dir):
    kwargs = dict(
        max_pages_per_domain=2,
        quality_thresholds={"min_stopwords_present": 0},
    )
    want = _stage_graph_counts(spark, crawl_dir, **kwargs)
    got = funnel_counts_onepass(spark, crawl_dir, **kwargs)
    assert list(got.items()) == list(want.items())
    # the cap must actually have cut something for this to pin the window
    assert want["capped"] < want["url_deduped"]


def test_onepass_leaves_nothing_persisted(spark, crawl_dir):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    funnel_counts_onepass(
        spark, crawl_dir, blocked_domains=["spam.example"]
    )
    assert jsc.getPersistentRDDs().size() == before
