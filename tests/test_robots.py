"""robots.txt parsing/enforcement (llm/robots.py) vs an independent
Python parser, plus enforcement semantics and the WARC e2e."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.llm.robots import (
    filter_robots_disallowed,
    parse_robots_expr,
    robots_rules_df,
    robots_rules_from_warc,
)

ROBOTS = [
    (
        "a.example",
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp\n"
        "\nUser-agent: evilbot\nDisallow: /\n",
    ),
    (
        "b.example",
        "# only a specific bot is restricted\nUser-agent: googlebot\n"
        "Disallow: /nogoog/\n",
    ),
    (
        "c.example",
        "User-agent: specialbot\nUser-agent: *\nDisallow: /both/\n"
        "User-agent: otherbot\nDisallow: /other/\n",
    ),
    ("d.example", "User-agent: *\nDisallow:\n"),  # empty = allow all
    ("e.example", "User-agent: *\r\nDisallow: /crlf/ # trailing comment\r\n"),
    ("f.example", "User-agent: *\nDisallow: /\n"),  # block everything
    ("g.example", "garbage file without any directives at all"),
    (
        # RFC 9309 wildcards → conservative prefixes (r7 ADVICE)
        "h.example",
        "User-agent: *\nDisallow: /*?sessionid\nDisallow: /search/*/raw\n"
        "Disallow: /exact$\nDisallow: /lit$eral\nDisallow: *\n",
    ),
]


def _py_star_rules(text: str) -> list[str]:
    collecting, star, rules = False, False, []
    for raw in text.replace("\r", "").split("\n"):
        line = raw.split("#")[0].strip()
        low = line.lower()
        if low.startswith("user-agent") and ":" in line:
            value = line.split(":", 1)[1].strip()
            star = (star if collecting else False) or value == "*"
            collecting = True
            continue
        collecting = False
        if low.startswith("disallow") and ":" in line and star:
            value = line.split(":", 1)[1].strip()
            if value:
                # conservative wildcard reduction (r7 ADVICE): drop one
                # trailing $ end-anchor, truncate at the first *
                if value.endswith("$"):
                    value = value[:-1]
                rules.append(value.split("*", 1)[0])
    return rules


@pytest.fixture(scope="module")
def robots_df(spark):
    return spark.createDataFrame(ROBOTS, "host string, text string")


def test_parse_matches_python_reference(spark, robots_df):
    got = {
        r["host"]: r["rules"]
        for r in robots_df.select(
            "host", parse_robots_expr("text").alias("rules")
        ).collect()
    }
    for host, text in ROBOTS:
        assert got[host] == _py_star_rules(text), host


def test_parse_semantics(spark, robots_df):
    got = {
        r["host"]: r["rules"]
        for r in robots_df.select(
            "host", parse_robots_expr("text").alias("rules")
        ).collect()
    }
    assert got["a.example"] == ["/private/", "/tmp"]  # evilbot group excluded
    assert got["b.example"] == []  # googlebot-only → no * rules
    assert got["c.example"] == ["/both/"]  # multi-agent group incl. *
    assert got["d.example"] == []  # empty Disallow is allow-all
    assert got["e.example"] == ["/crlf/"]  # CRLF + comment handling
    assert got["f.example"] == ["/"]
    assert got["g.example"] == []
    # wildcard reduction: truncate at first *, drop trailing $ anchor,
    # keep a mid-value $ literal; bare * reduces to match-everything ""
    assert got["h.example"] == ["/", "/search/", "/exact", "/lit$eral", ""]


def test_enforcement(spark, robots_df):
    rules = robots_rules_df(robots_df)
    pages = spark.createDataFrame(
        [
            (0, "http://a.example/public/x"),
            (1, "http://a.example/private/secret"),
            (2, "http://a.example/tmpfile"),        # /tmp prefix matches
            (3, "http://b.example/nogoog/page"),    # rule not for *
            (4, "http://c.example/both/y"),
            (5, "http://c.example/other/z"),        # otherbot group only
            (6, "http://f.example/anything"),
            (7, "http://f.example"),                # empty path → "/"
            (8, "http://unknown.example/x"),        # no robots at all
            (9, "not a url"),
            (10, "http://h.example/page?sessionid=1"),  # /*?sessionid → /
            (11, "http://h.example/whatever"),          # bare * → ""
        ],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in filter_robots_disallowed(pages, rules).collect()}
    assert kept == {0, 3, 5, 8, 9}


def test_enforcement_plan_broadcasts(spark, robots_df):
    rules = robots_rules_df(robots_df)
    pages = spark.createDataFrame(
        [(0, "http://a.example/x")], "doc_id long, url string"
    )
    plan = (
        filter_robots_disallowed(pages, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan and "LeftAnti" in plan


def test_rules_from_warc(spark, tmp_path):
    import gzip

    from ir_analyses_spark.io.warc import read_warc
    from tests.test_warc import _http, _record

    robots_body = b"User-agent: *\r\nDisallow: /blocked/\r\n"
    recs = [
        _record("response", _http("200 OK", "text/plain", robots_body), "http://site.example/robots.txt", 0),
        _record("response", _http("200 OK", "text/html", b"<p>x</p>"), "http://site.example/blocked/a", 1),
        _record("response", _http("200 OK", "text/html", b"<p>y</p>"), "http://site.example/ok/b", 2),
    ]
    p = tmp_path / "r.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in recs))
    records = read_warc(spark, str(p), parse_http=True)
    rules = robots_rules_from_warc(records)
    assert [tuple(r) for r in rules.collect()] == [("site.example", "/blocked/")]
    pages = records.filter(
        (F.col("warc_type") == "response")
        & (F.parse_url("target_uri", F.lit("PATH")) != "/robots.txt")
    ).select("record_seq", F.col("target_uri").alias("url"))
    kept = {r["record_seq"] for r in filter_robots_disallowed(pages, rules).collect()}
    assert kept == {2}
