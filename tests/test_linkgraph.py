"""Link-graph extraction invariants (llm/linkgraph.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
resolution contract and the self-loop exclusion.
"""

from __future__ import annotations

import duckdb
import pytest

from ir_analyses_spark.llm.linkgraph import extract_edges, host_degrees
from ir_analyses_spark.registry import all_oracles


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def degrees(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/documents.parquet')"
    )
    return con.execute(all_oracles()["crawl_link_graph"]).df()


def test_degree_report_sane(degrees):
    """Every host's distinct-source fan-in is bounded by its edge count;
    the synthesized affine targets spread in-degree across many hosts."""
    assert (degrees["n_src_hosts"] <= degrees["in_edges"]).all()
    assert (degrees["in_edges"] >= 1).all()
    assert len(degrees) > 10
    # fan-in is non-degenerate: some host collects several sources
    assert degrees["n_src_hosts"].max() > 1


def test_resolution_contract(spark):
    """Absolute hrefs kept; host-relative resolved to the source host
    (then excluded as a self-loop); page-relative / mailto / javascript
    / fragment dropped; cross-host relative CANNOT occur by
    construction."""
    pages = spark.createDataFrame(
        [
            (
                "http://a.example/p/1",
                '<html><a href="http://b.example/x">1</a>'
                '<a href="/local">2</a>'
                '<a href="rel/page">3</a>'
                '<a href="mailto:x@y">4</a>'
                '<a href="javascript:void(0)">5</a>'
                '<a href="#frag">6</a>'
                '<a href="https://c.example/">7</a></html>',
            ),
        ],
        "url string, html string",
    )
    edges = {(r["src_host"], r["dst_host"]) for r in extract_edges(pages).collect()}
    assert edges == {("a.example", "b.example"), ("a.example", "c.example")}


def test_self_loops_excluded_from_degrees(spark):
    pages = spark.createDataFrame(
        [
            ("http://a.example/1", '<a href="http://a.example/2">s</a>'
                                   '<a href="http://b.example/x">o</a>'),
            ("http://c.example/1", '<a href="http://b.example/y">o</a>'),
        ],
        "url string, html string",
    )
    deg = {r["host"]: r for r in host_degrees(extract_edges(pages)).collect()}
    assert set(deg) == {"b.example"}
    assert deg["b.example"]["in_edges"] == 2
    assert deg["b.example"]["n_src_hosts"] == 2
