"""Crawl link-graph extraction (LLM curation ext).

The quality signals real crawl pipelines rank hosts by (Common Crawl
publishes harmonic-centrality/PageRank host rankings; Gopher and
RefinedWeb both cite link-based spam filtering) start from one
operator: extract every anchor's target from the HTML, resolve it
against the page URL, and aggregate the (src_host → dst_host) edge
list. `llm/html_extract.py` already measures anchor-text MASS (link
density); this module extracts the anchor TARGETS and builds the graph
that `ops/graph.py`'s PageRank/centrality operators consume.

Resolution contract (documented subset, deliberately conservative):

- absolute ``http(s)://…`` hrefs are kept verbatim;
- host-relative ``/path`` hrefs resolve against the source page's
  scheme + host;
- everything else (page-relative paths, ``mailto:``, ``javascript:``,
  fragments) is dropped — cross-HOST edges are what the host graph
  needs, and page-relative links can never leave the host.

The href pattern lives in the Java∩RE2 regex subset (the
`llm/html_extract.py` discipline) so the DuckDB oracle executes the
same pattern text. Pattern scope (documented subset): lowercase
``<a … href="…"`` with double quotes and at least one attribute
character after ``<a `` — the form every HTML serializer emits;
uppercase tags and single-quoted hrefs are out of scope here the same
way they are for `llm/html_extract.py`'s codegen fast path (its
faithful stdlib tier is the escape hatch for archival markup).
Resolution is pure string expressions (parse_url on the Spark side,
the same split spelled in SQL on the oracle side).

Scale shape: extraction is a per-row projection (regexp_extract_all →
explode); the only shuffle is the host-level degree aggregate on
fixed-width host strings — partial-agg combined. Self-loops (edges
back to the source host) are excluded from the degree report: within-
host navigation chrome would otherwise dominate every host's in-degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: anchor-target pattern — Java∩RE2 subset, group 1 = href value
_HREF_RE = '<a [^>]*href="([^"]*)"'


def extract_edges(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(src_host, dst_host) host-graph edges from anchor targets,
    self-loops excluded."""
    hrefs = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.expr(f"regexp_extract_all({html_col}, '{_HREF_RE}', 1)")
        ).alias("href"),
    )
    src_scheme = F.parse_url("src_url", F.lit("PROTOCOL"))
    src_host = F.parse_url("src_url", F.lit("HOST"))
    resolved = hrefs.select(
        src_host.alias("src_host"),
        F.when(
            F.col("href").startswith("http://")
            | F.col("href").startswith("https://"),
            F.col("href"),
        )
        .when(
            F.col("href").startswith("/"),
            F.concat(src_scheme, F.lit("://"), src_host, F.col("href")),
        )
        .alias("dst_url"),
    ).filter(F.col("dst_url").isNotNull())
    return resolved.select(
        "src_host", F.parse_url("dst_url", F.lit("HOST")).alias("dst_host")
    ).filter(F.col("dst_host") != F.col("src_host"))


def host_degrees(edges: DataFrame) -> DataFrame:
    """Per-host in-degree report: total in-edges + distinct source
    hosts — the fan-in signals host-quality rankers start from."""
    return edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_edges"),
        F.countDistinct("src_host").alias("n_src_hosts"),
    )


#: synthesized page: two cross-host absolute anchors (targets derived
#: from doc_id by fixed affine maps) + one host-relative anchor (stays
#: within the source host → excluded from the host graph as a
#: self-loop) + one mailto (dropped by the resolution contract)
_PAGE_SQL = (
    "'<html><body>"
    "<a href=\"http://site' || ((doc_id * 7 + 1) % 50) || '.example/p/' || doc_id || '\">x</a>"
    "<a class=\"n\" href=\"http://site' || ((doc_id * 13 + 2) % 50) || '.example/q\">y</a>"
    "<a href=\"/local/' || doc_id || '\">z</a>"
    "<a href=\"mailto:a@b\">m</a>"
    "</body></html>'"
)


def crawl_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: synthesized crawl pages (every doc hosted on
    ``site{doc_id % 50}.example`` with two cross-host anchors, one
    relative anchor, one mailto) → edges → host in-degree report."""
    docs = load_table(spark, "documents", sf_dir)
    pages = docs.select(
        F.concat(
            F.lit("http://site"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.expr(_PAGE_SQL).alias("html"),
    )
    return host_degrees(extract_edges(pages))


CRAWL_LINK_GRAPH_SQL = """
WITH edges AS (
  SELECT 'site' || (doc_id % 50) || '.example' AS src_host,
         'site' || ((doc_id * 7 + 1) % 50) || '.example' AS dst_host
  FROM documents
  UNION ALL
  SELECT 'site' || (doc_id % 50) || '.example',
         'site' || ((doc_id * 13 + 2) % 50) || '.example'
  FROM documents
)
SELECT dst_host AS host,
       COUNT(*) AS in_edges,
       COUNT(DISTINCT src_host) AS n_src_hosts
FROM edges
WHERE dst_host <> src_host
GROUP BY 1
"""

QUERIES = {"crawl_link_graph": crawl_link_graph}
ORACLES = {"crawl_link_graph": CRAWL_LINK_GRAPH_SQL}
