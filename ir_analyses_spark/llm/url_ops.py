"""URL operators for crawl curation (SURVEY §2B LLM ext — between the
WARC source's `target_uri` and the per-domain sampling/quality stages):
parsing, canonicalization, suffix blocklists, per-domain caps.

All pure JVM column expressions built on Spark's `parse_url` — no UDFs,
no shuffle except where the semantics require one (per-domain caps);
the blocklist is a broadcast anti-join on exploded host suffixes (a
host has ≤ ~6 dot-suffixes, so the explode is bounded and exact
AdBlock-style suffix matching needs no regex scan of the corpus).

Registered-domain extraction uses a documented heuristic: last two host
labels, or last three when the trailing two are a known multi-part
public suffix (`MULTIPART_SUFFIXES` — the common subset, not the full
Mozilla PSL; a production deployment swaps in the full list the same
way). Canonicalization follows the C4-style URL key: lowercase
scheme/host, drop fragment/userinfo/port, strip tracking parameters
(`TRACKING_PARAMS`), sort surviving query parameters, collapse
trailing slashes.

New module per the evidence-ledger rule; verified by
`tests/test_url_ops.py` against a urllib.parse-based Python reference
and crafted blocklist/cap scenarios.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Multi-part public suffixes recognized by the registered-domain
#: heuristic (common subset; swap in the full PSL for production).
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "co.nz", "com.sg", "com.tw", "co.za",
)

#: Query parameters dropped during canonicalization (tracking noise).
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid",
)

_TRACKING_RE = "^(" + "|".join(TRACKING_PARAMS) + ")="


def host_expr(url) -> Column:
    """Lowercased host (parse_url drops port and userinfo)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def registered_domain_expr(host: Column) -> Column:
    """Heuristic eTLD+1 from a lowercased host — see module docstring."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return F.when(host.isNull() | (n < 2), host).otherwise(
        F.when(
            (n >= 3) & last2.isin(*MULTIPART_SUFFIXES), last3
        ).otherwise(last2)
    )


def url_parts_df(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append (protocol, host, registered_domain, path, query)."""
    u = F.col(url_col)
    host = host_expr(u)
    return df.select(
        "*",
        F.lower(F.parse_url(u, F.lit("PROTOCOL"))).alias("protocol"),
        host.alias("host"),
        registered_domain_expr(host).alias("registered_domain"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY")).alias("query"),
    )


def normalize_url_expr(url) -> Column:
    """C4-style canonical URL key; NULL when the URL has no host.

    lowercase scheme://host + path (trailing slashes collapsed, empty →
    "/") + '?' + sorted non-tracking query params (omitted when none
    survive). Fragments, userinfo, and ports do not appear — parse_url
    already excludes them from HOST.
    """
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = host_expr(url)
    path = F.parse_url(url, F.lit("PATH"))
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when((path == "") | path.isNull(), F.lit("/")).otherwise(path)
    query = F.parse_url(url, F.lit("QUERY"))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_RE),
        )
    )
    qpart = F.when(
        query.isNull() | (F.size(params) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(params, "&")))
    return F.when(
        host.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(proto, F.lit("://"), host, path, qpart))


def host_suffixes_expr(host: Column) -> Column:
    """All dot-suffixes of a host, e.g. a.b.co.uk →
    [a.b.co.uk, b.co.uk, co.uk, uk] — the exact-match universe for
    suffix blocklists."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def blocked_domain_pred(url, blocked: list[str]) -> Column:
    """TRUE exactly when ``url``'s host equals, or is a subdomain of, a
    blocked domain from the Python-list blocklist — the predicate behind
    :func:`filter_blocked_domains`' list path, exposed as a column so
    audit surfaces (the one-pass funnel counts) and the filter share ONE
    spelling and cannot diverge. Never NULL: an un-parseable URL (no
    host) yields FALSE — blocking is an explicit decision, not a parse
    failure side-effect."""
    host = host_expr(url)
    sfx = F.when(
        host.isNull(), F.array().cast("array<string>")
    ).otherwise(host_suffixes_expr(host))
    # small Python list → a literal array and one arrays_overlap
    # predicate: pure codegen, nothing joins at all
    lits = F.array(*[F.lit(d.lower().strip().strip(".")) for d in blocked])
    return F.arrays_overlap(sfx, lits)


def filter_blocked_domains(
    df: DataFrame, blocked: list[str] | DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose host equals, or is a subdomain of, any blocked
    domain. ``blocked`` is a Python list or a single-column DataFrame;
    it is broadcast — blocklists are dims, the corpus never reshuffles.
    Rows with un-parseable URLs (no host) are KEPT — blocking is an
    explicit decision, not a parse failure side-effect."""
    if not isinstance(blocked, DataFrame):
        return df.filter(~blocked_domain_pred(F.col(url_col), blocked))
    host = host_expr(F.col(url_col))
    # same canonical form the list path gets: lowercase, trimmed, no
    # leading/trailing dots
    bdf = blocked.toDF("blocked_domain").select(
        F.regexp_replace(
            F.lower(F.trim("blocked_domain")), r"^\.+|\.+$", ""
        ).alias("blocked_domain")
    )
    # DataFrame blocklist: resolve it to the DISTINCT HOSTS it blocks
    # (distinct-host universe ≪ corpus; suffix explode happens on that
    # small side), then one anti-join of the corpus on the host key —
    # deterministic, and never keyed on data columns where a NULL would
    # exempt a row from the blocklist.
    hosts = df.select(host.alias("_host")).where(host.isNotNull()).distinct()
    blocked_hosts = (
        hosts.select(
            "_host", F.explode(host_suffixes_expr(F.col("_host"))).alias("_sfx")
        )
        .join(
            F.broadcast(bdf),
            F.col("_sfx") == F.col("blocked_domain"),
            "left_semi",
        )
        .select("_host")
        .distinct()
    )
    return df.join(
        F.broadcast(blocked_hosts), host == F.col("_host"), "left_anti"
    ).select(df.columns)


def cap_per_domain(
    df: DataFrame,
    k: int,
    url_col: str = "url",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``k`` rows per registered domain, deterministically
    by ``order_col`` — the per-domain sampling cap that stops a single
    site from dominating a crawl mixture. One shuffle on the domain key;
    rows without a parseable host form their own NULL-domain group."""
    if k < 1:
        raise ValueError("k must be >= 1")
    dom = registered_domain_expr(host_expr(F.col(url_col)))
    w = Window.partitionBy(dom).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
