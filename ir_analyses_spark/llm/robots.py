"""robots.txt policy extraction and enforcement for crawl curation
(SURVEY §2B LLM ext — the compliance filter between the WARC source and
the corpus: drop pages a site's robots policy disallowed for generic
crawlers).

Parsing runs as a JVM ``aggregate`` fold over the file's lines — one
pass per robots.txt, no Python — implementing the common-subset
semantics production parsers agree on (RFC 9309 shape):

- a group is one or more consecutive ``User-agent:`` lines followed by
  directives; the group applies to ``*`` if ANY of its agent lines is
  ``*``;
- ``Disallow:`` values in an applying group become path-prefix rules
  (empty value = no rule; ``/`` = everything);
- RFC 9309 wildcards are reduced to their CONSERVATIVE prefix (r7
  ADVICE — matching ``*``/``$`` as literal characters under-enforced):
  a trailing ``$`` (end anchor) is dropped, then the value is truncated
  at its first ``*`` — so ``/*?sessionid`` enforces as ``/`` (the whole
  host) and ``/foo$`` as ``/foo``. Over-blocking, never under-blocking:
  every URL the real wildcard rule matches is matched by the reduced
  prefix. A value that reduces to the empty string (``Disallow: *``)
  matches every path;
- any non-User-agent line closes the agent-collecting phase; the
  group's rules keep accumulating until the next group starts;
- comments (``#``) and unknown directives are ignored. ``Allow:``
  precedence is NOT modeled (documented simplification: a page under
  both Allow and Disallow is treated as disallowed — the conservative
  side for training-data use).

Enforcement is a broadcast anti-join: the rule table (host, prefix) is
dimension-sized; pages match on host + ``startswith`` — the corpus
never reshuffles.

New module per the evidence-ledger rule; verified against an
independent Python parser in `tests/test_robots.py` plus an e2e from a
synthesized crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .url_ops import host_expr


def _fold_line(acc, line):
    """One robots.txt line into the (collecting, star, rules) state."""
    stripped = F.trim(F.regexp_replace(line, r"#.*$", ""))
    lower = F.lower(stripped)
    # everything after the FIRST colon (a Disallow path may contain ':')
    value = F.trim(F.regexp_extract(stripped, r"^[^:]*:(.*)$", 1))
    is_ua = lower.rlike(r"^user-agent\s*:")
    is_dis = lower.rlike(r"^disallow\s*:")
    new_collecting = F.when(is_ua, F.lit(True)).otherwise(F.lit(False))
    new_star = F.when(
        is_ua & acc["collecting"], acc["star"] | (value == "*")
    ).when(is_ua, value == "*").otherwise(acc["star"])
    new_rules = F.when(
        is_dis & acc["star"] & (value != ""),
        F.array_append(acc["rules"], value),
    ).otherwise(acc["rules"])
    return F.struct(
        new_collecting.alias("collecting"),
        new_star.alias("star"),
        new_rules.alias("rules"),
    )


def parse_robots_expr(text_col):
    """array<string> of ``*``-applicable Disallow prefixes, as a column
    expression over the robots.txt body. Wildcard rules are reduced to
    their conservative prefix here (see module docstring): drop one
    trailing ``$`` end-anchor, then truncate at the first ``*`` — the
    reduced prefix matches a superset of what the wildcard matched."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.split(F.regexp_replace(t, "\r", ""), "\n")
    init = F.struct(
        F.lit(False).alias("collecting"),
        F.lit(False).alias("star"),
        F.array().cast("array<string>").alias("rules"),
    )
    raw = F.aggregate(lines, init, _fold_line, lambda acc: acc["rules"])
    return F.transform(
        raw,
        lambda r: F.regexp_extract(
            F.regexp_replace(r, r"\$$", ""), r"^([^*]*)", 1
        ),
    )


def robots_rules_df(
    robots: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """(host, disallow_prefix) — one row per rule, hosts lowercased,
    duplicate rules collapsed."""
    return (
        robots.select(
            F.lower(F.col(host_col)).alias("host"),
            F.explode(parse_robots_expr(text_col)).alias("disallow_prefix"),
        )
        .distinct()
    )


def robots_rules_from_warc(records: DataFrame) -> DataFrame:
    """Rule table straight from a crawl read with ``parse_http=True``:
    every 200 response whose URL path is exactly /robots.txt."""
    robots = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & (F.parse_url(F.col("target_uri"), F.lit("PATH")) == "/robots.txt")
    ).select(
        host_expr(F.col("target_uri")).alias("host"),
        F.col("body").cast("string").alias("text"),
    )
    return robots_rules_df(robots)


def filter_robots_disallowed(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages whose path starts with a disallow prefix for their
    host. Pages from hosts with no robots.txt (or no ``*`` rules) pass.
    Un-parseable URLs pass — policy enforcement is a decision on a
    parsed URL, not a parse-failure side effect."""
    host = host_expr(F.col(url_col))
    path = F.coalesce(
        F.nullif(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("")),
        F.lit("/"),
    )
    hit = (
        F.col("_r_host").isNotNull()
        & path.startswith(F.col("_r_prefix"))
    )
    r = F.broadcast(
        rules.select(
            F.col("host").alias("_r_host"),
            F.col("disallow_prefix").alias("_r_prefix"),
        )
    )
    return pages.join(
        r, (host == F.col("_r_host")) & hit, "left_anti"
    )
