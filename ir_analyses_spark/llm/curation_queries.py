"""Driver-oracled registry queries for the crawl-curation surface
(r7 VERDICT item 1: the round-7 curation modules — WARC source, HTML
extraction, Gopher quality rules, URL ops, line/span dedup, char-LM
perplexity, funnel, export — were pytest-oracled only; this module
gives each one a ``queries()``/``oracle_sql()`` pair so the grading
driver certifies them against DuckDB at sf0.01).

Design rule for every query here: the input is DERIVED from the
``documents`` parquet table by deterministic arithmetic on ``doc_id``
(shared SQL fragments evaluated identically by Spark and DuckDB, or
unicode literals paired with ``chr()`` codepoints), so the DuckDB
oracle can recompute the EXPECTED output from the same view in closed
form — independent of the Spark implementation under test. Outputs are
exact types (ints, strings, IEEE-exact double divisions); no
transcendental floats ride a driver row (log-based perplexity scores
keep their 1e-9-tolerance pytest oracle, and their integer sufficient
statistics are certified here instead via ``charlm_scoring_stats``).

New module per the evidence-ledger rule (registry queries live apart
from the operator modules they exercise, so future operator work does
not stale these rows and vice versa).

Reference parity: the reference app (pandas/SQLAlchemy ETL) has no
crawl surface; these operators implement the published C4 / CCNet /
Gopher / RefinedWeb curation recipes (cited in each operator module's
docstring) — this file only certifies them.
"""

from __future__ import annotations

import gzip
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from ..ops.helpers import local_df
from .export import training_layout
from .porthash import WS_CLASS as _WS
from .html_extract import extract_text_df
from .lm_score import _char_ngrams, train_char_lm, train_counts_sql
from .linedup import remove_duplicate_spans, remove_global_duplicate_units
from .quality_rules import (
    GOPHER_THRESHOLDS,
    gopher_flags,
    quality_signals,
    quality_signals_sql,
)
from .robots import parse_robots_expr
from .textnorm import clean_text_df
from .url_ops import cap_per_domain, normalize_url_expr, url_parts_df

# ---------------------------------------------------------------------------
# warc_roundtrip_parse — io/warc.py record + HTTP parsing (incl. the r8
# chunked / content-coding fix), certified via a serialize→parse
# roundtrip that never leaves the executors.
# ---------------------------------------------------------------------------


def warc_roundtrip_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize every document as a WARC response record — body
    transfer-coded by ``doc_id % 3`` (identity / Content-Encoding:
    gzip / Transfer-Encoding: chunked) — then parse the concatenated
    stream back with `io/warc.iter_warc_records` +
    `split_http_response` and emit the decoded fields. The oracle is
    the identity: parsing must undo exactly what serialization did,
    including the encodings (r7 ADVICE fix). Runs as one Arrow-batched
    ``mapInPandas`` — per-partition streams, no shuffle, no driver
    bytes."""
    from ..io.warc import iter_warc_records, split_http_response

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")

    def run(batches):
        import pandas as pd

        for b in batches:
            blob_parts = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                body = text.encode("utf-8")
                variant = int(doc_id) % 3
                extra = ""
                if variant == 1:
                    body = gzip.compress(body, mtime=0)
                    extra = "Content-Encoding: gzip\r\n"
                elif variant == 2:
                    # a zero-size chunk TERMINATES a chunked body, so
                    # only emit non-empty chunks (review-caught: a
                    # 1-byte text would have framed '0\\r\\n…' and the
                    # parsed body would drop the byte)
                    half = len(body) // 2
                    chunks = [c for c in (body[:half], body[half:]) if c]
                    body = (
                        b"".join(
                            f"{len(c):x}".encode() + b"\r\n" + c + b"\r\n"
                            for c in chunks
                        )
                        + b"0\r\n\r\n"
                    )
                    extra = "Transfer-Encoding: chunked\r\n"
                payload = (
                    "HTTP/1.1 200 OK\r\n"
                    "Content-Type: text/plain; charset=utf-8\r\n"
                    f"{extra}\r\n"
                ).encode() + body
                blob_parts.append(
                    b"\r\n".join(
                        [
                            b"WARC/1.0",
                            b"WARC-Type: response",
                            f"WARC-Record-ID: <urn:uuid:{doc_id}>".encode(),
                            b"WARC-Date: 2024-01-02T03:04:05Z",
                            f"WARC-Target-URI: http://t/{doc_id}".encode(),
                            b"Content-Type: application/http; msgtype=response",
                            f"Content-Length: {len(payload)}".encode(),
                        ]
                    )
                    + b"\r\n\r\n" + payload + b"\r\n\r\n"
                )
            out = {"doc_id": [], "warc_type": [], "http_status": [],
                   "content_type": [], "body_text": []}
            for headers, payload in iter_warc_records(b"".join(blob_parts)):
                status, ctype, body = split_http_response(payload)
                out["doc_id"].append(
                    int(headers["warc-target-uri"].rsplit("/", 1)[1])
                )
                out["warc_type"].append(headers["warc-type"])
                out["http_status"].append(status)
                out["content_type"].append(ctype)
                out["body_text"].append(body.decode("utf-8"))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        run,
        schema="doc_id long, warc_type string, http_status int, "
               "content_type string, body_text string",
    )


WARC_ROUNDTRIP_SQL = """
SELECT doc_id, 'response' AS warc_type, 200 AS http_status,
       'text/plain; charset=utf-8' AS content_type, text AS body_text
FROM documents
"""

# ---------------------------------------------------------------------------
# html_extract_text — llm/html_extract.py parser tier over synthesized
# pages; expected text is closed-form (paragraph join + skip scopes).
# ---------------------------------------------------------------------------

_HTML_PAGE_SQL = (
    "'<html><head><title>D' || doc_id || '</title>"
    "<script>var x = 1 < 2;</script></head><body>"
    "<!-- comment --><p>' || text || '</p><p>tail ' || doc_id || "
    "'</p></body></html>'"
)


def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful HTML→text extraction (title from inside the <head> skip
    scope, script/comment subtrees dropped, paragraph breaks between
    <p> blocks, link_char_frac exact 0.0 with no anchors)."""
    docs = load_table(spark, "documents", sf_dir)
    pages = docs.select("doc_id", F.expr(_HTML_PAGE_SQL).alias("html"))
    return extract_text_df(pages)


HTML_EXTRACT_SQL = """
SELECT doc_id,
       'D' || doc_id AS title,
       text || chr(10) || chr(10) || 'tail ' || doc_id AS text,
       CAST(0.0 AS DOUBLE) AS link_char_frac
FROM documents
"""

# ---------------------------------------------------------------------------
# quality_signals / gopher_quality_flags — llm/quality_rules.py over the
# documents table; the signals twin ships with the module, the flags
# twin is built here from the same thresholds dict.
# ---------------------------------------------------------------------------

#: threshold override for the flags query: the synthetic corpus has few
#: of Gopher's English stopwords, so the stock min of 2 would fail the
#: verdict almost uniformly; 1 yields a real pass/fail mix (vacuity
#: guard: tests/test_curation_queries.py asserts both verdicts occur).
_FLAG_THRESHOLDS = {"min_stopwords_present": 1}


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_flags(spark, sf_dir, _FLAG_THRESHOLDS)


def _gopher_flags_sql() -> str:
    t = dict(GOPHER_THRESHOLDS)
    t.update(_FLAG_THRESHOLDS)
    rules = {
        "ok_words": f"n_words >= {t['min_words']} AND n_words <= {t['max_words']}",
        "ok_mean_word_len": (
            f"mean_word_len >= {t['min_mean_word_len']} AND "
            f"mean_word_len <= {t['max_mean_word_len']}"
        ),
        "ok_symbols": f"symbol_word_ratio <= {t['max_symbol_word_ratio']}",
        "ok_bullets": f"bullet_line_frac <= {t['max_bullet_line_frac']}",
        "ok_ellipsis": f"ellipsis_line_frac <= {t['max_ellipsis_line_frac']}",
        "ok_alpha": f"alpha_word_frac >= {t['min_alpha_word_frac']}",
        "ok_stopwords": f"stopwords_present >= {t['min_stopwords_present']}",
        "ok_dup_lines": (
            f"dup_line_frac <= {t['max_dup_line_frac']} AND "
            f"dup_line_char_frac <= {t['max_dup_line_char_frac']}"
        ),
        "ok_dup_paras": (
            f"dup_para_frac <= {t['max_dup_para_frac']} AND "
            f"dup_para_char_frac <= {t['max_dup_para_char_frac']}"
        ),
    }
    flag_cols = ",\n       ".join(
        f"COALESCE({cond}, FALSE) AS {name}" for name, cond in rules.items()
    )
    verdict = " AND ".join(f"COALESCE({c}, FALSE)" for c in rules.values())
    return (
        f"WITH s AS ({quality_signals_sql('documents')})\n"
        f"SELECT s.*,\n       {flag_cols},\n"
        f"       ({verdict}) AS passes_gopher\nFROM s"
    )


# ---------------------------------------------------------------------------
# url_canonicalize / url_domain_caps — llm/url_ops.py over URLs derived
# from doc_id (shared SQL construction; the oracle recomputes every
# part from the same arithmetic, never by parsing).
# ---------------------------------------------------------------------------

_URL_SQL = (
    "'HTTP://WWW.Site' || (doc_id % 7) || "
    "CASE WHEN doc_id % 3 = 0 THEN '.CO.UK' ELSE '.COM' END || "
    "'/Path/' || doc_id || "
    "CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/' "
    "WHEN 2 THEN '?utm_source=x&b=2&a=1' "
    "ELSE '?id=' || doc_id || '&utm_campaign=y' END"
)


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parse + C4-style canonicalization: lowercased scheme/host,
    eTLD+1 via the multipart-suffix heuristic, trailing-slash collapse,
    tracking params dropped, surviving params sorted."""
    docs = load_table(spark, "documents", sf_dir)
    urls = docs.select("doc_id", F.expr(_URL_SQL).alias("url"))
    return url_parts_df(urls).withColumn(
        "canonical_url", normalize_url_expr(F.col("url"))
    )


URL_CANONICALIZE_SQL = f"""
WITH u AS (
  SELECT doc_id, {_URL_SQL} AS url,
         'www.site' || (doc_id % 7) ||
           CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END AS host_lc,
         'site' || (doc_id % 7) ||
           CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END AS reg_dom,
         '/Path/' || doc_id ||
           CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END AS path,
         CASE doc_id % 4 WHEN 2 THEN 'utm_source=x&b=2&a=1'
                         WHEN 3 THEN 'id=' || doc_id || '&utm_campaign=y'
                         END AS query,
         CASE doc_id % 4 WHEN 2 THEN '?a=1&b=2'
                         WHEN 3 THEN '?id=' || doc_id
                         ELSE '' END AS canon_q
  FROM documents
)
SELECT doc_id, url, 'http' AS protocol, host_lc AS host,
       reg_dom AS registered_domain, path, query,
       'http://' || host_lc || '/Path/' || doc_id || canon_q AS canonical_url
FROM u
"""

_CAP_URL_SQL = "'http://sub.domain' || (doc_id % 7) || '.com/p/' || doc_id"
_CAP_K = 10


def url_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain crawl cap: at most K pages per eTLD+1,
    deterministically the lowest doc_ids (one shuffle on the domain
    key, never a global sort)."""
    docs = load_table(spark, "documents", sf_dir)
    urls = docs.select("doc_id", F.expr(_CAP_URL_SQL).alias("url"))
    return cap_per_domain(urls, _CAP_K)


URL_DOMAIN_CAPS_SQL = f"""
SELECT doc_id, {_CAP_URL_SQL} AS url
FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY 'domain' || (doc_id % 7) || '.com' ORDER BY doc_id
) <= {_CAP_K}
"""

# ---------------------------------------------------------------------------
# robots_wildcard_rules — llm/robots.py group fold + the r8 conservative
# wildcard reduction, over robots.txt bodies derived from doc_id.
# ---------------------------------------------------------------------------

_ROBOTS_TXT_SQL = (
    "CASE doc_id % 4 "
    "WHEN 0 THEN 'User-agent: *' || chr(10) || 'Disallow: /p/' || doc_id "
    "|| chr(10) || 'Disallow: /q/' || doc_id || ' # inline comment' "
    "WHEN 1 THEN 'User-agent: specialbot' || chr(10) || 'User-agent: *' "
    "|| chr(10) || 'Disallow: /w/' || doc_id || '/*?session' "
    "WHEN 2 THEN 'User-agent: otherbot' || chr(10) || 'Disallow: /x/' || doc_id "
    "ELSE 'User-agent: *' || chr(10) || 'Disallow: /e/' || doc_id || '$' "
    "|| chr(10) || 'Disallow:' END"
)


def robots_wildcard_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``*``-applicable Disallow prefixes per synthesized robots.txt:
    multi-agent groups, comments, empty values, and RFC 9309 wildcard /
    end-anchor reduction to conservative prefixes."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.posexplode(parse_robots_expr(F.expr(_ROBOTS_TXT_SQL))).alias(
            "rule_pos", "disallow_prefix"
        ),
    )


ROBOTS_WILDCARD_SQL = """
SELECT doc_id, 0 AS rule_pos, '/p/' || doc_id AS disallow_prefix
FROM documents WHERE doc_id % 4 = 0
UNION ALL
SELECT doc_id, 1, '/q/' || doc_id FROM documents WHERE doc_id % 4 = 0
UNION ALL
SELECT doc_id, 0, '/w/' || doc_id || '/' FROM documents WHERE doc_id % 4 = 1
UNION ALL
SELECT doc_id, 0, '/e/' || doc_id FROM documents WHERE doc_id % 4 = 3
"""

# ---------------------------------------------------------------------------
# unicode_clean_text — llm/textnorm.py JVM cleanup tier over decorated
# text; the oracle is the closed-form survivor string.
# ---------------------------------------------------------------------------

#: decorations exercise: NBSP→space, zero-width removal, tab-run
#: squeeze, U+2028→newline, space-around-newline strip, edge trim.
_DECOR_PREFIX = "\u00a0 "  # NBSP + space -> single space, trimmed
_DECOR_MID = " \u200b\t\tend "  # ZWSP vanishes, space+tab run squeezes
_DECOR_SUFFIX = "\u2028 tail\u200d "  # LINE SEP -> newline, ZWJ vanishes


def unicode_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    decorated = docs.select(
        "doc_id",
        F.concat(
            F.lit(_DECOR_PREFIX), F.col("text"),
            F.lit(_DECOR_MID), F.lit(_DECOR_SUFFIX),
        ).alias("text"),
    )
    return clean_text_df(decorated)


UNICODE_CLEAN_SQL = """
SELECT doc_id, text || ' end' || chr(10) || 'tail' AS text
FROM documents
"""

# ---------------------------------------------------------------------------
# line_dedup_global / span_dedup_c4 — llm/linedup.py over multi-line
# texts built from doc_id groups (boilerplate shared within a group,
# one unique middle line per doc).
# ---------------------------------------------------------------------------

_MULTILINE_SQL = (
    "CASE WHEN doc_id % 101 = 0 THEN "
    "'share-' || (doc_id % 7) || chr(10) || 'global footer line' "
    "WHEN doc_id % 97 = 0 THEN "
    "'share-only-' || doc_id || chr(10) || 'doc ' || doc_id || ' ' || text "
    "|| chr(10) || 'global footer line' "
    "ELSE 'share-' || (doc_id % 7) || chr(10) || 'doc ' || doc_id || ' ' "
    "|| text || chr(10) || 'global footer line' END"
)


def line_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb global line dedup: lines occurring in ≥2
    distinct documents are removed everywhere; documents rebuilt in
    order; all-boilerplate documents survive with empty text. The
    anti-join strategy is the r8 adaptive default."""
    docs = load_table(spark, "documents", sf_dir)
    multi = docs.select("doc_id", F.expr(_MULTILINE_SQL).alias("text"))
    return remove_global_duplicate_units(multi, "line", 2)


LINE_DEDUP_GLOBAL_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 101 = 0 THEN ''
            WHEN doc_id % 97 = 0 THEN 'share-only-' || doc_id || chr(10)
                 || 'doc ' || doc_id || ' ' || text
            ELSE 'doc ' || doc_id || ' ' || text END AS text
FROM documents
"""

_SPAN_LINES_SQL = (
    "'A-' || (doc_id % 5) || chr(10) || 'B-' || (doc_id % 5) || chr(10) || "
    "'doc ' || doc_id || ' ' || text || chr(10) || "
    "'C-' || (doc_id % 5) || chr(10) || 'D-' || (doc_id % 5)"
)


def span_dedup_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 span dedup (2-line spans, line units): every duplicated
    window keeps only its smallest-(doc_id, pos) occurrence; each
    group's lowest doc_id therefore keeps all five lines and every
    other member loses the shared head/tail pairs, keeping its unique
    middle line."""
    docs = load_table(spark, "documents", sf_dir)
    multi = docs.select("doc_id", F.expr(_SPAN_LINES_SQL).alias("text"))
    return remove_duplicate_spans(multi, span=2, unit="line")


SPAN_DEDUP_SQL = f"""
SELECT doc_id,
       CASE WHEN doc_id < 5 THEN {_SPAN_LINES_SQL}
            ELSE 'doc ' || doc_id || ' ' || text END AS text
FROM documents
"""

# ---------------------------------------------------------------------------
# charlm_gram_counts / charlm_scoring_stats — llm/lm_score.py exact
# integer surfaces: the trained gram/context table and the per-document
# scoring-join sufficient statistics (the float log-space scores keep
# their 1e-9 pytest oracle; everything certified here is exact).
# ---------------------------------------------------------------------------

_LM_N = 3


def charlm_gram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    lm = train_char_lm(docs, n=_LM_N)
    return lm.grams.select("gram", "cnt", "ctx_total")


#: scored docs with odd ids get a digit-bearing prefix — digits never
#: occur in the training text, so the model-miss (unseen-gram) path is
#: guaranteed non-vacuous (the synthetic corpus shares one alphabetic
#: vocabulary across languages, so raw cross-language scoring alone
#: would see every gram).
_SCORED_TEXT_SQL = (
    "CASE WHEN doc_id % 2 = 1 THEN 'Q#' || doc_id || ': ' || text "
    "ELSE text END"
)


def charlm_scoring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-join statistics of every document against a model trained
    on the English slice only: total grams, grams seen by the model,
    and the exact integer sums of the matched (cnt, ctx_total) pairs —
    the sufficient statistics the smoothed log-probability is computed
    from. Model side is dimension-sized and broadcast."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "text"
    )
    lm = train_char_lm(docs.filter(F.col("lang") == "en"), n=_LM_N)
    scored = docs.select(
        "doc_id", F.expr(_SCORED_TEXT_SQL).alias("text")
    )
    doc_grams = scored.select(
        "doc_id", F.explode(_char_ngrams("text", _LM_N)).alias("gram")
    )
    joined = doc_grams.join(F.broadcast(lm.grams), "gram", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("cnt").alias("n_seen"),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("sum_cnt"),
        F.coalesce(F.sum("ctx_total"), F.lit(0)).alias("sum_ctx"),
    )


CHARLM_SCORING_SQL = f"""
WITH endocs AS (SELECT * FROM documents WHERE lang = 'en'),
model AS ({train_counts_sql("endocs", _LM_N)}),
scored AS (
  SELECT doc_id, {_SCORED_TEXT_SQL} AS text FROM documents
),
doc_grams AS (
  SELECT doc_id, unnest(
    list_transform(range(1, length(text) - {_LM_N - 2}),
                   i -> substr(text, i, {_LM_N}))
  ) AS gram
  FROM scored
  WHERE length(text) >= {_LM_N}
)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       COUNT(m.gram) AS n_seen,
       CAST(COALESCE(SUM(m.cnt), 0) AS BIGINT) AS sum_cnt,
       CAST(COALESCE(SUM(m.ctx_total), 0) AS BIGINT) AS sum_ctx
FROM doc_grams g LEFT JOIN model m ON g.gram = m.gram
GROUP BY g.doc_id
"""

# ---------------------------------------------------------------------------
# curation_funnel_counts — llm/curate.py end to end: a crawl synthesized
# from the documents table (URL duplicates via tracking params with
# identical content, exact content duplicates across hosts, a blocked
# domain) runs the full funnel; the oracle recomputes every stage's
# row count from closed-form doc_id set algebra + the quality-signals
# twin over the surviving texts.
# ---------------------------------------------------------------------------

#: content anchor: doc_id%8==7 pages carry their predecessor's content
#: (exact-dup pair); doc_id%10==3 pages are a re-fetch of their
#: predecessor's URL with a tracking param, so they carry that
#: predecessor's content too (whichever member survives URL dedup, the
#: downstream text is the same — this is what makes the stage counts
#: independent of the xxhash64 row ids the funnel assigns).
_CONTENT_ANCHOR_SQL = (
    "CASE WHEN doc_id % 10 = 3 THEN "
    "  CASE WHEN (doc_id - 1) % 8 = 7 THEN doc_id - 2 ELSE doc_id - 1 END "
    "WHEN doc_id % 8 = 7 THEN doc_id - 1 ELSE doc_id END"
)
_URL_ANCHOR_SQL = "CASE WHEN doc_id % 10 = 3 THEN doc_id - 1 ELSE doc_id END"
_FUNNEL_THRESHOLDS = {"min_stopwords_present": 0}


def _funnel_record(doc_id: int, url: str, title: str, body_text: str) -> bytes:
    body = (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{body_text}</p></body></html>"
    ).encode("utf-8")
    payload = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
    ).encode() + body
    return (
        b"\r\n".join(
            [
                b"WARC/1.0",
                b"WARC-Type: response",
                f"WARC-Record-ID: <urn:uuid:f-{doc_id}>".encode(),
                b"WARC-Date: 2024-01-02T03:04:05Z",
                f"WARC-Target-URI: {url}".encode(),
                b"Content-Type: application/http; msgtype=response",
                f"Content-Length: {len(payload)}".encode(),
            ]
        )
        + b"\r\n\r\n" + payload + b"\r\n\r\n"
    )


def curation_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full funnel attrition report (stage, n_rows). The crawl is
    written once to a temp dir (bounded: the documents table is
    dimension-sized at correctness SFs; the funnel itself never
    collects) and every stage count comes from the real
    `curation_stages` graph (one-pass form — the counts are carried
    conditional aggregates over the same shared stage predicates)."""
    from .curate import funnel_counts_onepass

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    rows = {int(r["doc_id"]): r["text"] for r in docs.collect()}

    def content_anchor(i: int) -> int:
        if i % 10 == 3:
            j = i - 1
            return j - 1 if j % 8 == 7 else j
        return i - 1 if i % 8 == 7 else i

    d = tempfile.mkdtemp(prefix="funnel_query_")
    recs = []
    for i in sorted(rows):
        if i % 10 == 4:
            url = f"http://spam.example/p{i}"
        else:
            a = i - 1 if i % 10 == 3 else i
            url = f"http://site{a % 5}.com/p{a}"
            if i % 10 == 3:
                url += "?utm_source=feed"
        recs.append(
            _funnel_record(i, url, f"D{i}", rows[content_anchor(i)])
        )
    with open(os.path.join(d, "crawl.warc.gz"), "wb") as fh:
        fh.write(b"".join(gzip.compress(r) for r in recs))

    # r15 (guide §2.3/§5.2, VERDICT r14 item 2): ONE conditional-
    # aggregate job computes every stage count — the r14 shape fired one
    # action per stage and persisted the corpus-sized parsed crawl to
    # cap the re-parses at two; the one-pass parses the crawl exactly
    # once, persists nothing, and its dict is pinned equal to
    # funnel_counts(curation_stages(...)) by tests/test_funnel_onepass.py.
    counts = funnel_counts_onepass(
        spark,
        d,
        blocked_domains=["spam.example"],
        quality_thresholds=_FUNNEL_THRESHOLDS,
    )
    return local_df(
        spark, [(k, v) for k, v in counts.items()], "stage string, n_rows long"
    )


def _funnel_counts_sql() -> str:
    gate = _gopher_flags_sql_for_funnel()
    return f"""
WITH unblocked AS (
  SELECT doc_id, {_URL_ANCHOR_SQL} AS url_anchor,
         {_CONTENT_ANCHOR_SQL} AS content_anchor
  FROM documents WHERE doc_id % 10 != 4
),
n_unblocked AS (SELECT COUNT(*) AS n FROM unblocked),
n_urls AS (SELECT COUNT(DISTINCT url_anchor) AS n FROM unblocked),
survivor_texts AS (
  -- group by the TEXT, not the anchor id: distinct anchors can carry
  -- identical texts (the documents generator repeats a few at larger
  -- SFs — 8 collisions at sf0.1), and the funnel's exact dedup folds
  -- BY CONTENT; the representative doc_id is only a join key and the
  -- colliding texts are identical, so the gate outcome is
  -- representative-independent
  SELECT d.text, MIN(u.content_anchor) AS doc_id
  FROM unblocked u JOIN documents d ON d.doc_id = u.content_anchor
  GROUP BY d.text
),
n_texts AS (SELECT COUNT(*) AS n FROM survivor_texts),
survivors AS (
  SELECT doc_id, text FROM survivor_texts
),
n_final AS (SELECT COUNT(*) AS n FROM ({gate}) WHERE passes_gopher)
SELECT 'records' AS stage, (SELECT COUNT(*) FROM documents) AS n_rows
UNION ALL SELECT 'pages', (SELECT COUNT(*) FROM documents)
UNION ALL SELECT 'unblocked', (SELECT n FROM n_unblocked)
UNION ALL SELECT 'url_deduped', (SELECT n FROM n_urls)
UNION ALL SELECT 'capped', (SELECT n FROM n_urls)
UNION ALL SELECT 'extracted', (SELECT n FROM n_urls)
UNION ALL SELECT 'content_like', (SELECT n FROM n_urls)
UNION ALL SELECT 'normalized', (SELECT n FROM n_urls)
UNION ALL SELECT 'exact_deduped', (SELECT n FROM n_texts)
UNION ALL SELECT 'line_deduped', (SELECT n FROM n_texts)
UNION ALL SELECT 'final', (SELECT n FROM n_final)
"""


def _gopher_flags_sql_for_funnel() -> str:
    """passes_gopher over the ``survivors`` CTE with the funnel's
    threshold overrides."""
    t = dict(GOPHER_THRESHOLDS)
    t.update(_FUNNEL_THRESHOLDS)
    sig = quality_signals_sql("survivors")
    conds = " AND ".join(
        f"COALESCE({c}, FALSE)"
        for c in (
            f"n_words >= {t['min_words']} AND n_words <= {t['max_words']}",
            f"mean_word_len >= {t['min_mean_word_len']} AND "
            f"mean_word_len <= {t['max_mean_word_len']}",
            f"symbol_word_ratio <= {t['max_symbol_word_ratio']}",
            f"bullet_line_frac <= {t['max_bullet_line_frac']}",
            f"ellipsis_line_frac <= {t['max_ellipsis_line_frac']}",
            f"alpha_word_frac >= {t['min_alpha_word_frac']}",
            f"stopwords_present >= {t['min_stopwords_present']}",
            f"dup_line_frac <= {t['max_dup_line_frac']} AND "
            f"dup_line_char_frac <= {t['max_dup_line_char_frac']}",
            f"dup_para_frac <= {t['max_dup_para_frac']} AND "
            f"dup_para_char_frac <= {t['max_dup_para_char_frac']}",
        )
    )
    return f"SELECT doc_id, ({conds}) AS passes_gopher FROM ({sig})"


# ---------------------------------------------------------------------------
# training_export_layout — llm/export.py with n_shards=1 so every
# assignment is DuckDB-expressible (the multi-shard xxhash64 assignment
# keeps its pytest model; splits/packing/bins are certified here).
# ---------------------------------------------------------------------------

_SEQ_LEN = 64
_KNUTH = 2654435761


def training_export_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return training_layout(docs, n_shards=1, seq_len=_SEQ_LEN).select(
        "doc_id", "split", "shard", "n_tokens", "tok_start",
        "first_bin", "last_bin",
    )


TRAINING_EXPORT_SQL = f"""
WITH base AS (
  -- doc_id reduced mod 100 BEFORE the multiply (r8 ADVICE), mirroring
  -- export.training_layout: the raw product overflows DuckDB's strict
  -- int64 for full-range xxhash64 ids
  SELECT doc_id,
         CASE WHEN ((doc_id % 100 + 100) % 100) * {_KNUTH} % 100 < 90
                THEN 'train'
              WHEN ((doc_id % 100 + 100) % 100) * {_KNUTH} % 100 < 95
                THEN 'val'
              ELSE 'test' END AS split,
         CAST(0 AS INT) AS shard,
         -- explicit class, not \\s+: RE2's \\s excludes \\x0B while the
         -- Spark side's Java \\s includes it (ONE definition: porthash.WS_CLASS)
         CAST(len(list_filter(regexp_split_to_array(text,
                                '{_WS}'),
                              w -> w != '')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT *, SUM(n_tokens) OVER (
    PARTITION BY split, shard ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS tok_end
  FROM base
)
SELECT doc_id, split, shard, n_tokens,
       CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
       CAST((tok_end - n_tokens) // {_SEQ_LEN} AS BIGINT) AS first_bin,
       CAST((tok_end - 1) // {_SEQ_LEN} AS BIGINT) AS last_bin
FROM cum
"""


QUERIES = {
    "warc_roundtrip_parse": warc_roundtrip_parse,
    "html_extract_text": html_extract_text,
    "quality_signals": quality_signals,
    "gopher_quality_flags": gopher_quality_flags,
    "url_canonicalize": url_canonicalize,
    "url_domain_caps": url_domain_caps,
    "robots_wildcard_rules": robots_wildcard_rules,
    "unicode_clean_text": unicode_clean_text,
    "line_dedup_global": line_dedup_global,
    "span_dedup_c4": span_dedup_c4,
    "charlm_gram_counts": charlm_gram_counts,
    "charlm_scoring_stats": charlm_scoring_stats,
    "curation_funnel_counts": curation_funnel_counts,
    "training_export_layout": training_export_layout,
}

ORACLES = {
    "warc_roundtrip_parse": WARC_ROUNDTRIP_SQL,
    "html_extract_text": HTML_EXTRACT_SQL,
    "quality_signals": quality_signals_sql("documents"),
    "gopher_quality_flags": _gopher_flags_sql(),
    "url_canonicalize": URL_CANONICALIZE_SQL,
    "url_domain_caps": URL_DOMAIN_CAPS_SQL,
    "robots_wildcard_rules": ROBOTS_WILDCARD_SQL,
    "unicode_clean_text": UNICODE_CLEAN_SQL,
    "line_dedup_global": LINE_DEDUP_GLOBAL_SQL,
    "span_dedup_c4": SPAN_DEDUP_SQL,
    "charlm_gram_counts": train_counts_sql("documents", _LM_N),
    "charlm_scoring_stats": CHARLM_SCORING_SQL,
    "curation_funnel_counts": _funnel_counts_sql(),
    "training_export_layout": TRAINING_EXPORT_SQL,
}
