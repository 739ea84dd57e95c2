"""HTML→text extraction (llm/html_extract.py): hand-computed expected
text for the parser tier, DuckDB parity for the JVM fast path, and the
e2e chain into the quality-rule suite."""

from __future__ import annotations

import pandas as pd
import pytest

from ir_analyses_spark.llm.html_extract import (
    extract_text_df,
    html_to_text,
    strip_tags_df,
    strip_tags_sql,
)
from ir_analyses_spark.llm.quality_rules import quality_signals_df

HTML_DOCS = [
    (
        0,
        "<html><head><title>My Page</title><style>body{color:red}</style></head>"
        "<body><h1>Header One</h1><p>First paragraph with <b>bold</b> text "
        "&amp; entities like &lt;tag&gt;.</p>"
        "<script>var x = '<p>not text</p>';</script>"
        "<ul><li>item one</li><li>item two</li></ul>"
        "<p>Visit <a href='x'>this link</a> now.</p><!-- comment --></body></html>",
    ),
    (1, ""),
    (2, "plain text no tags at all"),
    (3, "<p>unclosed paragraph <div>nested <span>span</span"),
    (4, "<a href='a'>all</a> <a href='b'>link</a> <a>text</a>"),
    (5, "<P>UPPERCASE TAGS</P><BR>line<STYLE>x{}</STYLE>done"),
    (6, "&amp;lt; stays literal &#8212; em dash &hearts;"),
]

EXPECTED_TEXT = {
    0: (
        "Header One\n\nFirst paragraph with bold text & entities like <tag>."
        "\n\nitem one\nitem two\n\nVisit this link now."
    ),
    1: "",
    2: "plain text no tags at all",
    # stdlib behavior: close() flushes the trailing incomplete tag as data
    3: "unclosed paragraph\n\nnested span</span",
    4: "all link text",
    5: "UPPERCASE TAGS\n\nlinedone",
    6: "&lt; stays literal — em dash ♥",
}


@pytest.fixture(scope="module")
def html_spark(spark):
    return spark.createDataFrame(HTML_DOCS, "doc_id long, html string")


def test_pure_python_extractor_expected_text():
    for doc_id, html in HTML_DOCS:
        title, text, frac = html_to_text(html)
        assert text == EXPECTED_TEXT[doc_id], (doc_id, text)
    assert html_to_text(HTML_DOCS[0][1])[0] == "My Page"
    assert html_to_text("")[0] is None


def test_extract_text_df_matches_pure_python(html_spark):
    rows = {r["doc_id"]: r for r in extract_text_df(html_spark).collect()}
    assert set(rows) == {d for d, _ in HTML_DOCS}
    for doc_id, html in HTML_DOCS:
        title, text, frac = html_to_text(html)
        r = rows[doc_id]
        assert r["text"] == text, doc_id
        assert r["title"] == title, doc_id
        if frac is None:
            assert r["link_char_frac"] is None, doc_id
        else:
            assert r["link_char_frac"] == frac, doc_id


def test_link_density_signal(html_spark):
    rows = {r["doc_id"]: r for r in extract_text_df(html_spark).collect()}
    assert rows[4]["link_char_frac"] == 1.0  # pure link farm
    assert rows[2]["link_char_frac"] == 0.0  # no anchors
    assert rows[1]["link_char_frac"] is None  # no text at all
    frac0 = rows[0]["link_char_frac"]
    assert 0.0 < frac0 < 0.25  # content page: links are a small minority


def test_strip_tags_matches_duckdb(html_spark):
    import duckdb

    from tests.compare import assert_matches_oracle

    con = duckdb.connect()
    con.register(
        "pages", pd.DataFrame(HTML_DOCS, columns=["doc_id", "html"])
    )
    assert_matches_oracle(
        strip_tags_df(html_spark),
        con,
        strip_tags_sql("pages"),
        name="strip_tags crafted",
    )


def test_strip_tags_semantics(html_spark):
    rows = {r["doc_id"]: r["text"] for r in strip_tags_df(html_spark).collect()}
    assert "not text" not in rows[0]  # script subtree gone
    assert "color:red" not in rows[0]  # style subtree gone
    assert "comment" not in rows[0]
    assert "& entities like <tag>." in rows[0]  # entities decoded
    assert rows[6].startswith("&lt; stays literal")  # &amp;lt; NOT double-decoded
    assert rows[2] == "plain text no tags at all"


def test_strip_tags_sql_rejects_bad_identifier():
    with pytest.raises(ValueError):
        strip_tags_sql("pages; DROP TABLE x")


def test_e2e_extract_then_quality(html_spark):
    """The curation chain: extract → quality signals on the extracted
    text, with the block structure feeding the line/paragraph rules."""
    extracted = extract_text_df(html_spark).select("doc_id", "text")
    sig = {r["doc_id"]: r for r in quality_signals_df(extracted).collect()}
    assert sig[0]["n_paras"] == 4
    assert sig[0]["n_lines"] == 5
    assert sig[0]["stopwords_present"] >= 1  # "with", "the"...
    assert sig[1]["n_words"] == 0


def test_anchor_inside_skip_subtree_does_not_close_outer_anchor():
    """</a> inside a skipped subtree (noscript/head/template) must not
    decrement the live anchor depth — linkB is still anchor text."""
    title, text, frac = html_to_text(
        "<a>linkA <noscript><a>hidden</a></noscript> linkB</a> plain"
    )
    # anchor chars: linkA(5) + linkB(5); total: + plain(5)
    assert frac == 10 / 15
    assert "hidden" not in text
