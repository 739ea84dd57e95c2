"""Streaming document curation (SURVEY §2B streaming × LLM ext): the
quality gate and exact dedup from the batch curation surface applied to
a document STREAM — the shape an always-on ingestion pipeline uses
(crawl batches land continuously; curation must not wait for a daily
batch job).

Composition only, and deliberately join-free: the Gopher gate is
`llm/quality_rules.gopher_flags_df` with ``keep`` passthrough — a pure
stacked projection + filter, streaming-safe by construction (a
projection needs no watermark; a self-join would). Dedup is
content-hash-keyed ``dropDuplicatesWithinWatermark``, bounding state by
the ingest-time watermark exactly like the certified event-stream dedup
(`streaming/pipeline.py` `dedup_within_watermark`) but keyed on the md5
digest so byte-identical re-crawls collapse while state stays
O(docs-per-watermark-window), independent of corpus size.

New module per the evidence-ledger rule (the certified streaming module
takes no edits). Verified by `tests/test_curate_stream.py` with the
repo's streaming oracle: a real readStream→writeStream run must equal
the identical batch transformation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..llm.quality_rules import gopher_flags_df

#: documents-with-ingest-time schema for file streams (declared, never
#: inferred — streaming sources require an explicit schema anyway).
DOC_STREAM_SCHEMA = "doc_id long, text string, ingest_ts timestamp"


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of (doc_id, text, ingest_ts) parquet."""
    return spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(path)


def quality_gate(
    docs: DataFrame,
    thresholds: dict | None = None,
    keep: tuple[str, ...] = ("text",),
) -> DataFrame:
    """(doc_id, *keep) for documents passing the Gopher gate — the same
    expression tree on a batch or a streaming frame, so stream/batch
    parity is structural, and the streaming plan needs no state at all.
    """
    return (
        gopher_flags_df(docs, thresholds, keep=keep)
        .filter("passes_gopher")
        .select("doc_id", *keep)
    )


def dedup_docs_within_watermark(
    docs: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Content-exact streaming dedup: md5(text) key, state bounded by
    the ingest-time watermark. Re-crawled identical bytes inside the
    window collapse to the first arrival; the text itself never enters
    the state store — only the 128-bit digest and the timestamp.

    On a batch frame (where Spark rejects the watermarked variant) the
    twin keeps the earliest (ingest_ts, doc_id) row per digest — the
    deterministic restatement of "first arrival"."""
    hashed = docs.withColumn("content_hash", F.md5("text"))
    if docs.isStreaming:
        return hashed.withWatermark(
            "ingest_ts", watermark
        ).dropDuplicatesWithinWatermark(["content_hash"])
    others = [c for c in hashed.columns if c != "content_hash"]
    ordered = ["ingest_ts", "doc_id"] + [
        c for c in others if c not in ("ingest_ts", "doc_id")
    ]
    return (
        hashed.groupBy("content_hash")
        .agg(F.min(F.struct(*ordered)).alias("r"))
        .select("content_hash", *[F.col(f"r.{c}").alias(c) for c in others])
        .select(*others, "content_hash")
    )


def curate_stream(
    docs: DataFrame,
    thresholds: dict | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """gate → dedup, streaming or batch. Output: (doc_id, text,
    ingest_ts, content_hash), one row per surviving document."""
    gated = quality_gate(docs, thresholds, keep=("text", "ingest_ts"))
    return dedup_docs_within_watermark(gated, watermark)


def classifier_gate(
    docs: DataFrame,
    model,
    min_prob: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Model-based reference-likeness gate on a STREAM (r8): MLlib
    transforms are stateless column expressions with the coefficient
    vector broadcast, so the `llm/quality_clf` gate is streaming-legal
    with zero state — the same expression tree on a batch frame, making
    stream/batch parity structural exactly like :func:`quality_gate`."""
    from ..llm.quality_clf import filter_by_quality

    return filter_by_quality(model, docs, min_prob=min_prob, text_col=text_col)
