"""Multimodal columns (SURVEY §2B LLM ext): media as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side plumbing — binary payload column, metadata struct schema,
batch-iterator UDF signature, partition sizing — is real and tested. The
actual codec step (PIL/ffmpeg decode) is STUBBED: this container has no
image/audio libraries, so ``decode_media`` raises NotImplementedError unless
a decoder is importable, and ``fake_decode_features`` provides the
deterministic stand-in the tests and oracle use. Swapping the stub for a
real decoder changes one function body, no plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: schema of the feature rows produced by the decode step
MEDIA_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes bigint, head_hex string, "
    "fake_width int, fake_height int"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 bytes of text —
    in production: image/audio bytes from ``spark.read.format('binaryFile')``)
    plus a typed metadata struct."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def decode_media(content: bytes) -> dict:
    """Real decode hook — STUB. Raises unless an image codec is available.

    Reference pipeline position: where PIL.Image.open / soundfile.read /
    av.open would run, one payload at a time inside the batch loop.
    """
    try:
        import PIL.Image  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "no image codec in this environment; use fake_decode_features"
        ) from exc
    raise NotImplementedError("real decode not wired in this build")


def fake_decode_features(content: bytes) -> dict:
    """Deterministic stand-in for the codec: derives pseudo-dimensions from
    the payload bytes. Pure function of the bytes → reproducible anywhere."""
    n = len(content)
    return {
        "n_bytes": n,
        "head_hex": content[:8].hex(),
        "fake_width": (n % 640) + 1,
        "fake_height": ((n * 7) % 480) + 1,
    }


def extract_media_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    The iterator-of-batches signature is the scale-relevant part: one Python
    worker per partition, payload bytes cross the JVM↔Python boundary once
    per batch via Arrow, and output batches stream back without
    materializing the partition.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = [fake_decode_features(b) for b in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return with_payload.mapInPandas(batches, MEDIA_FEATURES_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents → binary payload → batched pseudo-decode.
    Oracle recomputes the same pure-function features in SQL, checking the
    Arrow round-trip end-to-end (byte lengths, head bytes, derived dims)."""
    docs = load_table(spark, "documents", sf_dir)
    return extract_media_features(attach_binary_payload(docs))


MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       LOWER(SUBSTRING(HEX(ENCODE(text)), 1, 16)) AS head_hex,
       CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS INT) AS fake_width,
       CAST((OCTET_LENGTH(ENCODE(text)) * 7) % 480 + 1 AS INT) AS fake_height
FROM documents
"""


QUERIES = {
    "multimodal_features": multimodal_features,
}

ORACLES = {
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
}
