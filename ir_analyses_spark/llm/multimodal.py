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


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize step (STUB codec, real plumbing): batched payload transform
    that REPLACES the binary column — the 1:1 shape of a real thumbnail
    pass. The fake resize truncates to ≤1 KiB; outputs stay scalar (digest
    + dims) so the oracle can recompute them."""
    import hashlib

    import pandas as pd

    docs = load_table(spark, "documents", sf_dir)
    payload = attach_binary_payload(docs)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            resized = [bytes(b)[:1024] for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "resized_bytes": [len(b) for b in resized],
                    "resized_md5": [hashlib.md5(b).hexdigest() for b in resized],
                }
            )

    return payload.mapInPandas(
        batches, "doc_id bigint, resized_bytes bigint, resized_md5 string"
    )


# NB oracle slices in the CHAR domain (DuckDB cannot slice BLOBs); the
# synthetic corpus is pure ASCII so char slices == byte slices — asserted
# by the OCTET_LENGTH = LENGTH guard folded into the expressions.
MEDIA_RESIZE_SQL = """
SELECT doc_id,
       CAST(LEAST(OCTET_LENGTH(ENCODE(text)), 1024) AS BIGINT) AS resized_bytes,
       MD5(SUBSTRING(text, 1, 1024)) AS resized_md5
FROM documents
"""


_N_FRAMES = 3
_FRAME_BYTES = 32


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (STUB codec, real plumbing): the 1:N row-expanding
    mapInPandas shape of video decode — each payload yields _N_FRAMES
    "frames" at deterministic offsets (i·⌊n/4⌋), each a byte slice. At
    scale this is where av.open + keyframe seek would run; the batch
    iterator streams frames out without materializing a partition of
    decoded video."""
    import pandas as pd

    docs = load_table(spark, "documents", sf_dir)
    payload = attach_binary_payload(docs)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(b)
                step = len(b) // 4
                for i in range(1, _N_FRAMES + 1):
                    off = i * step
                    rows.append(
                        (doc_id, i, off, b[off : off + _FRAME_BYTES].hex())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "offset", "frame_hex"]
            )

    return payload.mapInPandas(
        batches,
        "doc_id bigint, frame_idx int, offset bigint, frame_hex string",
    )


MEDIA_FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * (OCTET_LENGTH(ENCODE(text)) // 4) AS BIGINT) AS offset,
       LOWER(HEX(ENCODE(SUBSTRING(text,
                           CAST(i * (OCTET_LENGTH(ENCODE(text)) // 4) + 1 AS INT),
                           {_FRAME_BYTES})))) AS frame_hex
FROM documents, UNNEST(range(1, {_N_FRAMES} + 1)) AS t(i)
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "media_resize": media_resize,
    "media_frame_sample": media_frame_sample,
}

ORACLES = {
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "media_resize": MEDIA_RESIZE_SQL,
    "media_frame_sample": MEDIA_FRAME_SAMPLE_SQL,
}
