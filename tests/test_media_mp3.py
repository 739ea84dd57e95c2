"""MP3 frame-walk metadata decode (llm/media_mp3.py, r7).

Writer/decoder share no parsing code; every feature is predicted in
closed form from the synthesis parameters (the codec differential
discipline of tests/test_multimodal_codec.py)."""

from __future__ import annotations

import pytest

from ir_analyses_spark.llm import multimodal
from ir_analyses_spark.llm.media_mp3 import (
    decode_mp3_meta,
    encode_mp3_frames,
    looks_like_mp3,
)
from ir_analyses_spark.llm.media_mp4 import decode_media_full


def test_cbr_stream_roundtrip():
    content = encode_mp3_frames([128] * 7, 44100, seed=3)
    got = decode_mp3_meta(content)
    assert got["media_kind"] == "mp3"
    assert got["sample_rate"] == 44100
    assert got["n_samples"] == 7 * 1152
    assert got["peak"] == 128
    assert got["width"] is None and got["sum_abs"] is None


def test_vbr_stream_walks_every_frame_for_true_peak():
    """peak must come from walking ALL frames, not the first header."""
    content = encode_mp3_frames([64, 320, 96], 32000)
    got = decode_mp3_meta(content)
    assert got["n_samples"] == 3 * 1152
    assert got["peak"] == 320  # mid-stream frame, not the first
    assert got["sample_rate"] == 32000


def test_id3v2_tag_skipped():
    bare = encode_mp3_frames([192] * 4, 48000)
    tagged = encode_mp3_frames([192] * 4, 48000, id3_payload=b"T" * 300)
    assert tagged[:3] == b"ID3" and looks_like_mp3(tagged)
    assert decode_mp3_meta(tagged) == decode_mp3_meta(bare)


def test_corrupt_streams_raise_loudly():
    content = encode_mp3_frames([128] * 3, 44100)
    with pytest.raises(ValueError, match="truncated MP3"):
        decode_mp3_meta(content[:-10])  # truncated final frame
    broken = bytearray(content)
    frame_len = 144 * 128 * 1000 // 44100
    broken[frame_len] = 0x00  # kill the second frame's sync byte
    with pytest.raises(ValueError, match="lost MP3 frame sync"):
        decode_mp3_meta(bytes(broken))
    # MPEG-2 version bits: honest gate, not a wrong-stride count
    mpeg2 = bytearray(content)
    mpeg2[1] = 0xF3  # version bits 10 (MPEG-2), layer III
    with pytest.raises(ValueError, match="only MPEG-1 Layer III"):
        decode_mp3_meta(bytes(mpeg2))
    with pytest.raises(ValueError, match="nothing after the ID3v2 tag"):
        decode_mp3_meta(encode_mp3_frames([], 44100, id3_payload=b"x"))


def test_mid_stream_rate_change_rejected():
    a = encode_mp3_frames([128], 44100)
    b = encode_mp3_frames([128], 48000)
    with pytest.raises(ValueError, match="sample rate changes"):
        decode_mp3_meta(a + b)


def test_dispatch_extends_certified_decoder():
    """decode_media refuses MP3 (NotImplementedError); the extended
    dispatcher claims exactly those payloads and no certified one."""
    content = encode_mp3_frames([128] * 2, 44100)
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(content)
    assert decode_media_full(content)["media_kind"] == "mp3"
    # certified formats keep routing to the certified decoders
    for doc_id in range(6):
        payload = multimodal.synthesize_media(doc_id, 50)
        assert not looks_like_mp3(payload)


def test_spark_pipeline_oracle_predicted(spark):
    """Arrow-batched decode over synthesized MP3 payloads on the real
    documents table, every row predicted in closed form from (doc_id, n)
    without parsing a byte."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ir_analyses_spark.llm.media_mp4 import media_sampled_features

    RATES = (44100, 48000, 32000)
    KBPS = (64, 96, 128, 192, 320)

    def synth(doc_id: int, n: int) -> bytes:
        frames = [KBPS[(doc_id + i) % 5] for i in range(n % 9 + 1)]
        return encode_mp3_frames(
            frames, RATES[doc_id % 3],
            id3_payload=(b"p" * (doc_id % 40) if doc_id % 2 else None),
            seed=doc_id,
        )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n"))
        .limit(90)
    )

    def gen(it):
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "content": [
                    synth(int(d), int(n))
                    for d, n in zip(pdf["doc_id"], pdf["n"])
                ],
            })

    payload = docs.mapInPandas(gen, "doc_id bigint, content binary")
    got = {r["doc_id"]: r.asDict()
           for r in media_sampled_features(payload).collect()}
    base = {int(r["doc_id"]): int(r["n"]) for r in docs.collect()}
    assert len(got) == len(base) > 0
    for doc_id, n in base.items():
        n_frames = n % 9 + 1
        row = got[doc_id]
        assert row["media_kind"] == "mp3"
        assert row["sample_rate"] == RATES[doc_id % 3]
        assert row["n_samples"] == n_frames * 1152
        assert row["peak"] == max(KBPS[(doc_id + i) % 5] for i in range(n_frames))


def test_trailing_id3v1_tag_tolerated():
    """Real files ubiquitously end with a 128-byte ID3v1 'TAG' trailer —
    metadata, not a lost sync; anything else trailing still raises."""
    bare = encode_mp3_frames([128] * 3, 44100)
    tagged = bare + b"TAG" + b"\x00" * 125
    assert decode_mp3_meta(tagged) == decode_mp3_meta(bare)
    with pytest.raises(ValueError, match="lost MP3 frame sync"):
        decode_mp3_meta(bare + b"TAG" + b"\x00" * 60)  # not 128 bytes
