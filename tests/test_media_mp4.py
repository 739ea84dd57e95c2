"""Full MP4 decode — audio-only + sample tables (llm/media_mp4.py, r7,
VERDICT r6 item 5).

Differential discipline mirrors tests/test_multimodal_codec.py: the
writer (encode_mp4_sampled) and decoder (decode_mp4_full) share no
parsing code, every fixture's features follow from (doc_id, n) integer
formulas, and the Spark path is oracle-predicted in closed form without
parsing a single byte."""

from __future__ import annotations

import struct

import pytest

from ir_analyses_spark.llm import multimodal
from ir_analyses_spark.llm.media_mp4 import (
    decode_media_full,
    decode_mp4_full,
    encode_mp4_sampled,
    media_sampled_features,
    synthesize_media_sampled,
)


def _expected(doc_id: int, n: int) -> dict:
    """Closed-form oracle: the synthesize_media_sampled formulas, never
    the decoder."""
    timescale = 600 * (doc_id % 5 + 1)
    audio_rate = 8000 + (doc_id % 7) * 1000
    n_audio = doc_id % 50 + 10
    n_frames = n % 40 + 5
    fourcc = ["avc1", "hev1", "vp09", "av01"][(doc_id // 3) % 4]
    if doc_id % 3 == 0:  # audio-only
        return {"media_kind": "mp4:mp4a", "width": None, "height": None,
                "sample_rate": audio_rate, "n_samples": n_audio, "peak": 1}
    if doc_id % 3 == 1:  # video with stsz/stco
        return {"media_kind": f"mp4:{fourcc}",
                "width": 16 * (doc_id % 8 + 1), "height": 16 * (n % 6 + 1),
                "sample_rate": timescale, "n_samples": n_frames, "peak": 1}
    return {"media_kind": f"mp4:{fourcc}",  # audio+video, co64
            "width": 16 * (doc_id % 8 + 1), "height": 16 * (n % 6 + 1),
            "sample_rate": audio_rate, "n_samples": n_frames, "peak": 2}


def test_audio_only_mp4_decodes_where_decode_mp4_refuses():
    content = synthesize_media_sampled(6, 17)  # 6 % 3 == 0 → audio-only
    with pytest.raises(NotImplementedError, match="audio-only"):
        multimodal.decode_mp4(content)
    got = decode_mp4_full(content)
    exp = _expected(6, 17)
    assert got["media_kind"] == "mp4:mp4a"
    assert got["width"] is None and got["height"] is None
    assert got["sample_rate"] == exp["sample_rate"]
    assert got["n_samples"] == exp["n_samples"]  # stsz count, real samples
    assert got["peak"] == 1


def test_video_stsz_yields_real_frame_count():
    doc_id, n = 7, 23  # 7 % 3 == 1 → video-only with sample table
    got = decode_mp4_full(synthesize_media_sampled(doc_id, n))
    exp = _expected(doc_id, n)
    assert got["media_kind"] == exp["media_kind"]
    assert (got["width"], got["height"]) == (exp["width"], exp["height"])
    # the REAL frame count from stsz — NOT the movie duration in
    # timescale units decode_mp4 reports on table-less files
    assert got["n_samples"] == exp["n_samples"]
    assert got["n_samples"] != (doc_id * 97 + n * 31) % 100000
    assert got["sample_rate"] == exp["sample_rate"]  # no audio → timescale


def test_av_with_co64_offsets():
    doc_id, n = 8, 31  # 8 % 3 == 2 → video+audio, co64 chunk offsets
    content = synthesize_media_sampled(doc_id, n)
    assert b"co64" in content and b"stco" not in content
    got = decode_mp4_full(content)
    exp = _expected(doc_id, n)
    assert got["peak"] == 2
    assert got["media_kind"] == exp["media_kind"]  # video is primary
    assert got["sample_rate"] == exp["sample_rate"]  # audio entry rate
    assert got["n_samples"] == exp["n_samples"]  # video frame count


def test_full_decoder_bit_identical_on_metadata_only_corpus():
    """On the EXISTING certified corpus (synthesize_media doc_id%6==5:
    metadata-only MP4s, no sample tables) the full decoder must return
    exactly decode_mp4's dict — supersets extend, never change, the
    driver-certified values."""
    for doc_id in (5, 11, 17, 23, 29, 35, 41, 47):
        for n in (10, 100, 997):
            content = multimodal.synthesize_media(doc_id, n)
            assert decode_mp4_full(content) == multimodal.decode_mp4(content)
            assert decode_media_full(content) == multimodal.decode_mp4(content)


def test_non_mp4_payloads_dispatch_to_certified_decoders():
    for doc_id in (0, 1, 2, 3, 4):  # BMP, WAV, PNG, JPEG, GIF
        content = multimodal.synthesize_media(doc_id, 50)
        assert decode_media_full(content) == multimodal.decode_media(content)


def test_corrupt_sample_tables_raise_loudly():
    content = bytearray(synthesize_media_sampled(7, 23))  # video + stsz/stco
    # stsz declaring more entries than the box holds
    i = bytes(content).index(b"stsz")
    n_declared = struct.unpack_from(">I", content, i + 12)[0]
    struct.pack_into(">I", content, i + 12, n_declared + 1000)
    with pytest.raises(ValueError, match="truncated stsz"):
        decode_mp4_full(bytes(content))

    content = bytearray(synthesize_media_sampled(7, 23))
    # stco pointing past end of file
    i = bytes(content).index(b"stco")
    struct.pack_into(">I", content, i + 12, len(content) + 64)
    with pytest.raises(ValueError, match="past end of file"):
        decode_mp4_full(bytes(content))

    # chunk offsets in well-formed fixtures point at the true mdat
    # positions (the writer's two-pass layout is genuinely consistent)
    ok = synthesize_media_sampled(8, 31)
    i = ok.index(b"co64")
    first_off = struct.unpack_from(">Q", ok, i + 12)[0]
    assert ok[first_off - 8 + 4 : first_off - 8 + 8] == b"mdat"


def test_audio_rate_range_rejected_at_encode():
    with pytest.raises(ValueError, match="16.16"):
        encode_mp4_sampled(600, 100, [{
            "handler": b"soun", "fourcc": b"mp4a", "audio_rate": 96000,
            "sample_sizes": [1],
        }])


def test_spark_pipeline_oracle_predicted(spark):
    """End-to-end on the real documents table: synthesize sampled MP4s in
    one mapInPandas stage, full-decode in a second (binary crosses Arrow
    between them), and compare every row against the closed-form oracle
    computed from (doc_id, n) alone — the media_codec_features pattern."""
    import pandas as pd
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n"))
        .limit(120)
    )

    def synth(it):
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "content": [
                    synthesize_media_sampled(int(d), int(n))
                    for d, n in zip(pdf["doc_id"], pdf["n"])
                ],
            })

    payload = docs.mapInPandas(synth, "doc_id bigint, content binary")
    got = {r["doc_id"]: r.asDict() for r in media_sampled_features(payload).collect()}

    base = {int(r["doc_id"]): int(r["n"]) for r in docs.collect()}
    assert len(got) == len(base) > 0
    for doc_id, n in base.items():
        exp = _expected(doc_id, n)
        row = got[doc_id]
        for k, v in exp.items():
            assert row[k] == v, (doc_id, k, row[k], v)
        assert row["px00_r"] is None and row["sum_abs"] is None


def test_empty_track_rejected_at_encode():
    """An empty chunk's stco entry would point at/past EOF — the writer
    refuses rather than emitting a file its own decoder's bounds check
    rejects."""
    with pytest.raises(ValueError, match="no samples"):
        encode_mp4_sampled(600, 100, [{
            "handler": b"soun", "fourcc": b"mp4a", "audio_rate": 8000,
            "sample_sizes": [],
        }])


def test_dispatch_priority_matches_certified_decoder():
    """A non-MP4 payload whose bytes 4:8 spell 'ftyp' (a RIFF whose
    little-endian size field is 0x70797466) must route exactly where
    decode_media routes it — the wrapper extends the MP4 leg, never
    diverges (review-caught)."""
    wav = bytearray(multimodal.synthesize_media(1, 50))  # doc_id%6==1 → WAV
    wav[4:8] = b"ftyp"
    patched = bytes(wav)
    assert multimodal.decode_media(patched)["media_kind"] == "wav"
    assert decode_media_full(patched) == multimodal.decode_media(patched)


def test_audio_rate_zero_falls_back_to_mdhd_and_raises_without_it():
    """samplerate 0 in the AudioSampleEntry falls back to the mdhd
    timescale; with BOTH sources absent the decoder raises its ValueError
    contract instead of crashing int(None) (review-caught)."""
    from ir_analyses_spark.llm.media_mp4 import _mp4_box

    content = bytearray(synthesize_media_sampled(6, 17))  # audio-only
    i = bytes(content).index(b"mp4a")
    # samplerate sits 24 bytes into the entry payload (after size+fourcc)
    struct.pack_into(">I", content, i + 4 + 24, 0)
    got = decode_mp4_full(bytes(content))
    assert got["sample_rate"] == 600 * (6 % 5 + 1)  # mdhd timescale

    # hand-build a trak with NO mdhd: tkhd + mdia(hdlr + minf/stbl/stsd)
    entry = _mp4_box(
        b"mp4a",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
        + struct.pack(">HHI", 1, 16, 0) + struct.pack(">I", 0),  # rate 0
    )
    stsd = _mp4_box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
    hdlr = _mp4_box(
        b"hdlr",
        b"\x00" * 8 + b"soun" + b"\x00" * 12 + b"x\x00",
    )
    tkhd = _mp4_box(b"tkhd", b"\x00" * 84 + struct.pack(">II", 0, 0))
    mdia = _mp4_box(b"mdia", hdlr + _mp4_box(b"minf", _mp4_box(b"stbl", stsd)))
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 600, 100)
        + b"\x00" * 80,
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd + mdia))
    ftyp = _mp4_box(b"ftyp", b"isom")
    with pytest.raises(ValueError, match="no mdhd timescale"):
        decode_mp4_full(ftyp + moov)


def test_non_sample_bearing_trak_tolerated():
    """Real MP4s carry chapter/meta traks with tkhd+mdia+hdlr but no
    stbl; decode_mp4 skips them after the hdlr check, so the full decoder
    must too — only counting them toward the track total (review-caught:
    requiring stsd on every trak rejected files the certified decoder
    accepts)."""
    from ir_analyses_spark.llm.media_mp4 import _mp4_box

    base = synthesize_media_sampled(7, 23)  # video-only with sample table
    moov_start = base.index(b"moov")
    # hand-build a minimal non-AV trak: tkhd + mdia(hdlr only)
    hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + b"text" + b"\x00" * 12 + b"c\x00")
    tkhd = _mp4_box(b"tkhd", b"\x00" * 84 + struct.pack(">II", 0, 0))
    trak = _mp4_box(b"trak", tkhd + _mp4_box(b"mdia", hdlr))
    # splice it into moov and re-size the moov box header
    moov_size = struct.unpack_from(">I", base, moov_start - 4)[0]
    patched = (
        base[: moov_start - 4]
        + struct.pack(">I", moov_size + len(trak))
        + base[moov_start : moov_start - 4 + moov_size]
        + trak
        + base[moov_start - 4 + moov_size :]
    )
    got = decode_mp4_full(patched)
    want = decode_mp4_full(base)
    assert got["peak"] == want["peak"] + 1  # the extra trak counts
    for k in ("media_kind", "width", "height", "sample_rate", "n_samples"):
        assert got[k] == want[k]  # features still from the video track
