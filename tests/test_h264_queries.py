"""llm/h264_queries.py: the avcC synthesizer round-trips through the
independent media_h264 parser, and the MP4 → avcC → header-features
route extracts from a real ISO-BMFF box tree (and degrades to error
rows on AVC-less or garbage input)."""

from __future__ import annotations

import struct

from ir_analyses_spark.llm.h264_queries import (
    _params,
    find_avcc,
    mp4_h264_headers,
    synthesize_avcc,
    synthesize_mp4_avc,
)
from ir_analyses_spark.llm.media_h264 import parse_avcc
from ir_analyses_spark.llm.multimodal import _mp4_box, encode_mp4_meta


def test_synthesized_avcc_roundtrips_closed_form():
    for doc_id in (0, 1, 2, 3, 7, 11, 101):
        p = _params(doc_id)
        rec = parse_avcc(synthesize_avcc(doc_id))
        sps = rec["sps"]
        assert sps["level_idc"] == p["level"]
        assert sps["width"] == p["mbs_w"] * 16 - 2 * p["crop_r"]
        assert sps["height"] == p["map_h"] * 16 - 2 * p["crop_b"]
        assert sps["chroma_format_idc"] == 1
        assert sps["bit_depth_luma"] == 8
        assert rec["pps"]["entropy_coding"] == (
            "cabac" if p["cabac"] else "cavlc"
        )


def _avc1_mp4(avcc_payload: bytes) -> bytes:
    """Minimal ISO-BMFF tree carrying an avc1 VisualSampleEntry with an
    avcC child (ISO 14496-12 §12.1.3: 78 fixed bytes before children).
    """
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", 640, 480)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">H", 24)  # depth
        + b"\xff\xff"  # pre_defined = -1
    )
    child = _mp4_box(b"avcC", avcc_payload)
    entry = (
        struct.pack(">I", 8 + len(body) + len(child)) + b"avc1" + body + child
    )
    stsd = _mp4_box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
    return _mp4_box(
        b"moov",
        _mp4_box(
            b"trak",
            _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd))),
        ),
    )


def test_find_avcc_walks_the_box_tree():
    payload = synthesize_avcc(7)
    assert find_avcc(_avc1_mp4(payload)) == payload
    # a real (decode_mp4-compatible) MP4 whose video entry is NOT avc1
    no_avc = encode_mp4_meta(
        1000, 500,
        [{"handler": b"vide", "fourcc": b"mp4v", "width": 64, "height": 48}],
    )
    assert find_avcc(no_avc) is None


def test_mp4_route_parses_and_degrades(spark):
    rows = [
        (7, _avc1_mp4(synthesize_avcc(7))),
        (8, encode_mp4_meta(
            1000, 500,
            [{"handler": b"vide", "fourcc": b"mp4v",
              "width": 64, "height": 48}],
        )),
        (9, b"not an mp4 at all"),
        (10, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in mp4_h264_headers(df).collect()}
    p = _params(7)
    assert got[7]["profile"] == "main" and got[7]["error"] is None
    assert got[7]["width"] == p["mbs_w"] * 16 - 2 * p["crop_r"]
    assert got[7]["entropy_coding"] == "cavlc"
    for d in (8, 9, 10):
        assert got[d]["error"] is not None
        assert got[d]["width"] is None


def test_find_avcc_bounded_on_malicious_stsd():
    """Review-caught DoS: entry_count up to 2^32-1 with a zero-size
    first entry stayed in-bounds forever (no exception for the
    permissive except tuple to catch). The walk must bail out fast on
    sub-minimum entry sizes and truncated entry tables."""
    import time

    # stsd claims 0xFFFFFFFF entries; first entry has size 0
    poisoned_entry = struct.pack(">I", 0) + b"avc1" + b"\x00" * 70
    stsd = _mp4_box(
        b"stsd", b"\x00" * 4 + struct.pack(">I", 0xFFFFFFFF) + poisoned_entry
    )
    blob = _mp4_box(
        b"moov",
        _mp4_box(
            b"trak",
            _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd))),
        ),
    )
    t = time.monotonic()
    assert find_avcc(blob) is None
    assert time.monotonic() - t < 1.0
    # truncated table: entry_count says 3 but bytes run out after 1
    stsd2 = _mp4_box(
        b"stsd",
        b"\x00" * 4 + struct.pack(">I", 3)
        + struct.pack(">I", 16) + b"mp4v" + b"\x00" * 8,
    )
    blob2 = _mp4_box(
        b"moov",
        _mp4_box(
            b"trak",
            _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd2))),
        ),
    )
    assert find_avcc(blob2) is None


def test_params_sign_agnostic():
    """r10 ADVICE item 4: the oracle SQL's modulo follows the
    dividend's sign while Python's does not — both sides now abs()
    the doc_id, so a negative id means the same header."""
    for d in (1, 2, 5, 7, 13):
        assert _params(-d) == _params(d)
    assert synthesize_avcc(-13) == synthesize_avcc(13)
    assert synthesize_mp4_avc(-13) == synthesize_mp4_avc(13)


def test_container_writer_roundtrips_through_find_avcc():
    """The writer twin (r10 VERDICT item 2): for every doc_id lattice
    point the synthesized container's extracted avcC must be BYTE-equal
    to the bare synthesized record — certifying the 78-byte
    VisualSampleEntry offset arithmetic, the esize stride past the
    non-AVC entry, and the non-AVC-trak skip in one walk. Audio-only
    containers (doc_id % 7 == 0) must yield None."""
    # lcm(3,4,8,5,2,3,7) = 840 covers every (header-params × has-avc)
    # combination; sample the full cycle sparsely + all %7 residues
    for doc_id in (*range(16), 41, 90, 119, 210, 335, 839):
        blob = synthesize_mp4_avc(doc_id)
        got = find_avcc(blob)
        if doc_id % 7 == 0:
            assert got is None, doc_id
        else:
            assert got == synthesize_avcc(doc_id), doc_id
    # the avc-bearing container also parses as a plain MP4 box tree:
    # moov exists and the avcC sits after the 78 fixed entry bytes
    from ir_analyses_spark.llm.multimodal import _find_box

    blob = synthesize_mp4_avc(3)
    assert _find_box(blob, 0, len(blob), b"moov") is not None


def test_randomized_synth_parse_roundtrip():
    """Hypothesis-style sweep of the full parameter grid: every
    (profile, level, geometry, crop, entropy) combination the
    synthesizer can emit must round-trip through the independent
    parser to the closed-form values — the same invariant the driver's
    oracle checks, exercised over the whole doc_id lattice instead of
    the corpus' ids."""
    # the parameter lattice is a pure function of doc_id mod
    # lcm(3, 4, 8, 5, 2, 3) = 120 — one full cycle covers every
    # reachable combination exactly once
    for doc_id in range(120):
        p = _params(doc_id)
        rec = parse_avcc(synthesize_avcc(doc_id))
        sps = rec["sps"]
        assert rec["avc_profile_indication"] == p["profile"]
        assert sps["level_idc"] == p["level"]
        assert sps["width"] == p["mbs_w"] * 16 - 2 * p["crop_r"], doc_id
        assert sps["height"] == p["map_h"] * 16 - 2 * p["crop_b"], doc_id
        assert rec["pps"]["entropy_coding"] == (
            "cabac" if p["cabac"] else "cavlc"
        )
        assert rec["n_sps"] == 1 and rec["n_pps"] == 1
