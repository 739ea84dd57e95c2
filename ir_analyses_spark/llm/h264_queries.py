"""Registry query + DuckDB oracle + multimodal glue for the H.264
header parser (`llm/media_h264.py`) — r9 VERDICT item 4: the parser
had no package consumer and no driver row. Three pieces:

- a from-spec SPS/PPS/avcC SYNTHESIZER (Exp-Golomb bit writer with
  emulation prevention, ITU-T H.264 §7.3.2.1.1 / §7.3.2.2, ISO/IEC
  14496-15 §5.2.4.1) parameterized in closed form by ``doc_id``;
- ``h264_header_parse`` — the registry query: synthesize one avcC
  record per document (first ``mapInPandas``), parse it back with the
  shipped `media_h264.h264_header_features` operator (second
  ``mapInPandas`` — the binary column crosses Arrow between stages,
  the same two-stage shape as ``media_codec_features``); the oracle
  recomputes profile/level/geometry/entropy from the same doc_id
  formulas, so any writer/parser defect (Exp-Golomb coding, emulation
  escapes, crop-unit arithmetic, avcC length framing, CABAC flag)
  breaks the value hash;
- ``mp4_h264_headers`` — the multimodal-surface route: walk an
  ISO-BMFF payload to the avc1 sample entry's ``avcC`` box (reusing
  `llm/multimodal.py`'s box-walk helpers) and triage it with
  ``h264_header_features``, so MP4 video headers are reachable from
  the same binary-column plumbing as every other codec
  (`llm/multimodal.decode_media` cross-links here).

Scale shape: everything is a per-row KB-header map over Arrow batches
— no shuffle, no Python row path.

New module per the evidence-ledger rule (`llm/media_h264.py` and
`llm/multimodal.py` keep their own query sets; helpers are imported).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

from ..io.sources import load_table
from .media_h264 import h264_header_features

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


class _BitWriter:
    """MSB-first bit assembler for RBSP synthesis (the writing twin of
    media_h264's reader; shares no code with it, so the registry row
    checks the parser against independent arithmetic)."""

    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, val: int, n: int) -> "_BitWriter":
        for i in range(n - 1, -1, -1):
            self._bits.append((val >> i) & 1)
        return self

    def ue(self, k: int) -> "_BitWriter":
        # Exp-Golomb: leadingZeroBits = floor(log2(k+1)); write that
        # many 0s, a 1, then (k + 1 - 2^z) in z bits (§9.1)
        z = (k + 1).bit_length() - 1
        self.u(0, z).u(1, 1)
        if z:
            self.u(k + 1 - (1 << z), z)
        return self

    def rbsp(self) -> bytes:
        bits = self._bits + [1]  # rbsp_stop_one_bit (§7.4.1)
        while len(bits) % 8:
            bits.append(0)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            raw.append(b)
        # emulation prevention (§7.4.1.1): 0x000000..0x000003 get a
        # 0x03 byte inserted after the two zeros
        out = bytearray()
        zeros = 0
        for b in raw:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)


#: doc_id → header parameters, in closed form (the oracle recomputes
#: exactly these): profile cycles baseline/main/high, level cycles
#: 30/31/41/51, geometry and crops derive from small moduli. Chroma
#: stays 4:2:0 / 8-bit so the §7.4.2.1.1 crop unit is always 2.
_PROFILES = (66, 77, 100)
_LEVELS = (30, 31, 41, 51)


def _params(doc_id: int) -> dict:
    # abs() on BOTH sides (here and in the oracle SQL): Python's modulo
    # is non-negative for a positive divisor while SQL's follows the
    # dividend's sign, so a scale factor that ever shipped negative
    # doc_ids would silently diverge the two sides (r10 ADVICE)
    doc_id = abs(doc_id)
    return {
        "profile": _PROFILES[doc_id % 3],
        "level": _LEVELS[doc_id % 4],
        "mbs_w": doc_id % 8 + 2,
        "map_h": doc_id % 5 + 2,
        "crop_r": doc_id % 2,
        "crop_b": doc_id % 3,
        "cabac": doc_id % 2 == 0,
    }


def synthesize_avcc(doc_id: int) -> bytes:
    """One AVCDecoderConfigurationRecord (avcC) with a single SPS and a
    single PPS, all fields a closed-form function of ``doc_id``."""
    p = _params(doc_id)
    w = _BitWriter()
    w.u(p["profile"], 8).u(0, 8).u(p["level"], 8)
    w.ue(0)  # seq_parameter_set_id
    if p["profile"] == 100:
        w.ue(1)  # chroma_format_idc = 4:2:0
        w.ue(0).ue(0)  # bit_depth_{luma,chroma}_minus8
        w.u(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.u(0, 1)  # seq_scaling_matrix_present_flag
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(4)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(p["mbs_w"] - 1).ue(p["map_h"] - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(0, 1)  # direct_8x8_inference_flag
    if p["crop_r"] or p["crop_b"]:
        w.u(1, 1)  # frame_cropping_flag
        w.ue(0).ue(p["crop_r"]).ue(0).ue(p["crop_b"])
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    sps_nal = b"\x67" + w.rbsp()  # nal_ref_idc=3, type 7

    w = _BitWriter()
    w.ue(0).ue(0)  # pps_id, sps_id
    w.u(1 if p["cabac"] else 0, 1)  # entropy_coding_mode_flag
    pps_nal = b"\x68" + w.rbsp()  # type 8

    return (
        bytes([1, p["profile"], 0, p["level"], 0xFF, 0xE1])
        + struct.pack(">H", len(sps_nal))
        + sps_nal
        + b"\x01"
        + struct.pack(">H", len(pps_nal))
        + pps_nal
    )


def h264_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: one synthesized avcC record per document, parsed
    back by the shipped `media_h264.h264_header_features` operator.
    The oracle recomputes every output column from the same closed
    doc_id formulas (width = 16·mbs − 2·crop under the 4:2:0 crop
    unit, §7.4.2.1.1)."""
    import pandas as pd

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def synth(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "content": [
                        synthesize_avcc(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    payload = docs.mapInPandas(synth, "doc_id bigint, content binary")
    return h264_header_features(payload)


#: the closed-form header parameters, recomputed in SQL — abs() on the
#: doc_id mirrors ``_params`` (r10 ADVICE: SQL modulo is negative for
#: negative dividends where Python's is not)
H264_HEADER_PARSE_SQL = """
SELECT doc_id,
       CASE abs(doc_id) % 3 WHEN 0 THEN 'baseline'
                            WHEN 1 THEN 'main'
                            ELSE 'high' END AS profile,
       CAST(CASE abs(doc_id) % 4 WHEN 0 THEN 30 WHEN 1 THEN 31
                                 WHEN 2 THEN 41 ELSE 51 END AS INT)
         AS level_idc,
       CAST((abs(doc_id) % 8 + 2) * 16 - 2 * (abs(doc_id) % 2) AS INT)
         AS width,
       CAST((abs(doc_id) % 5 + 2) * 16 - 2 * (abs(doc_id) % 3) AS INT)
         AS height,
       CAST(1 AS INT) AS chroma_format_idc,
       CAST(8 AS INT) AS bit_depth_luma,
       CASE WHEN abs(doc_id) % 2 = 0 THEN 'cabac' ELSE 'cavlc' END
         AS entropy_coding,
       CAST(NULL AS VARCHAR) AS error
FROM documents
"""


def synthesize_mp4_avc(doc_id: int) -> bytes:
    """One ISO-BMFF container whose video ``avc1`` sample entry carries
    ``synthesize_avcc(doc_id)`` — the writer twin of :func:`find_avcc`
    (r10 VERDICT item 2: the container→codec route had pytest-only
    coverage; this gives it the same closed-form full-oracle driver
    treatment as ``h264_header_parse``). Box plumbing is
    `llm/multimodal._mp4_box` (the certified writer's helper); the
    VisualSampleEntry's 78 fixed bytes (ISO/IEC 14496-12 §12.1.3) are
    assembled here so the avcC lands as a CHILD BOX after them —
    exactly the offset arithmetic (``entry_start + 86``) the walker
    must get right.

    Coverage shaping, all closed-form in ``doc_id``:

    - ``abs(doc_id) % 7 == 0`` → an AUDIO-ONLY container (no AVC
      track): ``find_avcc`` returns None and the parser must emit its
      permissive null-content error row;
    - otherwise: an audio trak FIRST (the walk must skip a non-AVC
      trak, and inside its mdia skip mdhd/hdlr to reach minf), then
      the video trak whose stsd holds a non-AVC visual entry (``hvc1``)
      BEFORE the ``avc1`` — the entry loop must stride by esize past
      it."""
    from .multimodal import _mp4_box

    def audio_trak() -> bytes:
        mdhd = _mp4_box(
            b"mdhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">IIIIHH", 0, 0, 48000, 0, 0x55C4, 0),
        )
        hdlr = _mp4_box(
            b"hdlr",
            b"\x00" * 8 + b"soun" + b"\x00" * 12 + b"synth\x00",
        )
        entry = _mp4_box(
            b"mp4a",
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HHI", 2, 16, 0)
            + struct.pack(">I", 48000 << 16),
        )
        stsd = _mp4_box(
            b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry
        )
        return _mp4_box(
            b"trak",
            _mp4_box(
                b"mdia",
                mdhd + hdlr + _mp4_box(b"minf", _mp4_box(b"stbl", stsd)),
            ),
        )

    def visual_entry(fourcc: bytes, width: int, height: int,
                     children: bytes = b"") -> bytes:
        # VisualSampleEntry (§12.1.3): 78 bytes of fixed fields, then
        # child boxes — find_avcc's entry_start + 8 + 78 offset
        body = (
            b"\x00" * 6
            + struct.pack(">H", 1)  # data_reference_index
            + b"\x00" * 16  # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4
            + struct.pack(">H", 1)  # frame_count
            + b"\x00" * 32  # compressorname
            + struct.pack(">Hh", 24, -1)  # depth, pre_defined
        )
        if len(body) != 78:
            raise AssertionError(f"VisualSampleEntry body {len(body)} != 78")
        return _mp4_box(fourcc, body + children)

    ftyp = _mp4_box(
        b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2avc1"
    )
    traks = audio_trak()
    if abs(doc_id) % 7 != 0:
        p = _params(doc_id)
        width = 16 * p["mbs_w"] - 2 * p["crop_r"]
        height = 16 * p["map_h"] - 2 * p["crop_b"]
        avcc_box = _mp4_box(b"avcC", synthesize_avcc(doc_id))
        stsd = _mp4_box(
            b"stsd",
            b"\x00\x00\x00\x00"
            + struct.pack(">I", 2)
            # a non-AVC visual entry first: the walker must stride past
            # it by esize, not bail or misparse
            + visual_entry(b"hvc1", width, height)
            + visual_entry(b"avc1", width, height, avcc_box),
        )
        traks += _mp4_box(
            b"trak",
            _mp4_box(
                b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd))
            ),
        )
    mdat = _mp4_box(b"mdat", bytes(abs(doc_id) % 256 for _ in range(8)))
    return ftyp + _mp4_box(b"moov", traks) + mdat


def find_avcc(content: bytes) -> bytes | None:
    """The avcC payload of the first video sample entry of an ISO-BMFF
    file, or None when the container carries no AVC configuration.
    Box-walk helpers come from `llm/multimodal.py` (the certified MP4
    metadata decoder); the sample-entry interior layout is ISO/IEC
    14496-12 §12.1.3 (VisualSampleEntry: 78 bytes before child boxes).
    """
    from .multimodal import _find_box, _walk_boxes

    moov = _find_box(content, 0, len(content), b"moov")
    if moov is None:
        return None
    for t, ts, te in _walk_boxes(content, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find_box(content, ts, te, b"mdia")
        if mdia is None:
            continue
        minf = _find_box(content, mdia[0], mdia[1], b"minf")
        stbl = _find_box(content, minf[0], minf[1], b"stbl") if minf else None
        stsd = _find_box(content, stbl[0], stbl[1], b"stsd") if stbl else None
        if stsd is None:
            continue
        ss = stsd[0]
        (n_entries,) = struct.unpack_from(">I", content, ss + 4)
        entry_start = ss + 8
        for _ in range(n_entries):
            if entry_start + 8 > stsd[1]:
                break  # truncated entry table
            (esize,) = struct.unpack_from(">I", content, entry_start)
            if esize < 8:
                # spec minimum box size; a crafted esize=0 with an
                # attacker-controlled n_entries up to 2^32-1 would
                # otherwise spin this loop for hours inside the
                # permissive-triage operator (review-caught DoS)
                break
            fourcc = content[entry_start + 4 : entry_start + 8]
            if fourcc in (b"avc1", b"avc3"):
                # VisualSampleEntry: 8 box header + 78 fixed fields
                inner = entry_start + 86
                avcc = _find_box(
                    content, inner, entry_start + esize, b"avcC"
                )
                if avcc is not None:
                    return content[avcc[0] : avcc[1]]
            entry_start += esize
    return None


def mp4_h264_headers(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """MP4/ISO-BMFF → H.264 stream parameters over a binary column:
    extract each file's avcC record (``find_avcc``) and triage it with
    `media_h264.h264_header_features` — the route from the multimodal
    container surface into the codec-header parser. Files without an
    AVC track yield the operator's permissive error row."""
    import pandas as pd

    def extract(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for blob in pdf[content_col]:
                try:
                    rec = find_avcc(bytes(blob)) if blob is not None else None
                except (ValueError, struct.error, IndexError):
                    rec = None
                out.append(rec)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].values, "content": out}
            )

    payload = df.select(id_col, content_col).mapInPandas(
        extract, "doc_id bigint, content binary"
    )
    return h264_header_features(payload)


def mp4_h264_headers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry for the container route: synthesize one ISO-BMFF
    file per document (``synthesize_mp4_avc``), then run the SHIPPED
    ``mp4_h264_headers`` operator (find_avcc → h264_header_features)
    over the binary column. Same two-Arrow-stage, zero-shuffle shape as
    ``h264_header_parse``; the oracle adds the audio-only error branch
    on top of the closed-form header formulas."""
    import pandas as pd

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def synth(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "content": [
                        synthesize_mp4_avc(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    payload = docs.mapInPandas(synth, "doc_id bigint, content binary")
    return mp4_h264_headers(payload)


#: the audio-only branch (abs(doc_id) % 7 = 0) must surface the
#: parser's permissive null-content error row; every other row carries
#: the same closed-form header parameters as H264_HEADER_PARSE_SQL
MP4_H264_HEADERS_SQL = """
SELECT doc_id,
       CASE WHEN abs(doc_id) % 7 = 0 THEN NULL
            ELSE CASE abs(doc_id) % 3 WHEN 0 THEN 'baseline'
                                      WHEN 1 THEN 'main'
                                      ELSE 'high' END END AS profile,
       CAST(CASE WHEN abs(doc_id) % 7 = 0 THEN NULL
                 ELSE CASE abs(doc_id) % 4 WHEN 0 THEN 30 WHEN 1 THEN 31
                                           WHEN 2 THEN 41 ELSE 51 END END
            AS INT) AS level_idc,
       CAST(CASE WHEN abs(doc_id) % 7 = 0 THEN NULL
                 ELSE (abs(doc_id) % 8 + 2) * 16 - 2 * (abs(doc_id) % 2) END
            AS INT) AS width,
       CAST(CASE WHEN abs(doc_id) % 7 = 0 THEN NULL
                 ELSE (abs(doc_id) % 5 + 2) * 16 - 2 * (abs(doc_id) % 3) END
            AS INT) AS height,
       CAST(CASE WHEN abs(doc_id) % 7 = 0 THEN NULL ELSE 1 END AS INT)
         AS chroma_format_idc,
       CAST(CASE WHEN abs(doc_id) % 7 = 0 THEN NULL ELSE 8 END AS INT)
         AS bit_depth_luma,
       CASE WHEN abs(doc_id) % 7 = 0 THEN NULL
            WHEN abs(doc_id) % 2 = 0 THEN 'cabac' ELSE 'cavlc' END
         AS entropy_coding,
       CASE WHEN abs(doc_id) % 7 = 0 THEN 'ValueError: null content'
            ELSE NULL END AS error
FROM documents
"""


QUERIES = {
    "h264_header_parse": h264_header_parse,
    "mp4_h264_headers": mp4_h264_headers_query,
}

ORACLES = {
    "h264_header_parse": H264_HEADER_PARSE_SQL,
    "mp4_h264_headers": MP4_H264_HEADERS_SQL,
}
