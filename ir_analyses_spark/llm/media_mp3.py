"""MP3 (MPEG-1 Layer III) frame-walk METADATA decode — r7 follow-on to
the MP4 sample-table work (VERDICT r6 "What's missing" #3 named "MP3, …"
among the ffmpeg-class gated stubs).

Scope mirrors ``multimodal.decode_mp4``'s honesty contract: the frame
HEADERS decode for real — sync walk, bitrate/samplerate tables, padding,
per-frame lengths (so VBR streams are handled by construction, every
frame carries its own header), optional leading ID3v2 tag skip — while
entropy-coded SAMPLE decode (Huffman spectral data) stays out of scope
in this container and the payload bytes are never interpreted. That
still yields the metadata a pipeline wants: exact frame count, sample
count (1152 samples/frame for MPEG-1 Layer III), sample rate, and the
peak bitrate across frames.

Pure stdlib over bytes; the writer twin (``encode_mp3_frames``) shares
no parsing code with the decoder — tests predict every feature in
closed form from the synthesis formulas (the media_codec_features
differential discipline). New module by the ledger rule: certified
modules stay frozen; ``media_mp4.decode_media_full`` dispatches here
for payloads the certified ``decode_media`` refuses
(NotImplementedError), so this is a strict extension, never a
divergence.
"""

from __future__ import annotations

import struct

#: MPEG-1 Layer III bitrate table, kbps, indexed by the 4-bit field
#: (index 0 = "free format", 15 = reserved — both rejected)
_BITRATES_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
#: MPEG-1 sample-rate table, Hz, indexed by the 2-bit field (3 = reserved)
_SAMPLE_RATES = (44100, 48000, 32000, None)
_SAMPLES_PER_FRAME = 1152


def _skip_id3v2(content: bytes) -> int:
    """Return the offset past a leading ID3v2 tag (0 when absent). The
    tag size is syncsafe (7 bits per byte)."""
    if content[:3] != b"ID3" or len(content) < 10:
        return 0
    size = 0
    for b in content[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size bytes must be syncsafe (high bit 0)")
        size = (size << 7) | b
    return 10 + size


def _parse_frame_header(content: bytes, pos: int) -> tuple[int, int, int]:
    """(frame_length, bitrate_kbps, sample_rate) of the header at pos."""
    b1, b2, b3 = content[pos], content[pos + 1], content[pos + 2]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        raise ValueError(f"lost MP3 frame sync at byte {pos}")
    version = (b2 >> 3) & 0x3
    layer = (b2 >> 1) & 0x3
    if version != 0b11 or layer != 0b01:
        # MPEG-2/2.5 and Layers I/II use different tables and frame
        # sizes; refuse loudly rather than count frames with the wrong
        # stride (the honest-gate contract, like baseline-only JPEG)
        raise ValueError(
            "only MPEG-1 Layer III is decoded in this container "
            f"(version bits {version:02b}, layer bits {layer:02b})"
        )
    bitrate = _BITRATES_KBPS[(b3 >> 4) & 0xF]
    sample_rate = _SAMPLE_RATES[(b3 >> 2) & 0x3]
    if bitrate is None:
        raise ValueError("free-format/reserved bitrate index not supported")
    if sample_rate is None:
        raise ValueError("reserved sample-rate index")
    padding = (b3 >> 1) & 0x1
    frame_length = 144 * bitrate * 1000 // sample_rate + padding
    return frame_length, bitrate, sample_rate


def decode_mp3_meta(content: bytes) -> dict:
    """Walk every frame header; MEDIA_CODEC_SCHEMA-shaped result.

    Feature mapping: media_kind ``mp3``; sample_rate from the frame
    headers (must be consistent across frames — a mid-stream rate change
    raises, it would make "the" sample count ill-defined); n_samples =
    frames × 1152; peak = the highest per-frame bitrate in kbps (VBR
    streams report their true peak because every frame is walked, not
    just the first); pixel columns NULL; sum_abs NULL (no sample
    decode). A truncated final frame raises — a lying byte count must
    never silently round down."""
    pos = _skip_id3v2(content)
    if pos >= len(content):
        raise ValueError("nothing after the ID3v2 tag")
    frames = 0
    peak_kbps = 0
    rate: int | None = None
    while pos < len(content):
        if len(content) - pos == 128 and content[pos : pos + 3] == b"TAG":
            # trailing ID3v1 tag — ubiquitous on real files; metadata,
            # not a lost sync
            break
        if pos + 4 > len(content):
            raise ValueError(
                f"truncated MP3: {len(content) - pos} trailing bytes are "
                "not a frame header"
            )
        frame_length, kbps, sr = _parse_frame_header(content, pos)
        if rate is None:
            rate = sr
        elif sr != rate:
            raise ValueError(
                f"sample rate changes mid-stream ({rate} → {sr} Hz)"
            )
        if pos + frame_length > len(content):
            raise ValueError(
                f"truncated MP3: frame {frames} declares {frame_length} "
                f"bytes, file holds {len(content) - pos}"
            )
        peak_kbps = max(peak_kbps, kbps)
        frames += 1
        pos += frame_length
    if frames == 0:
        raise ValueError("no MP3 frames")
    return {
        "media_kind": "mp3",
        "width": None,
        "height": None,
        "px00_r": None,
        "sum_r": None,
        "sum_g": None,
        "sum_b": None,
        "sample_rate": int(rate),
        "n_samples": frames * _SAMPLES_PER_FRAME,
        "sum_abs": None,
        "peak": int(peak_kbps),
    }


def looks_like_mp3(content: bytes) -> bool:
    """Magic probe: leading ID3v2 tag, or a valid MPEG-1 Layer III sync
    at byte 0. Deliberately narrow — the extended dispatcher must only
    claim payloads the certified decode_media refuses."""
    if content[:3] == b"ID3":
        return True
    return (
        len(content) >= 3
        and content[0] == 0xFF
        and (content[1] & 0xE0) == 0xE0
        and (content[1] >> 3) & 0x3 == 0b11
        and (content[1] >> 1) & 0x3 == 0b01
    )


# ---------------------------------------------------------------------------
# synthesis (the writer twin — shares no parsing code with the decoder)
# ---------------------------------------------------------------------------


def encode_mp3_frames(
    frame_bitrates_kbps: list[int],
    sample_rate: int,
    id3_payload: bytes | None = None,
    seed: int = 0,
) -> bytes:
    """Hand-rolled MPEG-1 Layer III stream: one frame per requested
    bitrate (a multi-valued list IS a VBR stream), each frame a valid
    4-byte header plus deterministic filler payload; optionally preceded
    by a minimal ID3v2 tag carrying ``id3_payload``. No padding bit is
    set (the tested rates divide evenly or truncate identically on both
    sides of the differential)."""
    if sample_rate not in _SAMPLE_RATES[:3]:
        raise ValueError(f"sample_rate {sample_rate} not an MPEG-1 rate")
    out = bytearray()
    if id3_payload is not None:
        if len(id3_payload) >= 1 << 28:
            raise ValueError("ID3v2 payload too large for syncsafe size")
        size = len(id3_payload)
        syncsafe = bytes(
            (size >> shift) & 0x7F for shift in (21, 14, 7, 0)
        )
        out += b"ID3" + b"\x04\x00\x00" + syncsafe + id3_payload
    for fi, kbps in enumerate(frame_bitrates_kbps):
        bidx = _BITRATES_KBPS.index(kbps)
        sidx = _SAMPLE_RATES.index(sample_rate)
        hdr = bytes(
            (
                0xFF,
                0xE0 | (0b11 << 3) | (0b01 << 1) | 0x1,  # MPEG-1, L3, no CRC
                (bidx << 4) | (sidx << 2) | (0 << 1),  # no padding
                0xC4,  # mono, no emphasis
            )
        )
        frame_length = 144 * kbps * 1000 // sample_rate
        body = bytes((seed + fi + i) % 256 for i in range(frame_length - 4))
        out += hdr + body
    return bytes(out)
