"""Full MP4/ISO-BMFF track decode: audio-only containers + real sample
tables (stsz / stco / co64) — r7, VERDICT r6 item 5.

``multimodal.decode_mp4`` (llm/multimodal.py:679-774) decodes container
metadata for video-bearing MP4s and honestly raises on audio-only files
("audio-only sample metadata not wired"). This module supersedes it for
MP4 payloads:

- **audio-only MP4s decode** instead of raising: media_kind carries the
  audio coding fourcc, sample_rate comes from the AudioSampleEntry's
  16.16 samplerate field (falling back to the track's mdhd timescale
  when the entry omits it), n_samples from the stsz sample count;
- **sample tables decode on every track**: stsz yields the REAL sample
  (frame) count — so a video track's n_samples is its frame count, not
  the movie duration in timescale units — and stco/co64 chunk offsets
  are parsed and bounds-checked against the file so a lying index
  surfaces as a loud error, never as silent garbage accounting.

Everything stays pure stdlib ``struct`` over bytes; per-frame SAMPLE
decode (entropy-coded video payloads) remains out of scope in this
container, exactly as documented in multimodal.py. The box walkers are
imported from multimodal (imports don't change the imported module — the
ledger's staleness rule is module-granular, and multimodal.py's four
driver-certified queries stay frozen this round; that is why this is a
new module rather than an edit at multimodal.py:750).

Output dicts are MEDIA_CODEC_SCHEMA-shaped, so the full decoder slots
into the same Arrow-batched mapInPandas plumbing as ``decode_media``:
on video-bearing files WITHOUT sample tables (the existing synthesized
corpus) it is value-identical to ``decode_mp4``; sample tables and
audio-only files extend, never change, certified values.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

from .multimodal import (
    MEDIA_CODEC_SCHEMA,
    _PNG_SIG,
    _find_box,
    _mp4_box,
    _walk_boxes,
    decode_media,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def _parse_fullbox_times(content: bytes, s: int, what: str) -> tuple[int, int]:
    """(timescale, duration) of an mvhd/mdhd payload, v0 or v1."""
    version = content[s]
    if version == 0:
        _ct, _mt, timescale, duration = struct.unpack_from(">IIII", content, s + 4)
    elif version == 1:
        _ct, _mt, timescale, duration = struct.unpack_from(">QQIQ", content, s + 4)
    else:
        raise ValueError(f"unknown {what} version {version}")
    return timescale, duration


def _parse_stsz(content: bytes, s: int, e: int) -> int:
    """Sample count, with the variable-size entry table bounds-checked
    but never materialized (no caller needs per-sample sizes, and a
    million-sample trak would otherwise allocate a million Python ints
    per row in the mapInPandas hot path — review-caught)."""
    sample_size, sample_count = struct.unpack_from(">II", content, s + 4)
    if sample_size == 0 and s + 12 + 4 * sample_count > e:
        raise ValueError(
            f"truncated stsz: {sample_count} entries declared, box holds "
            f"{(e - s - 12) // 4}"
        )
    return sample_count


def _parse_chunk_offsets(
    content: bytes, stbl_s: int, stbl_e: int
) -> list[int] | None:
    """stco (u32) or co64 (u64) chunk offsets, bounds-checked against the
    file; None when the track carries no chunk-offset table at all."""
    stco = _find_box(content, stbl_s, stbl_e, b"stco")
    co64 = _find_box(content, stbl_s, stbl_e, b"co64")
    if stco is None and co64 is None:
        return None
    s, e = stco if stco is not None else co64
    width, fmt = (4, "I") if stco is not None else (8, "Q")
    (n_entries,) = struct.unpack_from(">I", content, s + 4)
    if s + 8 + width * n_entries > e:
        raise ValueError(
            f"truncated {'stco' if stco else 'co64'}: {n_entries} entries "
            f"declared, box holds {(e - s - 8) // width}"
        )
    offsets = list(struct.unpack_from(f">{n_entries}{fmt}", content, s + 8))
    for off in offsets:
        if off >= len(content):
            raise ValueError(
                f"chunk offset {off} past end of file ({len(content)} bytes)"
            )
    return offsets


def _parse_trak(content: bytes, ts: int, te: int) -> dict:
    """One trak box → handler, fourcc, dims, mdhd timescale, sample tables."""
    tkhd = _find_box(content, ts, te, b"tkhd")
    mdia = _find_box(content, ts, te, b"mdia")
    if tkhd is None or mdia is None:
        raise ValueError("trak missing tkhd/mdia")
    hdlr = _find_box(content, mdia[0], mdia[1], b"hdlr")
    if hdlr is None:
        raise ValueError("mdia missing hdlr")
    handler = content[hdlr[0] + 8 : hdlr[0] + 12]
    out: dict = {
        "handler": handler,
        "fourcc": None,
        "media_timescale": None,
        "width": None,
        "height": None,
        "audio_rate": None,
        "n_samples": None,
        "chunk_offsets": None,
    }
    if handler not in (b"vide", b"soun"):
        # non-sample-bearing traks (chapter/meta/hint) carry no stbl in
        # the wild; decode_mp4 skips them right after the hdlr check, so
        # requiring sample tables here would make this decoder REJECT
        # files the certified one accepts (review-caught) — they still
        # count toward the track total, nothing more
        return out
    mdhd = _find_box(content, mdia[0], mdia[1], b"mdhd")
    media_timescale = (
        _parse_fullbox_times(content, mdhd[0], "mdhd")[0] if mdhd else None
    )
    out["media_timescale"] = media_timescale
    minf = _find_box(content, mdia[0], mdia[1], b"minf")
    stbl = _find_box(content, minf[0], minf[1], b"stbl") if minf else None
    if stbl is None:
        raise ValueError("trak missing minf/stbl")
    stsd = _find_box(content, stbl[0], stbl[1], b"stsd")
    if stsd is None:
        raise ValueError("trak missing stsd")
    ss = stsd[0]
    (n_entries,) = struct.unpack_from(">I", content, ss + 4)
    if n_entries < 1:
        raise ValueError("empty stsd sample description")
    out["fourcc"] = content[ss + 12 : ss + 16].decode("ascii", "replace")
    if handler == b"vide":
        tv = content[tkhd[0]]
        if tv not in (0, 1):
            raise ValueError(f"unknown tkhd version {tv}")
        off = tkhd[0] + (76 if tv == 0 else 88)
        wfx, hfx = struct.unpack_from(">II", content, off)
        out["width"], out["height"] = wfx >> 16, hfx >> 16
    elif handler == b"soun":
        # AudioSampleEntry: 6 reserved + 2 dref + 8 reserved + 2 channels
        # + 2 samplesize + 4 pre_defined/reserved + 4 samplerate (16.16);
        # entry payload starts after size(4) + fourcc(4)
        entry = ss + 8 + 8
        (rate_fx,) = struct.unpack_from(">I", content, entry + 24)
        rate = rate_fx >> 16
        if rate <= 0 and media_timescale is None:
            # both rate sources absent: a malformed container must raise
            # the module's ValueError contract, not crash int(None) later
            raise ValueError(
                "audio trak has samplerate 0 and no mdhd timescale to "
                "fall back on"
            )
        out["audio_rate"] = rate if rate > 0 else media_timescale
    stsz = _find_box(content, stbl[0], stbl[1], b"stsz")
    if stsz is not None:
        out["n_samples"] = _parse_stsz(content, stsz[0], stsz[1])
    out["chunk_offsets"] = _parse_chunk_offsets(content, stbl[0], stbl[1])
    return out


def decode_mp4_full(content: bytes) -> dict:
    """Superset of ``multimodal.decode_mp4``: audio-only containers and
    per-track sample tables, MEDIA_CODEC_SCHEMA-shaped.

    Feature mapping: media_kind = ``mp4:<fourcc>`` of the primary track
    (first video track, else first audio track); width/height = video
    dims (NULL on audio-only); sample_rate = the audio track's
    AudioSampleEntry rate when an audio track exists, else the movie
    timescale (decode_mp4's value on video-only files); n_samples = the
    primary track's stsz sample count when a sample table exists — the
    REAL frame/sample count — else the movie duration in timescale units
    (decode_mp4's value, keeping this decoder bit-identical to the
    certified one on the existing metadata-only corpus); peak = track
    count."""
    moov = _find_box(content, 0, len(content), b"moov")
    if moov is None:
        raise ValueError("MP4 without a moov box")
    ms, me = moov
    mvhd = _find_box(content, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("moov without mvhd")
    timescale, duration = _parse_fullbox_times(content, mvhd[0], "mvhd")

    traks = [
        _parse_trak(content, ts, te)
        for t, ts, te in _walk_boxes(content, ms, me)
        if t == b"trak"
    ]
    if not traks:
        raise ValueError("MP4 with no trak boxes")
    video = next((t for t in traks if t["handler"] == b"vide"), None)
    audio = next((t for t in traks if t["handler"] == b"soun"), None)
    primary = video or audio
    if primary is None:
        raise ValueError(
            f"MP4 with neither video nor audio track "
            f"(handlers: {[t['handler'] for t in traks]})"
        )
    n_samples = primary["n_samples"]
    return {
        "media_kind": f"mp4:{primary['fourcc']}",
        "width": video["width"] if video else None,
        "height": video["height"] if video else None,
        "px00_r": None,
        "sum_r": None,
        "sum_g": None,
        "sum_b": None,
        "sample_rate": int(audio["audio_rate"]) if audio else int(timescale),
        "n_samples": int(n_samples if n_samples is not None else duration),
        "sum_abs": None,
        "peak": len(traks),
    }


def decode_media_full(content: bytes) -> dict:
    """``multimodal.decode_media`` with the full MP4 path swapped in.

    The magic checks that OUTRANK ftyp in decode_media's dispatch chain
    (multimodal.py:922-930: BMP, RIFF/WAVE, PNG, JPEG) are replicated
    here in the same order, so a non-MP4 payload whose bytes 4:8 happen
    to spell ``ftyp`` (e.g. a RIFF whose little-endian size field is
    0x70797466) routes exactly where the certified decoder routes it —
    this wrapper must never DIVERGE from decode_media, only extend its
    MP4 leg (review-caught)."""
    takes_priority = (
        content[:2] == b"BM"
        or (content[:4] == b"RIFF" and content[8:12] == b"WAVE")
        or content[:8] == _PNG_SIG
        or content[:2] == b"\xff\xd8"
    )
    if not takes_priority:
        if content[4:8] == b"ftyp":
            return decode_mp4_full(content)
        from .media_mp3 import decode_mp3_meta, looks_like_mp3

        # MP3 can only be claimed for payloads decode_media REFUSES
        # (its magic set is disjoint from every certified format: JPEG
        # is ff d8, the MP3 sync is ff e*), so this too extends, never
        # diverges
        if looks_like_mp3(content):
            return decode_mp3_meta(content)
    return decode_media(content)


# ---------------------------------------------------------------------------
# synthesis (the writer twin — shares no parsing code with the decoder)
# ---------------------------------------------------------------------------


def encode_mp4_sampled(
    timescale: int, duration: int, tracks: list[dict], use_co64: bool = False
) -> bytes:
    """Hand-rolled ISO-BMFF writer WITH sample tables: ftyp + moov(mvhd +
    per-track trak(tkhd + mdia(mdhd + hdlr + minf/stbl(stsd + stsz +
    stco|co64)))) + one mdat holding the declared samples. ``tracks``
    entries carry handler (b'vide'/b'soun'), fourcc, width, height,
    audio_rate (soun only), and sample_sizes (list of per-sample byte
    sizes). Audio-only files (no 'vide' entry) are valid — that is the
    shape ``multimodal.decode_mp4`` refuses and this module decodes.

    Chunk offsets are REAL: samples land in the mdat in track order, one
    chunk per track, and each stco/co64 entry points at the true absolute
    file offset of its chunk — so the decoder's bounds checks run against
    genuine values, not placeholders."""
    if not 0 < timescale < 2**32:
        raise ValueError(f"timescale {timescale} outside the mvhd u32 range")
    for t in tracks:
        if t["handler"] == b"soun" and not 0 < t["audio_rate"] < 65536:
            raise ValueError(
                f"audio_rate {t['audio_rate']} outside the 16.16 "
                "samplerate range (1..65535)"
            )
        if not t["sample_sizes"]:
            # an empty chunk's stco entry would point at (or past) EOF —
            # the decoder's bounds check would rightly reject the file,
            # so refuse to write the lie in the first place
            raise ValueError(
                f"track {t['fourcc']!r} has no samples; a sampled MP4 "
                "writer cannot emit an empty chunk offset"
            )

    matrix = struct.pack(
        ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1),
    )

    # sample payloads: deterministic bytes, one chunk per track, laid out
    # in the mdat in track order
    chunks = [
        bytes((timescale + duration + ti + i) % 256 for i in range(sum(t["sample_sizes"])))
        for ti, t in enumerate(tracks)
    ]

    def build_traks(chunk_offsets: list[int]) -> bytes:
        traks = b""
        for tid, (t, chunk_off) in enumerate(zip(tracks, chunk_offsets), start=1):
            is_audio = t["handler"] == b"soun"
            tkhd = _mp4_box(
                b"tkhd",
                b"\x00\x00\x00\x07"
                + struct.pack(">IIIII", 0, 0, tid, 0, duration)
                + b"\x00" * 8
                + struct.pack(">HHHH", 0, 0, 0x0100 if is_audio else 0, 0)
                + matrix
                + struct.pack(
                    ">II", t.get("width", 0) << 16, t.get("height", 0) << 16
                ),
            )
            mdhd = _mp4_box(
                b"mdhd",
                b"\x00\x00\x00\x00"
                + struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
            )
            hdlr = _mp4_box(
                b"hdlr",
                b"\x00\x00\x00\x00" + b"\x00\x00\x00\x00" + t["handler"]
                + b"\x00" * 12 + b"synth\x00",
            )
            if is_audio:
                entry_body = (
                    b"\x00" * 6
                    + struct.pack(">H", 1)
                    + b"\x00" * 8
                    + struct.pack(">HHI", 1, 16, 0)
                    + struct.pack(">I", t["audio_rate"] << 16)
                )
            else:
                entry_body = (
                    b"\x00" * 6
                    + struct.pack(">H", 1)
                    + b"\x00" * 16
                    + struct.pack(">HH", t["width"], t["height"])
                    + struct.pack(">II", 0x00480000, 0x00480000)
                    + b"\x00" * 4
                    + struct.pack(">H", 1)
                    + b"\x00" * 32
                    + struct.pack(">Hh", 24, -1)
                )
            stsd = _mp4_box(
                b"stsd",
                b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + _mp4_box(t["fourcc"], entry_body),
            )
            sizes = t["sample_sizes"]
            stsz = _mp4_box(
                b"stsz",
                b"\x00\x00\x00\x00"
                + struct.pack(">II", 0, len(sizes))
                + struct.pack(f">{len(sizes)}I", *sizes),
            )
            if use_co64:
                co = _mp4_box(
                    b"co64",
                    b"\x00\x00\x00\x00" + struct.pack(">IQ", 1, chunk_off),
                )
            else:
                co = _mp4_box(
                    b"stco",
                    b"\x00\x00\x00\x00" + struct.pack(">II", 1, chunk_off),
                )
            mdia = _mp4_box(
                b"mdia",
                mdhd + hdlr + _mp4_box(b"minf", _mp4_box(b"stbl", stsd + stsz + co)),
            )
            traks += _mp4_box(b"trak", tkhd + mdia)
        return traks

    # two-pass layout: offsets depend on moov size, which depends only on
    # the NUMBER of offset bytes (fixed per pass), so pass 2 converges
    placeholder = [0] * len(tracks)
    moov = _mp4_box(b"moov", mvhd + build_traks(placeholder))
    mdat_payload_start = len(ftyp) + len(moov) + 8
    offsets = []
    pos = mdat_payload_start
    for chunk in chunks:
        offsets.append(pos)
        pos += len(chunk)
    moov = _mp4_box(b"moov", mvhd + build_traks(offsets))
    return ftyp + moov + _mp4_box(b"mdat", b"".join(chunks))


def synthesize_media_sampled(doc_id: int, n: int) -> bytes:
    """Deterministic sampled-MP4 corpus, split by ``doc_id % 3``:
    0 → audio-only (mp4a; the shape decode_mp4 refuses), 1 → video with a
    real stsz/stco sample table, 2 → audio+video with co64 offsets. All
    features follow from (doc_id, n) via integer formulas so a test
    oracle predicts them without parsing, while the Spark path must
    round-trip genuine containers (the media_codec_features pattern,
    multimodal.py:1368)."""
    timescale = 600 * (doc_id % 5 + 1)
    duration = (doc_id * 97 + n * 31) % 100000
    audio_rate = 8000 + (doc_id % 7) * 1000
    n_audio = doc_id % 50 + 10
    n_frames = n % 40 + 5
    audio = {
        "handler": b"soun",
        "fourcc": b"mp4a",
        "audio_rate": audio_rate,
        "sample_sizes": [(doc_id + i) % 64 + 1 for i in range(n_audio)],
    }
    video = {
        "handler": b"vide",
        "fourcc": [b"avc1", b"hev1", b"vp09", b"av01"][(doc_id // 3) % 4],
        "width": 16 * (doc_id % 8 + 1),
        "height": 16 * (n % 6 + 1),
        "sample_sizes": [(doc_id * 3 + i * 7) % 128 + 1 for i in range(n_frames)],
    }
    if doc_id % 3 == 0:
        tracks = [audio]
    elif doc_id % 3 == 1:
        tracks = [video]
    else:
        tracks = [video, audio]
    return encode_mp4_sampled(
        timescale, duration, tracks, use_co64=(doc_id % 3 == 2)
    )


def media_sampled_features(payload: DataFrame) -> DataFrame:
    """Arrow-batched full decode over binary MP4 payloads — the same
    two-mapInPandas plumbing as ``media_codec_features``, with the full
    decoder swapped in. ``payload`` carries (doc_id bigint, content
    binary)."""
    import pandas as pd

    def dec(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = [
                {"doc_id": int(d), **decode_media_full(bytes(c))}
                for d, c in zip(pdf["doc_id"], pdf["content"])
            ]
            yield pd.DataFrame(rows)

    return payload.mapInPandas(dec, MEDIA_CODEC_SCHEMA)
