"""Unit tests for the real BMP/WAV codecs behind ``media_codec_features``.

The registry-level differential check (test_oracle_parity) proves the full
synthesize → Arrow → parse pipeline against the closed-form oracle; these
tests pin the parser details that a formula-level check could miss only by
coincidence: bottom-up row flip, row padding, and cross-writer parsing.
"""

from __future__ import annotations

import io
import struct
import wave

import pytest

from ir_analyses_spark.llm.multimodal import (
    decode_bmp,
    decode_media,
    decode_wav,
    synthesize_media,
)


def _bmp_bytes(pixels_topdown: list[list[tuple[int, int, int]]]) -> bytes:
    """Independent hand-rolled BMP writer (RGB rows given top-down)."""
    h = len(pixels_topdown)
    w = len(pixels_topdown[0])
    row_bytes = (3 * w + 3) // 4 * 4
    body = b""
    for row in reversed(pixels_topdown):  # file stores bottom-up
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)
        body += line + b"\x00" * (row_bytes - len(line))
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
        + body
    )


def test_bmp_decode_flips_bottom_up_rows():
    # 3x2 image, asymmetric: top-left is pure red, bottom-right pure blue.
    img = [
        [(255, 0, 0), (1, 2, 3), (4, 5, 6)],
        [(7, 8, 9), (10, 11, 12), (0, 0, 255)],
    ]
    feats = decode_bmp(_bmp_bytes(img))
    assert (feats["width"], feats["height"]) == (3, 2)
    # px00_r must be the TOP-left red — wrong if the decoder forgets the flip
    assert feats["px00_r"] == 255
    assert feats["sum_r"] == 255 + 1 + 4 + 7 + 10 + 0
    assert feats["sum_g"] == 0 + 2 + 5 + 8 + 11 + 0
    assert feats["sum_b"] == 0 + 3 + 6 + 9 + 12 + 255


def test_bmp_decode_respects_row_padding():
    # width 3 -> 9 pixel bytes padded to 12 per row; junk in the pad bytes
    # must not leak into sums
    img = [[(1, 1, 1)] * 3, [(2, 2, 2)] * 3]
    raw = bytearray(_bmp_bytes(img))
    raw[-3:] = b"\xff\xff\xff"  # clobber final row's padding
    feats = decode_bmp(bytes(raw))
    assert feats["sum_r"] == 3 * 1 + 3 * 2


def test_wav_decode_parses_files_written_by_stdlib_wave():
    # writer here is the stdlib wave module; the engine's synthesizer writes
    # raw RIFF bytes — decode must accept both
    samples = [0, 100, -100, 32767, -32768]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(struct.pack("<5h", *samples))
    feats = decode_wav(buf.getvalue())
    assert feats["sample_rate"] == 16000
    assert feats["n_samples"] == 5
    assert feats["sum_abs"] == 0 + 100 + 100 + 32767 + 32768  # no int16 overflow
    assert feats["peak"] == 32768


def test_decode_media_dispatches_on_magic_bytes():
    bmp = synthesize_media(6, 57)    # doc_id % 6 == 0
    wav = synthesize_media(7, 57)    # doc_id % 6 == 1
    png = synthesize_media(8, 57)    # doc_id % 6 == 2
    jpg = synthesize_media(9, 57)    # doc_id % 6 == 3
    gif = synthesize_media(10, 57)   # doc_id % 6 == 4
    mp4 = synthesize_media(11, 57)   # doc_id % 6 == 5
    assert decode_media(bmp)["media_kind"] == "bmp"
    assert decode_media(wav)["media_kind"] == "wav"
    assert decode_media(png)["media_kind"] == "png"
    assert decode_media(jpg)["media_kind"] == "jpeg"
    assert decode_media(gif)["media_kind"] == "gif"
    assert decode_media(mp4)["media_kind"].startswith("mp4:")
    with pytest.raises(ValueError):
        # ftyp dispatches to the real box walk, which must reject a
        # container with no moov rather than fake-decode it
        decode_media(b"\x00\x00\x00\x10ftypmp42 then trailing junk")
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff jpeg-shaped garbage")


def test_synthesized_payloads_are_real_files():
    # the synthesizer's WAV must be readable by the stdlib parser directly
    with wave.open(io.BytesIO(synthesize_media(13, 123))) as wf:
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        assert wf.getnframes() == 123 % 200 + 50
    feats = decode_bmp(synthesize_media(12, 123))
    assert feats["width"] == 123 % 13 + 4
    assert feats["height"] == 12 % 11 + 4


def test_png_decode_reconstructs_all_five_filters():
    """The synthesizer forward-filters scanline y with filter y % 5, so an
    image with h ≥ 5 exercises None/Sub/Up/Average/Paeth; the decoded
    features must match the closed-form generative formulas exactly — any
    filter-reconstruction bug shifts the sums."""
    from ir_analyses_spark.llm.multimodal import decode_png

    for doc_id, n in [(2, 57), (8, 123), (14, 200), (20, 7)]:
        w = n % 11 + 4
        h = doc_id % 9 + 4
        feats = decode_png(synthesize_media(doc_id, n))
        assert (feats["width"], feats["height"]) == (w, h)
        assert feats["px00_r"] == doc_id * 19 % 256
        px = range(w * h)
        assert feats["sum_r"] == sum((doc_id * 19 + p * 3) % 256 for p in px)
        assert feats["sum_g"] == sum((doc_id * 23 + p * 13) % 256 for p in px)
        assert feats["sum_b"] == sum((doc_id * 29 + p * 17) % 256 for p in px)
    assert any((d % 9 + 4) >= 5 for d in (2, 8, 14, 20)), "no Paeth row hit"


def test_png_decode_golden_hand_built():
    """Independent writer: a 2x2 RGB PNG built by hand with zlib, rows
    filtered None then Up — decoded pixels must be exact (top-down, RGB:
    the opposite of BMP's bottom-up BGR)."""
    import struct as _struct
    import zlib as _zlib

    from ir_analyses_spark.llm.multimodal import decode_png

    row0 = bytes([10, 20, 30, 40, 50, 60])
    row1_raw = bytes([15, 25, 35, 45, 55, 65])
    # filter 2 (Up): stored = raw - prior
    row1 = bytes((row1_raw[i] - row0[i]) % 256 for i in range(6))

    def chunk(ctype, data):
        return (
            _struct.pack(">I", len(data)) + ctype + data
            + _struct.pack(">I", _zlib.crc32(ctype + data))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(b"\x00" + row0 + b"\x02" + row1))
        + chunk(b"IEND", b"")
    )
    feats = decode_png(png)
    assert (feats["width"], feats["height"]) == (2, 2)
    assert feats["px00_r"] == 10  # top-left R, top-down row order
    assert feats["sum_r"] == 10 + 40 + 15 + 45
    assert feats["sum_g"] == 20 + 50 + 25 + 55
    assert feats["sum_b"] == 30 + 60 + 35 + 65


def test_png_decode_rejects_unsupported_shapes():
    import struct as _struct
    import zlib as _zlib

    from ir_analyses_spark.llm.multimodal import decode_png

    def chunk(ctype, data):
        return (
            _struct.pack(">I", len(data)) + ctype + data
            + _struct.pack(">I", _zlib.crc32(ctype + data))
        )

    # grayscale (color type 0) must gate, not mis-decode
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(b"\x00\x01\x02"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit RGB"):
        decode_png(png)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_jpeg_roundtrip_matches_generative_formulas():
    """Constant-tile JPEGs with unit quant must round-trip bit-exactly:
    sums over the YCbCr planes equal 64× the per-tile formula values, for
    single- and multi-tile images (multi-tile → nonzero DC diffs, so the
    DPCM + Huffman path is exercised, not just the first block)."""
    from ir_analyses_spark.llm.multimodal import decode_jpeg

    for doc_id, n in [(3, 57), (9, 123), (15, 200), (21, 8)]:
        tx, ty = n % 3 + 1, doc_id % 3 + 1
        feats = decode_jpeg(synthesize_media(doc_id, n))
        assert (feats["width"], feats["height"]) == (8 * tx, 8 * ty)
        assert feats["px00_r"] == doc_id * 37 % 256
        tiles = range(tx * ty)
        assert feats["sum_r"] == 64 * sum((doc_id * 37 + t * 29) % 256 for t in tiles)
        assert feats["sum_g"] == 64 * sum((doc_id * 41 + t * 31) % 256 for t in tiles)
        assert feats["sum_b"] == 64 * sum((doc_id * 43 + t * 37) % 256 for t in tiles)
    assert any((n % 3 + 1) * (d % 3 + 1) > 1 for d, n in [(3, 57), (9, 123), (15, 200), (21, 8)])


def test_jpeg_ac_coefficients_run_lengths_and_zrl():
    """The decoder's AC path (run/size symbols, ZRL, EOB mid-block) against
    an independently computed float IDCT: encode a block with scattered AC
    coefficients — including one placed after >16 zeros to force a ZRL —
    and compare every reconstructed pixel."""
    import math

    import numpy as np

    from ir_analyses_spark.llm.multimodal import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    block = np.zeros(64, np.int64)
    block[0] = 8 * (200 - 128)  # DC
    block[1] = 40              # (0,1) — early AC
    block[3 * 8 + 2] = -25     # mid-block
    block[7 * 8 + 6] = 13      # deep AC: long zero run in zigzag → ZRL
    jpg = encode_jpeg_baseline(8, 8, [[block]])
    feats = decode_jpeg(jpg)

    # independent reconstruction: textbook 2-D IDCT double loop
    def alpha(u):
        return math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)

    want = np.zeros((8, 8))
    s = block.reshape(8, 8)
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    acc += (
                        alpha(u) * alpha(v) * s[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            want[x, y] = acc
    want = np.clip(np.rint(want + 128.0), 0, 255).astype(np.int64)
    assert feats["sum_r"] == int(want.sum())
    assert feats["px00_r"] == int(want[0, 0])


def test_jpeg_byte_stuffing_roundtrip():
    """A tile value whose entropy coding emits 0xFF bytes must round-trip
    through write-side stuffing and read-side unstuffing. Brute-force a
    range of constant tiles — every one must reconstruct exactly."""
    import numpy as np

    from ir_analyses_spark.llm.multimodal import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    for val in range(0, 256, 7):
        block = np.zeros(64, np.int64)
        block[0] = 8 * (val - 128)
        feats = decode_jpeg(encode_jpeg_baseline(8, 8, [[block]]))
        assert feats["sum_r"] == 64 * val, val


def test_jpeg_skips_app_segments():
    """Real-world JPEGs open with APP0/COM metadata segments; the decoder
    must skip any marker it doesn't consume. Splice a JFIF APP0 and a
    comment into a synthesized file — decode must be unchanged."""
    import struct as _struct

    from ir_analyses_spark.llm.multimodal import decode_jpeg

    plain = synthesize_media(9, 57)
    app0 = _struct.pack(">HH", 0xFFE0, 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = _struct.pack(">HH", 0xFFFE, 2 + 11) + b"hello jpeg!"
    spliced = plain[:2] + app0 + com + plain[2:]
    assert decode_jpeg(spliced) == decode_jpeg(plain)


def test_jpeg_rejects_unsupported_shapes():
    from ir_analyses_spark.llm.multimodal import decode_jpeg

    # progressive (SOF2) must gate, not mis-decode
    import struct as _struct

    sof2 = (
        b"\xff\xd8"
        + _struct.pack(">HH", 0xFFC2, 11)
        + _struct.pack(">BHHB", 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(sof2)
    with pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")


def test_jpeg_property_roundtrip_random_coefficient_blocks():
    """Property: ANY valid quantized coefficient block the encoder can
    express must survive encode→decode with the exact IDCT pixels (the
    encoder and decoder share no entropy/marker code, so this fuzzes the
    Huffman table derivation, DPCM, run-length coding and bit I/O against
    each other across the whole coefficient space, not just DC)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from ir_analyses_spark.llm.multimodal import (
        _idct_basis,
        decode_jpeg,
        encode_jpeg_baseline,
    )

    basis = _idct_basis()

    coef_entry = st.tuples(
        st.integers(min_value=0, max_value=63),
        st.integers(min_value=-1024, max_value=1016),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        blocks=st.lists(
            st.lists(coef_entry, min_size=0, max_size=8),
            min_size=1,
            max_size=4,
        )
    )
    def run(blocks):
        comp = []
        for entries in blocks:
            b = np.zeros(64, np.int64)
            for idx, v in entries:
                b[idx] = v
            comp.append(b)
        jpg = encode_jpeg_baseline(8 * len(comp), 8, [comp])
        feats = decode_jpeg(jpg)
        total = 0
        first = None
        for b in comp:
            pix = basis.T @ b.reshape(8, 8).astype(float) @ basis + 128.0
            pix = np.clip(np.rint(pix), 0, 255).astype(np.int64)
            if first is None:
                first = int(pix[0, 0])
            total += int(pix.sum())
        assert feats["sum_r"] == total
        assert feats["px00_r"] == first
        assert (feats["width"], feats["height"]) == (8 * len(comp), 8)

    run()


def test_corpus_is_ascii():
    """The media oracles slice text in the CHAR domain (DuckDB cannot
    substring BLOBs) while the operators slice BYTES; they agree only for
    ASCII text. Check the assumption on every scale dir so a non-ASCII
    testdata regeneration fails HERE with an explanation, not as an
    unexplained hash mismatch (see llm/multimodal.py MEDIA_RESIZE_SQL)."""
    import glob as _glob

    import duckdb

    con = duckdb.connect()
    for path in sorted(_glob.glob("/root/testdata/sf*/documents.parquet")):
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{path}') "
            "WHERE OCTET_LENGTH(ENCODE(text)) <> LENGTH(text)"
        ).fetchone()
        assert n == 0, f"{path}: {n} non-ASCII documents break the media oracles"


def test_gif_roundtrip_matches_generative_formulas():
    """The hand-rolled LZW encoder and the independent decoder must agree
    with the closed-form palette math; payload sizes force dictionary
    strings, KwKwK codes, and at least one width bump."""
    from ir_analyses_spark.llm.multimodal import decode_gif

    for doc_id, n in [(4, 57), (10, 123), (16, 200), (22, 7)]:
        w, h = n % 10 + 4, doc_id % 7 + 4
        feats = decode_gif(synthesize_media(doc_id, n))
        assert feats["media_kind"] == "gif"
        assert (feats["width"], feats["height"]) == (w, h)
        px = range(w * h)
        assert feats["px00_r"] == (doc_id * 11 + (doc_id % 16) * 37) % 256
        assert feats["sum_r"] == sum(
            (doc_id * 11 + ((doc_id + p * 7) % 16) * 37) % 256 for p in px
        )
        assert feats["sum_g"] == sum(
            (doc_id * 13 + ((doc_id + p * 7) % 16) * 41) % 256 for p in px
        )
        assert feats["sum_b"] == sum(
            (doc_id * 17 + ((doc_id + p * 7) % 16) * 43) % 256 for p in px
        )


def test_gif_lzw_kwkwk_and_width_growth():
    """LZW edge cases, unit level: a run of one repeated symbol forces the
    KwKwK (code == table size) path immediately; a long mixed stream
    crosses the 32- and 64-code boundaries, so encoder and decoder must
    bump code width on the same per-code counter (a table-length-keyed
    bump desyncs here)."""
    from ir_analyses_spark.llm.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    run = [3] * 50
    assert _gif_lzw_decode(_gif_lzw_encode(run, 4), 4, len(run)) == run
    mixed = [(p * p + 3 * p) % 16 for p in range(400)]
    assert _gif_lzw_decode(_gif_lzw_encode(mixed, 4), 4, len(mixed)) == mixed


def test_gif_decoder_skips_extension_blocks():
    """A GIF89a with a graphic-control extension before the image
    descriptor (the layout real encoders emit) must decode identically —
    the block walk has to skip extensions by sub-block framing."""
    import struct

    raw = synthesize_media(4, 57)
    head_end = 13 + 48  # header+LSD + 16-entry GCT
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = raw[:head_end] + gce + raw[head_end:]
    from ir_analyses_spark.llm.multimodal import decode_gif

    assert decode_gif(with_ext) == decode_gif(raw)


def test_mp4_metadata_roundtrip_matches_formulas():
    """The hand-rolled ISO-BMFF writer and the independent box-walk
    decoder must agree with the closed-form formulas across every branch
    of the MP4 synthesis: all four fourccs, 1- and 2-track layouts, and
    varying timescale/duration/dims. (doc_id % 6 == 5 forces odd ids, so
    the formulas deliberately key on doc_id // 2 and doc_id // 6 — this
    loop's ids cover each resulting value.)"""
    from ir_analyses_spark.llm.multimodal import decode_mp4

    seen_fourcc, seen_tracks = set(), set()
    for doc_id, n in [(5, 57), (11, 123), (17, 200), (23, 8), (29, 77), (35, 3)]:
        feats = decode_mp4(synthesize_media(doc_id, n))
        fourcc = ["avc1", "hev1", "vp09", "av01"][(doc_id // 2) % 4]
        assert feats["media_kind"] == f"mp4:{fourcc}"
        assert feats["width"] == 16 * (doc_id % 8 + 1)
        assert feats["height"] == 16 * (n % 6 + 1)
        assert feats["sample_rate"] == 600 * (doc_id % 5 + 1)
        assert feats["n_samples"] == (doc_id * 97 + n * 31) % 100000
        assert feats["peak"] == (doc_id // 6) % 2 + 1
        assert feats["px00_r"] is None and feats["sum_abs"] is None
        seen_fourcc.add(fourcc)
        seen_tracks.add(feats["peak"])
    assert seen_fourcc == {"avc1", "hev1", "vp09", "av01"}  # vacuity guard
    assert seen_tracks == {1, 2}


def _fullbox(version: int) -> bytes:
    return bytes([version, 0, 0, 0])


def test_mp4_golden_hand_built_v1_largesize_audio_first():
    """Independent fixture exercising every decoder path the synthesizer's
    version-0 writer does NOT: a 64-bit largesize ftyp, a free box before
    moov, version-1 mvhd (64-bit timestamps), the audio trak FIRST (the
    handler walk must skip it), and a version-1 tkhd on the video trak."""
    import struct

    from ir_analyses_spark.llm.multimodal import decode_mp4

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    def largebox(btype, payload):
        return b"\x00\x00\x00\x01" + btype + struct.pack(">Q", 16 + len(payload)) + payload

    matrix = b"\x00" * 36
    mvhd = box(
        b"mvhd",
        _fullbox(1)
        + struct.pack(">QQIQ", 7, 7, 48000, 123456789)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10 + matrix + b"\x00" * 24 + struct.pack(">I", 3),
    )

    def trak(handler, fourcc, w, h, tkhd_version):
        if tkhd_version == 0:
            tkhd = box(
                b"tkhd",
                _fullbox(0) + struct.pack(">IIIII", 0, 0, 1, 0, 99)
                + b"\x00" * 8 + b"\x00" * 8 + matrix
                + struct.pack(">II", w << 16, h << 16),
            )
        else:
            tkhd = box(
                b"tkhd",
                _fullbox(1) + struct.pack(">QQIIQ", 0, 0, 2, 0, 99)
                + b"\x00" * 8 + b"\x00" * 8 + matrix
                + struct.pack(">II", w << 16, h << 16),
            )
        hdlr = box(b"hdlr", _fullbox(0) + b"\x00" * 4 + handler + b"\x00" * 12)
        entry = box(fourcc, b"\x00" * 78)
        stsd = box(b"stsd", _fullbox(0) + struct.pack(">I", 1) + entry)
        mdia = box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsd)))
        return box(b"trak", tkhd + mdia)

    mp4 = (
        largebox(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"isom")
        + box(b"free", b"skip me")
        + box(
            b"moov",
            mvhd
            + trak(b"soun", b"mp4a", 0, 0, 0)
            + trak(b"vide", b"hvc1", 1920, 1080, 1),
        )
    )
    feats = decode_mp4(mp4)
    assert feats["media_kind"] == "mp4:hvc1"
    assert (feats["width"], feats["height"]) == (1920, 1080)
    assert feats["sample_rate"] == 48000
    assert feats["n_samples"] == 123456789
    assert feats["peak"] == 2


def test_mp4_rejects_malformed_and_gates_audio_only():
    import struct

    import pytest as _pytest

    from ir_analyses_spark.llm.multimodal import decode_mp4, encode_mp4_meta

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    with _pytest.raises(ValueError, match="moov"):
        decode_mp4(box(b"ftyp", b"isom") + box(b"mdat", b"x"))
    # box claiming to extend past the buffer must fail loudly
    with _pytest.raises(ValueError, match="box size"):
        decode_mp4(struct.pack(">I", 4096) + b"moov" + b"\x00" * 8)
    # audio-only container: honest gate, not a fake video row
    audio_only = encode_mp4_meta(
        8000, 100, [{"handler": b"soun", "fourcc": b"mp4a", "width": 0, "height": 0}]
    )
    with _pytest.raises(NotImplementedError, match="video track"):
        decode_mp4(audio_only)


def test_mp4_duration_past_int32_and_writer_timescale_guard():
    """ADVICE r5: v0 mvhd durations go up to 0xFFFFFFFF (the "unknown"
    sentinel) and v1 durations are 64-bit, so n_samples must survive
    values past int32 (MEDIA_CODEC_SCHEMA declares it bigint); and the
    version-0 writer must refuse timescales its 16.16 samplerate field
    cannot represent instead of raising struct.error."""
    import pytest as _pytest

    from ir_analyses_spark.llm.multimodal import decode_mp4, encode_mp4_meta

    sentinel = 0xFFFFFFFF  # v0 "duration unknown" — 4294967295 > 2**31-1
    mp4 = encode_mp4_meta(
        3000,
        sentinel,
        [{"handler": b"vide", "fourcc": b"avc1", "width": 64, "height": 48}],
    )
    feats = decode_mp4(mp4)
    assert feats["n_samples"] == sentinel
    # 90 kHz is unrepresentable in the 16.16 AUDIO samplerate field —
    # the writer must fail loudly for audio tracks, not corrupt...
    for bad in (90000, 65536):
        with _pytest.raises(ValueError, match="16.16"):
            encode_mp4_meta(
                bad,
                100,
                [{"handler": b"soun", "fourcc": b"mp4a", "width": 0, "height": 0}],
            )
    # ...but 90 kHz is the STANDARD timescale for video-only files
    # (mvhd/mdhd store it as a plain u32) — those must keep encoding
    # (review-caught over-rejection)
    vid90k = encode_mp4_meta(
        90000,
        270000,
        [{"handler": b"vide", "fourcc": b"avc1", "width": 32, "height": 16}],
    )
    feats = decode_mp4(vid90k)
    assert feats["sample_rate"] == 90000 and feats["n_samples"] == 270000
    # non-u32 timescales are invalid for ANY track mix
    for bad in (0, -1, 2**32):
        with _pytest.raises(ValueError, match="u32"):
            encode_mp4_meta(
                bad,
                100,
                [{"handler": b"vide", "fourcc": b"avc1", "width": 8, "height": 8}],
            )
