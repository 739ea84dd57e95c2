"""Multimodal columns (SURVEY §2B LLM ext): media as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side plumbing — binary payload column, metadata struct schema,
batch-iterator UDF signature, partition sizing — is real and tested. The
codec layer is split by what this container can honestly run:

- **Real codecs** (``media_codec_features``): BMP (24-bit uncompressed,
  struct header parse + numpy pixel math, bottom-up row flip + 4-byte row
  padding), WAV (RIFF/PCM via the stdlib ``wave`` parser + numpy), PNG
  (8-bit RGB: chunk walk, zlib inflate, full scanline unfiltering — all
  five filter types None/Sub/Up/Average/Paeth — pure stdlib + numpy), and
  baseline JPEG (SOF0 marker walk, DQT/DHT table build, Huffman + DC-DPCM
  + AC run/size entropy decode, dequantize, de-zigzag, float IDCT — pure
  stdlib + numpy). All decode *genuine* files of their format; the DuckDB
  oracle recomputes the expected features analytically from the
  generative formula — a true differential check of the parser (a wrong
  offset, padding, endianness, row order, filter reconstruction, Huffman
  table or coefficient ordering diverges the hash).
- **Real container metadata** (``decode_mp4``): ISO-BMFF/MP4 box walk —
  ftyp dispatch, moov/mvhd timescale+duration (versions 0 and 1, 32- and
  64-bit box sizes), per-trak tkhd dimensions (16.16 fixed point), hdlr
  handler routing, stsd codec fourcc. Pure stdlib ``struct``; the
  generative twin (``encode_mp4_meta``) shares no parsing code.
- **Stubbed codecs** (ffmpeg-class SAMPLE decode — MP4 frame data, MP3
  audio…): no av libraries in this container, so past container metadata
  ``decode_media`` raises NotImplementedError; ``fake_decode_features``
  is the deterministic stand-in those paths' tests and oracle use.
  Swapping in a real decoder changes one function body, no plumbing.
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


def decode_bmp(content: bytes) -> dict:
    """REAL BMP decoder (24-bit uncompressed): struct header parse + numpy
    pixel math. Handles the two format quirks that make BMP a genuine
    parsing exercise — rows are stored bottom-up and padded to 4 bytes —
    and emits order-sensitive (top-left pixel) plus order-insensitive
    (channel sums) features so both kinds of bugs are observable."""
    import struct

    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", content, 10)
    size, w, h, planes, bpp = struct.unpack_from("<IiihH", content, 14)
    if size != 40 or planes != 1 or bpp != 24:
        raise NotImplementedError("only BITMAPINFOHEADER 24bpp supported")
    row_bytes = (3 * w + 3) // 4 * 4
    raw = np.frombuffer(content, np.uint8, count=h * row_bytes, offset=pix_off)
    # bottom-up rows -> flip; strip padding; BGR channel order
    img = raw.reshape(h, row_bytes)[::-1, : 3 * w].reshape(h, w, 3)
    sums = img.astype(np.int64).sum(axis=(0, 1))
    return {
        "media_kind": "bmp",
        "width": int(w),
        "height": int(h),
        "px00_r": int(img[0, 0, 2]),
        "sum_r": int(sums[2]),
        "sum_g": int(sums[1]),
        "sum_b": int(sums[0]),
        "sample_rate": None,
        "n_samples": None,
        "sum_abs": None,
        "peak": None,
    }


def decode_wav(content: bytes) -> dict:
    """REAL WAV decoder: stdlib ``wave`` (an independent RIFF/PCM parser —
    not the writer below) + numpy sample math. int64 cast before abs so
    -32768 doesn't overflow int16."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content)) as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise NotImplementedError("only 16-bit mono PCM supported")
        rate = wf.getframerate()
        n = wf.getnframes()
        samples = np.frombuffer(wf.readframes(n), dtype="<i2").astype(np.int64)
    return {
        "media_kind": "wav",
        "width": None,
        "height": None,
        "px00_r": None,
        "sum_r": None,
        "sum_g": None,
        "sum_b": None,
        "sample_rate": int(rate),
        "n_samples": int(n),
        "sum_abs": int(np.abs(samples).sum()),
        "peak": int(np.abs(samples).max()),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> dict:
    """REAL PNG decoder (8-bit RGB, non-interlaced): chunk walk → IDAT
    concatenation → zlib inflate → per-scanline unfiltering of all five
    PNG filter types (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) — pure
    stdlib ``zlib``/``struct`` + numpy, ~60 LoC, no PIL. Emits the same
    image feature shape as ``decode_bmp`` (note PNG rows are top-down and
    RGB, where BMP is bottom-up BGR — a decoder that confuses the two
    flips px00_r). Filters 0/2 reconstruct vectorized; 1/3/4 need the
    per-byte left-neighbor recurrence."""
    import struct
    import zlib

    import numpy as np

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit RGB non-interlaced PNG supported"
                )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = 3 * w
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    pos2 = 0
    for y in range(h):
        ftype = raw[pos2]
        line = np.frombuffer(raw, np.uint8, stride, pos2 + 1).astype(np.int64)
        pos2 += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                a = cur[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, 3)
    sums = img.astype(np.int64).sum(axis=(0, 1))
    return {
        "media_kind": "png",
        "width": int(w),
        "height": int(h),
        "px00_r": int(img[0, 0, 0]),
        "sum_r": int(sums[0]),
        "sum_g": int(sums[1]),
        "sum_b": int(sums[2]),
        "sample_rate": None,
        "n_samples": None,
        "sum_abs": None,
        "peak": None,
    }



def _gif_lzw_decode(data: bytes, mcs: int, n_px: int) -> list[int]:
    """GIF-variant LZW decode: LSB-first variable-width codes, clear/end
    control codes, KwKwK handling. Code WIDTH tracks a per-received-code
    counter (giflib's RunningCode), NOT the table length — the decoder's
    table lags the encoder's registrations by exactly one code, so a
    length-keyed bump would change width one code too late and desync the
    stream at every 2^w boundary."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    counter = end + 1
    acc = nbits = pos = 0
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = mcs + 1
            counter = end + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None and code < 4096:
            entry = prev + (prev[0],)  # KwKwK: code registered but unseen
        else:
            raise ValueError(f"corrupt LZW code {code}")
        # stop registering at 4096 entries, mirroring the encoder's
        # next_reg < 4096 gate: real-world encoders emit deferred-clear
        # streams that simply stop registering once the table is full, and
        # a decoder table that kept growing would loosen the
        # code == len(table) KwKwK check into accepting phantom codes from
        # a corrupt external stream
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
        out.extend(entry)
        prev = entry
        counter += 1
        if counter == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_px:
            break
    return out[:n_px]


def _gif_lzw_encode(indices, mcs: int) -> bytes:
    """GIF-variant LZW encode (the independent twin of the decoder above —
    real dictionary compression, not the uncompressed-GIF trick): width
    bumps on the same per-emitted-code counter the decoder uses."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_reg = end + 1
    counter = end + 1
    acc = nbits = 0
    out = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def emit(code: int) -> None:
        nonlocal counter, width
        put(code)
        counter += 1
        if counter == (1 << width) and width < 12:
            width += 1

    put(clear)
    buf: tuple[int, ...] = ()
    for k in indices:
        nk = buf + (int(k),)
        if nk in table:
            buf = nk
            continue
        emit(table[buf])
        if next_reg < 4096:
            table[nk] = next_reg
            next_reg += 1
        else:  # table full: reset (payloads here never reach this)
            put(clear)
            table = {(i,): i for i in range(clear)}
            next_reg = end + 1
            counter = end + 1
            width = mcs + 1
        buf = (int(k),)
    if buf:
        emit(table[buf])
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(content: bytes) -> dict:
    """REAL GIF decoder (87a/89a, non-interlaced): logical-screen +
    color-table parse, extension-block skip, sub-block reassembly, full
    variable-width LZW decompression (``_gif_lzw_decode``), palette
    lookup to RGB. Pure stdlib ``struct`` + numpy — the palette
    indirection makes GIF the one format here whose pixel values are
    defined by a lookup table rather than stored channels."""
    import struct

    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(
            content, np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    while True:
        b0 = content[pos]
        pos += 1
        if b0 == 0x3B:
            raise ValueError("GIF trailer before any image data")
        if b0 == 0x21:  # extension: label byte, then sub-blocks
            pos += 1
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise NotImplementedError(f"unexpected GIF block 0x{b0:02x}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                content, np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        mcs = content[pos]
        pos += 1
        data = bytearray()
        while content[pos]:
            ln = content[pos]
            data += content[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        break
    if palette is None:
        raise ValueError("GIF image without a color table")
    idx = np.array(_gif_lzw_decode(bytes(data), mcs, w * h), dtype=np.int64)
    if idx.size != w * h or idx.max(initial=0) >= len(palette):
        raise ValueError("GIF index stream does not cover the image")
    img = palette[idx].astype(np.int64)  # (n_px, 3) RGB rows top-down
    sums = img.sum(axis=0)
    return {
        "media_kind": "gif",
        "width": int(w),
        "height": int(h),
        "px00_r": int(img[0, 0]),
        "sum_r": int(sums[0]),
        "sum_g": int(sums[1]),
        "sum_b": int(sums[2]),
        "sample_rate": None,
        "n_samples": None,
        "sum_abs": None,
        "peak": None,
    }


def _zigzag_order() -> list[int]:
    """The JPEG zigzag scan as (row, col) → natural index, generated
    algorithmically (diagonal walk) rather than hand-typed."""
    order = []
    r = c = 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


_ZIGZAG = _zigzag_order()


def _idct_basis():
    """Orthonormal 8-point DCT basis A (A[u,x] = α(u)·cos((2x+1)uπ/16));
    2-D inverse is Aᵀ·S·A. A DC-only block yields the constant S00/8
    exactly, which is what makes the constant-tile payloads lossless."""
    import math

    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        alpha = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            a[u, x] = alpha * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # skip the stuffing zero
            self.bitbuf = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_table(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman (length, code) → symbol map from a DHT segment's
    BITS/HUFFVAL arrays."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map ``size`` magnitude bits to the signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes) -> dict:
    """REAL baseline JPEG decoder (SOF0, 8-bit, 1×1 sampling): marker walk
    → quant/Huffman table build → MCU entropy decode (DC DPCM + AC
    run/size with EOB/ZRL) → dequantize → de-zigzag → float IDCT → plane
    assembly. Pure stdlib + numpy, no PIL. General over any DQT/DHT the
    file declares; gates honestly on progressive/subsampled inputs.

    Features report the YCbCr sample planes (px00_r/sum_r ← luma Y,
    sum_g ← Cb, sum_b ← Cr): the terminal RGB conversion is a fixed
    affine map left out so payloads built from constant 8×8 tiles with
    unit quant tables round-trip bit-exactly — the property the
    closed-form oracle checks."""
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    w = h = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
    data_start = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = __import__("struct").unpack_from(">H", content, pos + 2)
        seg = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                if seg[i] >> 4 != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tq = seg[i] & 0x0F
                zz = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int64)
                nat = np.zeros(64, np.int64)
                nat[_ZIGZAG] = zz
                qt[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                huff[(tc, th)] = _huff_decode_table(
                    bits, seg[i + 17 : i + 17 + n]
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            for ci in range(nc):
                cid, sampling, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError(
                        "only 1x1 (4:4:4) sampling supported"
                    )
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("only baseline SOF0 JPEG supported")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {cid: idx for idx, (cid, _tq) in enumerate(comps)}
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                scan.append((by_id[cid], tabs >> 4, tabs & 0x0F))
            data_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if w is None or data_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    end = content.rfind(b"\xff\xd9")
    if end < data_start:
        raise ValueError("JPEG missing EOI")
    reader = _BitReader(content[data_start:end])

    def read_symbol(table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | reader.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    basis = _idct_basis()
    bx, by = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((by * 8, bx * 8), np.int64) for _ in comps]
    pred = [0] * len(comps)
    for mcu in range(bx * by):
        ty, tx = divmod(mcu, bx)
        for ci, dc_id, ac_id in scan:
            coef = np.zeros(64, np.int64)
            s = read_symbol(huff[(0, dc_id)])
            pred[ci] += _extend(reader.bits(s), s)
            coef[0] = pred[ci]
            k = 1
            while k < 64:
                sym = read_symbol(huff[(1, ac_id)])
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL: sixteen zeros
                    k += 16
                    continue
                k += sym >> 4
                if k > 63:
                    raise ValueError("AC coefficient index out of range")
                coef[_ZIGZAG[k]] = _extend(reader.bits(sym & 0x0F), sym & 0x0F)
                k += 1
            block = (coef * qt[comps[ci][1]]).reshape(8, 8).astype(float)
            pix = basis.T @ block @ basis + 128.0
            pix = np.clip(np.rint(pix), 0, 255).astype(np.int64)
            planes[ci][ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8] = pix
    y = planes[0][:h, :w]
    cb = planes[1][:h, :w] if len(planes) > 1 else None
    cr = planes[2][:h, :w] if len(planes) > 2 else None
    return {
        "media_kind": "jpeg",
        "width": int(w),
        "height": int(h),
        "px00_r": int(y[0, 0]),
        "sum_r": int(y.sum()),
        "sum_g": int(cb.sum()) if cb is not None else None,
        "sum_b": int(cr.sum()) if cr is not None else None,
        "sample_rate": None,
        "n_samples": None,
        "sum_abs": None,
        "peak": None,
    }


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the ISO-BMFF box
    sequence in ``buf[start:end]``, handling the three size encodings the
    spec allows: plain 32-bit, ``size == 1`` + 64-bit largesize, and
    ``size == 0`` (box extends to the end of the enclosing scope)."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated ISO-BMFF largesize header")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed ISO-BMFF box size")
        yield btype, pos + hdr, pos + size
        pos += size


def _find_box(buf: bytes, start: int, end: int, btype: bytes):
    """(payload_start, payload_end) of the first child box of ``btype``
    in the scope, or None."""
    for t, s, e in _walk_boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


def decode_mp4(content: bytes) -> dict:
    """REAL ISO-BMFF/MP4 METADATA decoder: top-level box walk → moov →
    mvhd movie timescale + duration (FullBox versions 0 AND 1 — v1 widens
    the timestamps to 64 bits and shifts every later field), trak count,
    the video trak located by its mdia/hdlr handler ('vide'), its tkhd
    presentation dimensions (16.16 fixed point at version-dependent
    offsets), and the coding fourcc from the first stsd sample entry.
    Pure stdlib ``struct`` — no av library; SAMPLE decode (actual frames)
    stays honestly out of scope in this container.

    Feature mapping into MEDIA_CODEC_SCHEMA: media_kind carries the
    codec (``mp4:<fourcc>``), width/height the video track dims,
    sample_rate ← movie timescale, n_samples ← movie duration (in
    timescale units — BIGINT in the schema, because v1 mvhd durations
    are 64-bit and v0 uses 0xFFFFFFFF as the "unknown" sentinel, both
    past int32), peak ← track count; pixel/audio sums stay NULL — they
    would need sample decode."""
    import struct

    moov = _find_box(content, 0, len(content), b"moov")
    if moov is None:
        raise ValueError("MP4 without a moov box")
    ms, me = moov
    mvhd = _find_box(content, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("moov without mvhd")
    s = mvhd[0]
    version = content[s]
    if version == 0:
        _ct, _mt, timescale, duration = struct.unpack_from(">IIII", content, s + 4)
    elif version == 1:
        _ct, _mt, timescale, duration = struct.unpack_from(">QQIQ", content, s + 4)
    else:
        raise ValueError(f"unknown mvhd version {version}")
    n_tracks = 0
    vid: tuple[int, int, str] | None = None
    for t, ts_, te in _walk_boxes(content, ms, me):
        if t != b"trak":
            continue
        n_tracks += 1
        tkhd = _find_box(content, ts_, te, b"tkhd")
        mdia = _find_box(content, ts_, te, b"mdia")
        if tkhd is None or mdia is None:
            raise ValueError("trak missing tkhd/mdia")
        hdlr = _find_box(content, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            raise ValueError("mdia missing hdlr")
        # hdlr payload: FullBox(4) + pre_defined(4) + handler_type(4)
        if content[hdlr[0] + 8 : hdlr[0] + 12] != b"vide" or vid is not None:
            continue
        tv = content[tkhd[0]]
        if tv not in (0, 1):
            raise ValueError(f"unknown tkhd version {tv}")
        # v0: 4 FullBox + 4+4 times + 4 id + 4 rsvd + 4 dur + 8 rsvd
        #     + 2+2+2+2 layer/group/volume/rsvd + 36 matrix = 76
        # v1: the three 32-bit timestamps widen to 64 → +12
        off = tkhd[0] + (76 if tv == 0 else 88)
        wfx, hfx = struct.unpack_from(">II", content, off)
        minf = _find_box(content, mdia[0], mdia[1], b"minf")
        stbl = _find_box(content, minf[0], minf[1], b"stbl") if minf else None
        stsd = _find_box(content, stbl[0], stbl[1], b"stsd") if stbl else None
        if stsd is None:
            raise ValueError("video trak missing stsd")
        ss = stsd[0]
        (n_entries,) = struct.unpack_from(">I", content, ss + 4)
        if n_entries < 1:
            raise ValueError("empty stsd sample description")
        # first sample entry: size(4) + coding fourcc(4)
        fourcc = content[ss + 12 : ss + 16].decode("ascii", "replace")
        vid = (wfx >> 16, hfx >> 16, fourcc)
    if vid is None:
        raise NotImplementedError(
            "MP4 without a video track: audio-only sample metadata not "
            "wired in this container"
        )
    return {
        "media_kind": f"mp4:{vid[2]}",
        "width": int(vid[0]),
        "height": int(vid[1]),
        "px00_r": None,
        "sum_r": None,
        "sum_g": None,
        "sum_b": None,
        "sample_rate": int(timescale),
        "n_samples": int(duration),
        "sum_abs": None,
        "peak": int(n_tracks),
    }


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_mp4_meta(timescale: int, duration: int, tracks: list[dict]) -> bytes:
    """Hand-rolled ISO-BMFF writer (the synthesis twin of ``decode_mp4``,
    sharing no parsing code): ftyp + moov(mvhd + trak(tkhd +
    mdia(mdhd + hdlr + minf/stbl/stsd))) + a deterministic mdat stub.
    ``tracks`` entries carry handler (b'vide'/b'soun'), fourcc, width,
    height. Version-0 boxes throughout; the decoder's v1/largesize paths
    are exercised by independently hand-built fixtures in
    tests/test_multimodal_codec.py."""
    import struct

    if not 0 < timescale < 2**32:
        raise ValueError(f"timescale {timescale} outside the mvhd u32 range")
    if timescale >= 65536 and any(t["handler"] == b"soun" for t in tracks):
        # ONLY audio sample entries store samplerate as 16.16 fixed point
        # (timescale << 16 into a u32), which cannot represent rates
        # >= 65536. Refuse loudly rather than emit a struct.error or a
        # silently wrong rate — but don't reject video-only encodes: the
        # common 90 kHz VIDEO timescale is a plain u32 in mvhd/mdhd and
        # perfectly encodable (review-caught over-rejection).
        raise ValueError(
            f"timescale {timescale} outside the 16.16 samplerate range "
            "(1..65535) this version-0 writer can encode for audio tracks"
        )

    matrix = struct.pack(
        ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1),
    )
    traks = b""
    for tid, t in enumerate(tracks, start=1):
        tkhd = _mp4_box(
            b"tkhd",
            b"\x00\x00\x00\x07"  # v0; enabled|in_movie|in_preview
            + struct.pack(">IIIII", 0, 0, tid, 0, duration)
            + b"\x00" * 8
            + struct.pack(
                ">HHHH", 0, 0, 0x0100 if t["handler"] == b"soun" else 0, 0
            )
            + matrix
            + struct.pack(">II", t["width"] << 16, t["height"] << 16),
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
        if t["handler"] == b"vide":
            entry_body = (
                b"\x00" * 6
                + struct.pack(">H", 1)  # data_reference_index
                + b"\x00" * 16
                + struct.pack(">HH", t["width"], t["height"])
                + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
                + b"\x00" * 4
                + struct.pack(">H", 1)  # frame_count
                + b"\x00" * 32  # compressorname
                + struct.pack(">Hh", 24, -1)  # depth, pre_defined
            )
        else:
            entry_body = (
                b"\x00" * 6
                + struct.pack(">H", 1)
                + b"\x00" * 8
                + struct.pack(">HHI", 2, 16, 0)  # channels, samplesize
                + struct.pack(">I", timescale << 16)
            )
        entry = _mp4_box(t["fourcc"], entry_body)
        stsd = _mp4_box(
            b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry
        )
        mdia = _mp4_box(
            b"mdia",
            mdhd + hdlr + _mp4_box(b"minf", _mp4_box(b"stbl", stsd)),
        )
        traks += _mp4_box(b"trak", tkhd + mdia)
    mdat = _mp4_box(
        b"mdat", bytes((timescale + duration + i) % 256 for i in range(16))
    )
    return ftyp + _mp4_box(b"moov", mvhd + traks) + mdat


def decode_media(content: bytes) -> dict:
    """Codec dispatch on magic bytes. BMP, WAV, PNG, baseline JPEG, GIF
    decode for real, and MP4/ISO-BMFF decodes container METADATA for real
    (pure stdlib + numpy); ENTROPY-CODED SAMPLE decode of ffmpeg-class
    formats (MP4 frames, MP3 audio, …) raises NotImplementedError in
    this container — ``fake_decode_features`` is their deterministic
    stand-in. H.264 STREAM HEADERS, however, parse for real:
    `llm/media_h264.py` decodes SPS/PPS/avcC (profile, level,
    geometry, entropy mode) from the public spec, and
    `llm/h264_queries.mp4_h264_headers` routes an MP4 binary column
    through ``find_avcc`` into that parser — use those for video
    triage; only per-frame decode stays out of scope.
    """
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    if content[:8] == _PNG_SIG:
        return decode_png(content)
    if content[:2] == b"\xff\xd8":
        return decode_jpeg(content)
    if content[4:8] == b"ftyp":
        return decode_mp4(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(content)
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


# NB the oracle slices in the CHAR domain (DuckDB cannot substring BLOBs)
# while the operator slices payload BYTES; the two agree only because the
# synthetic corpus is pure ASCII. That assumption is CHECKED, not assumed:
# tests/test_multimodal_codec.py::test_corpus_is_ascii asserts
# octet_length == char_length for every document, so a non-ASCII testdata
# regeneration fails that test with a pointer here instead of surfacing as
# an unexplained hash mismatch. (Same applies to MEDIA_FRAME_SAMPLE_SQL.)
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


#: real-codec feature schema: one row per document, image columns NULL for
#: audio payloads and vice versa
MEDIA_CODEC_SCHEMA = (
    "doc_id bigint, media_kind string, width int, height int, px00_r int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, "
    "sample_rate int, n_samples bigint, sum_abs bigint, peak int"
)


def synthesize_media(doc_id: int, n: int) -> bytes:
    """Deterministic REAL media payload for a document, split by
    ``doc_id % 6``: 0 → 24-bit BMP, 1 → 16-bit mono PCM WAV, 2 → 8-bit RGB
    PNG (scanlines forward-filtered with filter type ``row % 5``, so the
    decoder must reconstruct every PNG filter to round-trip), 3 → baseline
    JPEG built from constant 8×8 YCbCr tiles with unit quant tables (DC
    DPCM + Huffman must round-trip every tile exactly), 4 → GIF89a with a
    16-color global palette and REAL variable-width LZW compression (the
    encoder builds a genuine dictionary; pixel period 16 vs palette 16
    forces multi-symbol strings, KwKwK cases, and two width bumps on
    payloads this size), 5 → MP4/ISO-BMFF (real box layout: ftyp, moov,
    mvhd, trak/tkhd/mdia/hdlr/stbl/stsd — the decoder must walk the
    container to recover timescale, duration, dims, fourcc, track count;
    NB ``% 6 == 5`` forces ODD doc_ids, so the MP4 formulas key on
    ``doc_id // 6`` and ``doc_id // 2`` where plain ``% 2`` / ``% 4``
    would be constant over the subset — the vacuity trap). Every byte
    follows from (doc_id, n) via integer formulas, so the oracle can
    predict the decoded features without parsing — while the Spark path
    must round-trip genuine files. The writers here are hand-rolled
    (struct/RIFF/chunk+CRC/entropy-coded/box byte layout), NOT the
    parsers used by the decode step."""
    import struct

    import numpy as np

    if doc_id % 6 == 0:
        w = n % 13 + 4
        h = doc_id % 11 + 4
        p = np.arange(w * h, dtype=np.int64)
        r = (doc_id * 13 + p * 5) % 256
        g = (doc_id * 17 + p * 11) % 256
        b = (doc_id * 31 + p * 7) % 256
        img = np.stack([b, g, r], axis=1).astype(np.uint8).reshape(h, 3 * w)
        row_bytes = (3 * w + 3) // 4 * 4
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, : 3 * w] = img[::-1]  # BMP stores rows bottom-up
        pix = rows.tobytes()
        return (
            struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                          2835, 2835, 0, 0)
            + pix
        )
    if doc_id % 6 == 1:
        rate = 8000 + (doc_id % 5) * 1000
        cnt = n % 200 + 50
        i = np.arange(cnt, dtype=np.int64)
        data = ((doc_id * 7919 + i * 104729) % 65536 - 32768).astype("<i2").tobytes()
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )
    if doc_id % 6 == 3:
        # baseline JPEG: constant 8×8 tiles in YCbCr; a constant tile's
        # only nonzero coefficient is DC = 8·(value−128), which unit
        # quant + the orthonormal IDCT return bit-exactly
        tiles_x = n % 3 + 1
        tiles_y = doc_id % 3 + 1
        comp_coefs = []
        for mult_dc, mult_t in ((37, 29), (41, 31), (43, 37)):
            blocks = []
            for t in range(tiles_x * tiles_y):
                val = (doc_id * mult_dc + t * mult_t) % 256
                block = np.zeros(64, np.int64)
                block[0] = 8 * (val - 128)
                blocks.append(block)
            comp_coefs.append(blocks)
        return encode_jpeg_baseline(8 * tiles_x, 8 * tiles_y, comp_coefs)
    if doc_id % 6 == 4:
        # GIF89a: 16-color global palette, pixel p -> palette index
        # (doc_id + 7p) % 16, REAL LZW-compressed index stream
        w = n % 10 + 4
        h = doc_id % 7 + 4
        pal = bytearray()
        for i in range(16):
            pal += bytes(
                (
                    (doc_id * 11 + i * 37) % 256,
                    (doc_id * 13 + i * 41) % 256,
                    (doc_id * 17 + i * 43) % 256,
                )
            )
        idx = [(doc_id + p * 7) % 16 for p in range(w * h)]
        lzw = _gif_lzw_encode(idx, 4)
        blocks = bytearray()
        for off in range(0, len(lzw), 255):
            chunk_b = lzw[off : off + 255]
            blocks.append(len(chunk_b))
            blocks += chunk_b
        blocks.append(0)
        return (
            b"GIF89a"
            # GCT present, colres 7, size 3 -> 2^(3+1) = 16 entries
            + struct.pack("<HHBBB", w, h, 0xF3, 0, 0)
            + bytes(pal)
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes((4,))
            + bytes(blocks)
            + b"\x3b"
        )
    if doc_id % 6 == 5:
        # MP4: metadata-bearing container; formulas key on doc_id // 6
        # and doc_id // 2 (see docstring — doc_id is always odd here)
        fourcc = [b"avc1", b"hev1", b"vp09", b"av01"][(doc_id // 2) % 4]
        tracks = [
            {
                "handler": b"vide",
                "fourcc": fourcc,
                "width": 16 * (doc_id % 8 + 1),
                "height": 16 * (n % 6 + 1),
            }
        ]
        if (doc_id // 6) % 2 == 1:
            tracks.append(
                {"handler": b"soun", "fourcc": b"mp4a", "width": 0, "height": 0}
            )
        return encode_mp4_meta(
            600 * (doc_id % 5 + 1), (doc_id * 97 + n * 31) % 100000, tracks
        )
    # PNG: top-down RGB rows, forward-filtered with filter type row % 5
    import zlib

    w = n % 11 + 4
    h = doc_id % 9 + 4
    p = np.arange(w * h, dtype=np.int64)
    rows = (
        np.stack(
            [
                (doc_id * 19 + p * 3) % 256,
                (doc_id * 23 + p * 13) % 256,
                (doc_id * 29 + p * 17) % 256,
            ],
            axis=1,
        )
        .astype(np.uint8)
        .reshape(h, 3 * w)
    )
    stride = 3 * w
    filtered = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = bytes(rows[y])
        ft = y % 5
        filtered.append(ft)
        for x in range(stride):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                q = a + b - c
                qa, qb, qc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if qa <= qb and qa <= qc else (b if qb <= qc else c)
            filtered.append((row[x] - pred) % 256)
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _huff_encode_table(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """Build a flat canonical Huffman table over exactly the symbols a
    scan uses: all codes share length L with 2^L ≥ n+1, so the forbidden
    all-ones code is never assigned. Returns (BITS, HUFFVAL, symbol →
    (code, length)) — a legal DHT any baseline decoder must accept,
    without hand-transcribing the Annex K tables."""
    vals = sorted(symbols)
    length = max(2, (len(vals) + 1 - 1).bit_length())
    bits = [0] * 16
    bits[length - 1] = len(vals)
    enc = {sym: (code, length) for code, sym in enumerate(vals)}
    return bits, bytes(vals), enc


def _dc_category(v: int) -> int:
    return abs(v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def encode_jpeg_baseline(w: int, h: int, comp_coefs: list[list]) -> bytes:
    """Hand-rolled baseline JPEG writer (the synthesis twin of
    ``decode_jpeg``, sharing no parsing code with it): takes per-component
    quantized coefficient blocks (natural order, MCU row-major), derives
    minimal canonical Huffman tables from the symbols actually emitted,
    and writes SOI/DQT(unit)/SOF0(1×1)/DHT/SOS with DC DPCM + AC run/size
    entropy coding (EOB/ZRL included). Unit quant tables mean the decoder
    must reproduce the coefficients exactly."""
    import struct

    import numpy as np

    ncomp = len(comp_coefs)
    n_mcus = len(comp_coefs[0])
    # ---- first pass: collect the DC categories / AC symbols in use ----
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}
    ac_runs: list[list[list[tuple[int, int]]]] = []  # comp→mcu→[(sym, val)]
    dc_diffs: list[list[int]] = []
    for coefs in comp_coefs:
        pred = 0
        diffs, runs_by_mcu = [], []
        for block in coefs:
            blk = np.asarray(block, dtype=np.int64).reshape(64)
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            diffs.append(diff)
            dc_syms.add(_dc_category(diff))
            runs: list[tuple[int, int]] = []
            zz = [int(blk[_ZIGZAG[k]]) for k in range(1, 64)]
            run = 0
            for v in zz:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    runs.append((0xF0, 0))
                    ac_syms.add(0xF0)
                    run -= 16
                size = _dc_category(v)
                runs.append(((run << 4) | size, v))
                ac_syms.add((run << 4) | size)
                run = 0
            if run > 0:
                # EOB covers the trailing zeros (incl. the all-zero-AC
                # case). When the LAST coefficient lands exactly on
                # zigzag position 63 there are no trailing zeros and the
                # spec emits NO EOB — appending one anyway desyncs the
                # next block's DC read (caught by the hypothesis fuzz).
                runs.append((0x00, 0))
            runs_by_mcu.append(runs)
        dc_diffs.append(diffs)
        ac_runs.append(runs_by_mcu)
    dc_bits, dc_vals, dc_enc = _huff_encode_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _huff_encode_table(ac_syms)
    # ---- entropy-coded scan ----
    bw = _BitWriter()
    for mcu in range(n_mcus):
        for ci in range(ncomp):
            diff = dc_diffs[ci][mcu]
            cat = _dc_category(diff)
            code, ln = dc_enc[cat]
            bw.write(code, ln)
            if cat:
                bw.write(_amplitude(diff, cat), cat)
            for sym, v in ac_runs[ci][mcu]:
                code, ln = ac_enc[sym]
                bw.write(code, ln)
                size = sym & 0x0F
                if size:
                    bw.write(_amplitude(v, size), size)
    body = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))
    sof_comps = b"".join(
        bytes([cid + 1, 0x11, 0x00]) for cid in range(ncomp)
    )
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(dc_bits) + dc_vals
        + bytes([0x10]) + bytes(ac_bits) + ac_vals,
    )
    sos_comps = b"".join(bytes([cid + 1, 0x00]) for cid in range(ncomp))
    sos = seg(0xFFDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + body + b"\xff\xd9"


def media_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry for the REAL codec path: synthesize genuine
    BMP/WAV/PNG/JPEG/GIF/MP4 bytes per document (first mapInPandas), then
    parse them back with the real decoders (second mapInPandas — the
    binary column crosses Arrow between the stages, same plumbing a
    production decode pipeline uses). The oracle computes the same
    features from the generative formulas in closed form, so any parser
    defect (padding, row order, endianness, header offsets, PNG filter
    reconstruction, JPEG Huffman/DPCM/zigzag/IDCT handling, LZW width
    bumps, ISO-BMFF box offsets) breaks the match."""
    import pandas as pd

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n")
    )

    def synth(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "content": [
                        synthesize_media(int(d), int(n))
                        for d, n in zip(pdf["doc_id"], pdf["n"])
                    ],
                }
            )

    payload = docs.mapInPandas(synth, "doc_id bigint, content binary")

    def dec(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = [
                {"doc_id": int(d), **decode_media(bytes(c))}
                for d, c in zip(pdf["doc_id"], pdf["content"])
            ]
            yield pd.DataFrame(rows)

    return payload.mapInPandas(dec, MEDIA_CODEC_SCHEMA)


# Closed-form twin of synthesize_media ∘ decode (6-way doc_id % 6 split;
# GIF sums run over palette-mapped indices; MP4 features are direct
# formulas — container metadata needs no per-pixel aggregation): pixel/
# sample index ranges
# materialize from a constant range(0, 256) (superset of every per-doc
# count) filtered per row — max pixels 16*14=224 (BMP) / 14*12=168 (PNG),
# max samples 249, max JPEG tiles 9. JPEG sums are over the YCbCr planes
# (constant per tile → 64× the tile value), see decode_jpeg.
MEDIA_CODEC_FEATURES_SQL = """
WITH base AS (
  SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n FROM documents
),
bmp AS (
  SELECT doc_id, n % 13 + 4 AS w, doc_id % 11 + 4 AS h
  FROM base WHERE doc_id % 6 = 0
),
bmp_feats AS (
  SELECT b.doc_id, 'bmp' AS media_kind,
         CAST(b.w AS INT) AS width, CAST(b.h AS INT) AS height,
         CAST(b.doc_id * 13 % 256 AS INT) AS px00_r,
         CAST(SUM((b.doc_id * 13 + i * 5) % 256) AS BIGINT) AS sum_r,
         CAST(SUM((b.doc_id * 17 + i * 11) % 256) AS BIGINT) AS sum_g,
         CAST(SUM((b.doc_id * 31 + i * 7) % 256) AS BIGINT) AS sum_b,
         CAST(NULL AS INT) AS sample_rate, CAST(NULL AS BIGINT) AS n_samples,
         CAST(NULL AS BIGINT) AS sum_abs, CAST(NULL AS INT) AS peak
  FROM bmp b, UNNEST(range(0, 256)) AS t(i)
  WHERE i < b.w * b.h
  GROUP BY b.doc_id, b.w, b.h
),
wav AS (
  SELECT doc_id, 8000 + (doc_id % 5) * 1000 AS rate, n % 200 + 50 AS cnt
  FROM base WHERE doc_id % 6 = 1
),
wav_feats AS (
  SELECT w.doc_id, 'wav' AS media_kind,
         CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
         CAST(NULL AS INT) AS px00_r,
         CAST(NULL AS BIGINT) AS sum_r, CAST(NULL AS BIGINT) AS sum_g,
         CAST(NULL AS BIGINT) AS sum_b,
         CAST(w.rate AS INT) AS sample_rate,
         CAST(w.cnt AS BIGINT) AS n_samples,
         CAST(SUM(ABS((w.doc_id * 7919 + i * 104729) % 65536 - 32768)) AS BIGINT)
           AS sum_abs,
         CAST(MAX(ABS((w.doc_id * 7919 + i * 104729) % 65536 - 32768)) AS INT)
           AS peak
  FROM wav w, UNNEST(range(0, 256)) AS t(i)
  WHERE i < w.cnt
  GROUP BY w.doc_id, w.rate, w.cnt
),
png AS (
  SELECT doc_id, n % 11 + 4 AS w, doc_id % 9 + 4 AS h
  FROM base WHERE doc_id % 6 = 2
),
png_feats AS (
  SELECT g.doc_id, 'png' AS media_kind,
         CAST(g.w AS INT) AS width, CAST(g.h AS INT) AS height,
         CAST(g.doc_id * 19 % 256 AS INT) AS px00_r,
         CAST(SUM((g.doc_id * 19 + i * 3) % 256) AS BIGINT) AS sum_r,
         CAST(SUM((g.doc_id * 23 + i * 13) % 256) AS BIGINT) AS sum_g,
         CAST(SUM((g.doc_id * 29 + i * 17) % 256) AS BIGINT) AS sum_b,
         CAST(NULL AS INT) AS sample_rate, CAST(NULL AS BIGINT) AS n_samples,
         CAST(NULL AS BIGINT) AS sum_abs, CAST(NULL AS INT) AS peak
  FROM png g, UNNEST(range(0, 256)) AS t(i)
  WHERE i < g.w * g.h
  GROUP BY g.doc_id, g.w, g.h
),
jpg AS (
  SELECT doc_id, n % 3 + 1 AS tx, doc_id % 3 + 1 AS ty
  FROM base WHERE doc_id % 6 = 3
),
gif AS (
  SELECT doc_id, n % 10 + 4 AS w, doc_id % 7 + 4 AS h
  FROM base WHERE doc_id % 6 = 4
),
gif_feats AS (
  SELECT g.doc_id, 'gif' AS media_kind,
         CAST(g.w AS INT) AS width, CAST(g.h AS INT) AS height,
         CAST((g.doc_id * 11 + (g.doc_id % 16) * 37) % 256 AS INT) AS px00_r,
         CAST(SUM((g.doc_id * 11 + ((g.doc_id + i * 7) % 16) * 37) % 256)
              AS BIGINT) AS sum_r,
         CAST(SUM((g.doc_id * 13 + ((g.doc_id + i * 7) % 16) * 41) % 256)
              AS BIGINT) AS sum_g,
         CAST(SUM((g.doc_id * 17 + ((g.doc_id + i * 7) % 16) * 43) % 256)
              AS BIGINT) AS sum_b,
         CAST(NULL AS INT) AS sample_rate, CAST(NULL AS BIGINT) AS n_samples,
         CAST(NULL AS BIGINT) AS sum_abs, CAST(NULL AS INT) AS peak
  FROM gif g, UNNEST(range(0, 256)) AS t(i)
  WHERE i < g.w * g.h
  GROUP BY g.doc_id, g.w, g.h
),
jpg_feats AS (
  SELECT j.doc_id, 'jpeg' AS media_kind,
         CAST(8 * j.tx AS INT) AS width, CAST(8 * j.ty AS INT) AS height,
         CAST(j.doc_id * 37 % 256 AS INT) AS px00_r,
         CAST(64 * SUM((j.doc_id * 37 + i * 29) % 256) AS BIGINT) AS sum_r,
         CAST(64 * SUM((j.doc_id * 41 + i * 31) % 256) AS BIGINT) AS sum_g,
         CAST(64 * SUM((j.doc_id * 43 + i * 37) % 256) AS BIGINT) AS sum_b,
         CAST(NULL AS INT) AS sample_rate, CAST(NULL AS BIGINT) AS n_samples,
         CAST(NULL AS BIGINT) AS sum_abs, CAST(NULL AS INT) AS peak
  FROM jpg j, UNNEST(range(0, 9)) AS t(i)
  WHERE i < j.tx * j.ty
  GROUP BY j.doc_id, j.tx, j.ty
),
mp4_feats AS (
  SELECT doc_id,
         'mp4:' || CASE (doc_id // 2) % 4
                     WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
                     WHEN 2 THEN 'vp09' ELSE 'av01' END AS media_kind,
         CAST(16 * (doc_id % 8 + 1) AS INT) AS width,
         CAST(16 * (n % 6 + 1) AS INT) AS height,
         CAST(NULL AS INT) AS px00_r,
         CAST(NULL AS BIGINT) AS sum_r, CAST(NULL AS BIGINT) AS sum_g,
         CAST(NULL AS BIGINT) AS sum_b,
         CAST(600 * (doc_id % 5 + 1) AS INT) AS sample_rate,
         CAST((doc_id * 97 + n * 31) % 100000 AS BIGINT) AS n_samples,
         CAST(NULL AS BIGINT) AS sum_abs,
         CAST((doc_id // 6) % 2 + 1 AS INT) AS peak
  FROM base WHERE doc_id % 6 = 5
)
SELECT * FROM bmp_feats UNION ALL SELECT * FROM wav_feats
UNION ALL SELECT * FROM png_feats UNION ALL SELECT * FROM jpg_feats
UNION ALL SELECT * FROM gif_feats UNION ALL SELECT * FROM mp4_feats
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "media_resize": media_resize,
    "media_frame_sample": media_frame_sample,
    "media_codec_features": media_codec_features,
}

ORACLES = {
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "media_resize": MEDIA_RESIZE_SQL,
    "media_frame_sample": MEDIA_FRAME_SAMPLE_SQL,
    "media_codec_features": MEDIA_CODEC_FEATURES_SQL,
}
