"""Multimodal column operators: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to a typed metadata struct, keep Spark's row
machinery away from pixel/sample decoding, and run decode / feature
extraction / resize / frame sampling as **Arrow-batched Python**
(``mapInPandas``), so bytes cross the JVM<->Python boundary once per
batch, not once per row.

The codec tiers:
- ``decode_image`` decodes PPM/PGM, BI_RGB 24/32-bit BMP, and 8-bit
  non-interlaced PNG NATIVELY (numpy + stdlib zlib, no imaging
  library) and is golden-image tested; ``image_stats`` runs it through
  the Arrow batch path with per-row corrupt-payload isolation, and
  ``encode_png`` round-trips the compressed tier back out.
- Remaining compressed formats (JPEG/...) fall back to PIL when
  importable and raise NotImplementedError otherwise — the one
  remaining declared gap in this container (no imaging library is
  installable here).
- ``fake_decode`` remains the oracle-checkable pseudo-codec (length,
  md5, byte histogram) used by the driver-checked feature queries,
  since the synthetic fixtures carry text bytes, not pixel data.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Everything a malformed payload can raise inside the native decoders:
# declared-gap fallbacks (NotImplementedError), header validation
# (ValueError), short buffers (IndexError; struct.error — which
# subclasses Exception, NOT ValueError, so it must be listed), and
# arithmetic on zeroed header fields (ZeroDivisionError — decode_audio
# also validates, but the tuple keeps the guarantee even for a decoder
# that forgets). The Arrow batch paths catch exactly this tuple per
# row: a poison-pill payload nulls its own row, never the batch.
DECODE_ERRORS = (
    NotImplementedError,
    ValueError,
    IndexError,
    struct.error,
    ZeroDivisionError,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("meta_lang", StringType()),
        StructField("meta_source", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("byte_histogram", ArrayType(DoubleType())),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque
    media payload with typed metadata (the schema a real image/audio
    table would have)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.col("lang").alias("meta_lang"),
        F.col("source").alias("meta_source"),
    )


def _decode_pnm(payload: bytes):
    """Binary PPM (P6) / PGM (P5): header tokens (width, height, maxval;
    '#' comments allowed) then raw samples. Returns uint8 ndarray of
    shape (h, w, 3) or (h, w)."""
    import numpy as np  # noqa: PLC0415

    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    # tokenize the header: after the magic, three whitespace-separated
    # integers, skipping '#'-to-newline comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster data
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    n = width * height * channels
    data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return data.reshape((height, width, 3) if channels == 3 else (height, width))


def _decode_bmp(payload: bytes):
    """Uncompressed (BI_RGB) 24/32-bit BITMAPINFOHEADER BMP. Rows are
    4-byte aligned and stored bottom-up (top-down when height < 0);
    samples are BGR(A) on disk, returned as RGB uint8 (h, w, 3)."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP supported (bpp={bpp})")
    bottom_up, height = height > 0, abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_offset
    ).reshape(height, row_stride)[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(payload: bytes):
    """Native PNG decoder — stdlib zlib inflate + per-scanline unfilter,
    no imaging library. Supports the formats a training-data pipeline
    actually stores: 8-bit depth, color types 0 (gray), 2 (RGB),
    4 (gray+alpha), 6 (RGBA), all five scanline filters, non-interlaced.
    Palette (type 3), 1/2/4/16-bit depths, and Adam7 interlace raise
    ValueError (DECODE_ERRORS — poison-row isolation upstream).

    Filters None/Up are vectorized; Sub is a per-row cumulative sum over
    the pixel stride; Average/Paeth fall back to the per-byte recurrence
    (inherently sequential — each byte depends on the just-reconstructed
    left neighbor). Correctness-tier throughput: a production 100 TB
    image pipeline would swap in a SIMD decoder behind the same
    ``decode_image`` dispatch; the Spark-side plumbing (Arrow batches,
    poison-row isolation, schema) is identical either way.

    Returns uint8 (h, w) for grayscale or (h, w, channels) otherwise.
    """
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + payload + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth={depth})")
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("IDAT shorter than the scanline geometry")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    at = 0
    for y in range(height):
        f = raw[at]
        line = np.frombuffer(raw, np.uint8, stride, at + 1).copy()
        at += 1 + stride
        if f == 0:  # None
            pass
        elif f == 2:  # Up (uint8 wrap-around IS the mod-256 the spec wants)
            line += prev
        elif f == 1:  # Sub: cumulative sum over the pixel stride
            line = (
                line.reshape(width, channels)
                .cumsum(axis=0, dtype=np.int64)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 3:  # Average
            for i in range(stride):
                a = int(line[i - channels]) if i >= channels else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG scanline filter {f}")
        out[y] = line
        prev = line
    arr = out.reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr


def encode_png(arr) -> bytes:
    """Re-encode a uint8 array ((h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, (h, w, 4) RGBA) as a non-interlaced 8-bit PNG with
    filter-0 scanlines — the stdlib inverse of ``_decode_png``, so
    decode -> transform -> encode round-trips without an imaging
    library (the PNM pair's story, for the compressed tier)."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 0
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        color_type = {2: 4, 3: 2, 4: 6}[a.shape[2]]
    else:
        raise ValueError(f"cannot encode shape {np.shape(arr)} as PNG")
    h, w = a.shape[:2]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scanlines = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------ JPEG (baseline) ---

# Zigzag scan: position k in the entropy-coded coefficient order maps to
# natural (row-major) flat index _ZIGZAG[k] within the 8x8 block.
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# ITU-T T.81 Annex K "typical" luminance Huffman tables (the tables
# every baseline encoder ships): per-code-length counts + symbol values.
_DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_LUMA_VALS = tuple(range(12))
_AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


def _dct_matrix():
    """The orthonormal 8-point DCT-II matrix C (C[u,x] = a(u)·cos((2x+1)uπ/16),
    a(0)=√(1/8), a(u>0)=√(2/8)). T.81's 2-D FDCT (1/4·C(u)C(v)·Σ…) IS this
    orthonormal transform: forward S = C·s·Cᵀ, inverse s = Cᵀ·S·C."""
    import numpy as np  # noqa: PLC0415

    x = np.arange(8, dtype=np.float64)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * np.sqrt(0.25)
    c[0] = np.sqrt(0.125)
    return c


def _build_huffman(bits, vals):
    """Canonical Huffman per T.81 C.2: codes assigned in value order,
    ascending length. Returns {(length, code): symbol}."""
    table, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _extend(v: int, s: int) -> int:
    """T.81 F.12 EXTEND: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


class _BitReader:
    """MSB-first reader over a numpy bit array (the entropy segment is
    unpacked once with np.unpackbits; per-symbol work is then integer
    indexing, which keeps the pure-Python decode loop tolerable)."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        import numpy as np  # noqa: PLC0415

        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        bits = self.bits
        if self.pos + n > len(bits):
            raise ValueError("JPEG entropy stream exhausted mid-symbol")
        v = 0
        for _ in range(n):
            v = (v << 1) | int(bits[self.pos])
            self.pos += 1
        return v

    def decode(self, table) -> int:
        bits, code, length = self.bits, 0, 0
        while length < 17:
            if self.pos >= len(bits):
                raise ValueError("JPEG entropy stream exhausted mid-code")
            code = (code << 1) | int(bits[self.pos])
            self.pos += 1
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _decode_jpeg(payload: bytes):
    """Native baseline JFIF decoder — numpy + stdlib only, no imaging
    library: segment walk (DQT/SOF0/DHT/SOS/DRI), canonical Huffman
    entropy decode with byte-unstuffing and RSTn restart handling,
    dequantize through the zigzag map, orthonormal IDCT, level shift,
    chroma upsample (sample replication) and JFIF YCbCr->RGB for
    3-component scans. Grayscale returns (h, w); color (h, w, 3).

    Baseline sequential only: progressive (SOF2), arithmetic coding,
    12-bit precision, and 4-component scans raise ValueError into the
    DECODE_ERRORS poison-row isolation. Correctness-tier throughput,
    same story as ``_decode_png``: a production deployment swaps a SIMD
    codec behind the same ``decode_image`` dispatch; golden tests pin
    this implementation against an independent IDCT and (when PIL is
    importable) against libjpeg output."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None  # (height, width, [(cid, h, v, tq), ...])
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:  # optional fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI before any scan
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, at + 1).astype(np.int32)
                nat = np.empty(64, np.int32)
                nat[list(_ZIGZAG)] = zz
                qtables[tq] = nat
                at += 65
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0x0F
                bits = list(body[at + 1 : at + 17])
                n = sum(bits)
                vals = list(body[at + 17 : at + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, vals)
                at += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline DCT
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError(f"only 8-bit JPEG supported (got {precision})")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (height, width, comps)
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise ValueError("only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_tables = {}
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            data_at = pos + 2 + seg_len
            return _decode_jpeg_scan(
                payload, data_at, frame, scan_tables, qtables, huff,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOS scan")


def _decode_jpeg_scan(
    payload, data_at, frame, scan_tables, qtables, huff, restart_interval
):
    import numpy as np  # noqa: PLC0415

    height, width, comps = frame
    # split entropy data into restart segments, removing 0xFF00 stuffing
    segments, cur, i = [], bytearray(), data_at
    while i < len(payload):
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker: end of scan
            break
    segments.append(bytes(cur))

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    dctm = _dct_matrix()
    planes, quants, tabs = [], [], []
    for cid, h, v, tq in comps:
        planes.append(np.zeros((8 * v * mcus_y, 8 * h * mcus_x), np.float64))
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
        quants.append(qtables[tq].reshape(8, 8).astype(np.float64))
        td, ta = scan_tables.get(cid, (0, 0))
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("missing Huffman table for scan component")
        tabs.append((huff[(0, td)], huff[(1, ta)]))

    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    coef = np.empty(64, np.float64)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG truncated before final restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (_, h, v, _) in enumerate(comps):
            dc_tab, ac_tab = tabs[ci]
            for by in range(v):
                for bx in range(h):
                    coef[:] = 0.0
                    s = reader.decode(dc_tab)
                    preds[ci] += _extend(reader.read(s), s) if s else 0
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        coef[_ZIGZAG[k]] = _extend(reader.read(s), s)
                        k += 1
                    block = coef.reshape(8, 8) * quants[ci]
                    px = dctm.T @ block @ dctm + 128.0
                    y0, x0 = 8 * (my * v + by), 8 * (mx * h + bx)
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px

    out = []
    for ci, (_, h, v, _) in enumerate(comps):
        p = planes[ci]
        if h != hmax or v != vmax:
            if hmax % h or vmax % v:
                raise ValueError("non-integer JPEG sampling ratio")
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        out.append(p[:height, :width])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    """MSB-first writer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # 1-pad per T.81 F.1.2.3
        return bytes(self.out)


def encode_jpeg_gray(arr, qtable=None) -> bytes:
    """Baseline JFIF encoder for 8-bit grayscale — the native inverse of
    ``_decode_jpeg``'s luma path: forward orthonormal DCT per 8x8 block,
    quantize, zigzag, Annex-K Huffman entropy coding. ``qtable`` is a
    64-entry natural-order table (default: all 8s — the DC step that
    makes block-constant images round-trip EXACTLY: a constant block's
    only nonzero coefficient is DC = 8·(v−128), and quantize/dequantize
    by 8 is the identity on it, which is what puts the JPEG tier of
    docs_image_decode under the value-level oracle). Image dimensions
    must be multiples of 8 (no edge-padding policy to disagree about)."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] % 8 or a.shape[1] % 8:
        raise ValueError("encode_jpeg_gray needs a 2-D array with 8|h and 8|w")
    h, w = a.shape
    q = np.full(64, 8, np.int32) if qtable is None else np.asarray(qtable, np.int32)
    dctm = _dct_matrix()
    dc_tab = _build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_tab = _build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_codes = {v: k for k, v in dc_tab.items()}  # symbol -> (length, code)
    ac_codes = {v: k for k, v in ac_tab.items()}

    writer = _BitWriter()
    pred = 0
    qm = q.reshape(8, 8).astype(np.float64)
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            block = a[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            coefs = dctm @ block @ dctm.T
            zz = np.round(coefs / qm).astype(np.int64).reshape(64)[list(_ZIGZAG)]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = int(diff).bit_length() if diff else 0
            length, code = dc_codes[s]
            writer.write(code, length)
            if s:
                writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_codes[0xF0]  # ZRL
                    writer.write(code, length)
                    run -= 16
                s = abs(v).bit_length()
                length, code = ac_codes[(run << 4) | s]
                writer.write(code, length)
                writer.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                length, code = ac_codes[0x00]  # EOB
                writer.write(code, length)
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = bytes(int(q[_ZIGZAG[k]]) for k in range(64))
    dht = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht += bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes([0x00]) + zz_q)
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, dht)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )


def decode_image(payload: bytes):
    """Decode an image payload to a uint8 numpy array (h, w[, c]).

    Native decoders (no imaging library needed): binary PPM/PGM by
    header magic P6/P5, BI_RGB 24/32-bit BMP by magic BM, 8-bit
    non-interlaced PNG by signature (stdlib zlib inflate + unfilter —
    see ``_decode_png``), and baseline sequential JPEG/JFIF by SOI
    marker (Huffman + IDCT — see ``_decode_jpeg``). Remaining formats
    (progressive JPEG, GIF, TIFF, ...) fall back to PIL when importable
    and raise NotImplementedError otherwise — deliberately not faked,
    so callers can't mistake stub output for pixels."""
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "this image format requires PIL; this environment decodes "
            "PPM/PGM/BMP/PNG/baseline-JPEG natively (see decode_image)"
        ) from exc
    import io  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    try:  # pragma: no cover - exercised when PIL is installed
        return np.asarray(Image.open(io.BytesIO(payload)))
    except Exception as exc:
        # PIL signals corrupt payloads with UnidentifiedImageError (an
        # OSError) among others — none of which DECODE_ERRORS covers.
        # Re-raise as ValueError so the Arrow paths' poison-pill
        # guarantee holds identically with and without PIL.
        raise ValueError(f"PIL could not decode payload: {exc}") from exc


def fake_decode(payload: bytes) -> tuple[int, str, list[float]]:
    """Deterministic stand-in for a codec: byte length, md5 checksum,
    8-bin byte-value histogram (normalized). md5 (not an ad-hoc additive
    sum) so the DuckDB oracle can reproduce the value — ``md5(VARCHAR)``
    hashes the UTF-8 bytes, identical to hashing the payload here."""
    import hashlib  # noqa: PLC0415

    n = len(payload)
    checksum = hashlib.md5(payload).hexdigest()
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    total = float(n) or 1.0
    return n, checksum, [round(h / total, 6) for h in hist]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow moves each partition to Python in record batches; the UDF is
    pure per-row Python on bytes objects, so throughput scales with
    partitions — repartition upstream to size batches for executor
    memory (payloads stay off the JVM heap).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [d[0] for d in decoded],
                    "checksum": [d[1] for d in decoded],
                    "byte_histogram": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("mean_pixel", ArrayType(DoubleType())),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL decode path: per payload, decode pixels (PPM/PGM/BMP native,
    PIL fallback) and emit dimensions + per-channel means. Payloads the
    codec can't decode yield null stats instead of failing the batch —
    at corpus scale a fraction of inputs is always corrupt, and a
    poison-pill row must not kill the job. Same Arrow batching shape as
    ``extract_features``."""
    import numpy as np  # noqa: PLC0415

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [], "mean_pixel": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    arr = decode_image(bytes(p))
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    out["height"].append(arr.shape[0])
                    out["width"].append(arr.shape[1])
                    out["channels"].append(arr.shape[2])
                    out["mean_pixel"].append(
                        [round(float(m), 6) for m in arr.astype(np.float64).mean(axis=(0, 1))]
                    )
                except DECODE_ERRORS:
                    out["height"].append(None)
                    out["width"].append(None)
                    out["channels"].append(None)
                    out["mean_pixel"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(_stats, schema=IMAGE_STATS_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash_hi", LongType()),
        StructField("dhash_lo", LongType()),
    ]
)


def dhash_array(arr) -> tuple[int, int]:
    """64-bit difference hash (dHash) of a decoded pixel array, in EXACT
    integer arithmetic so any engine walking the same pixels derives the
    same bits:

    - multi-channel images reduce to per-pixel channel SUMS (not means —
      adjacent-box comparisons are invariant to the common x-channels
      factor, so no division enters);
    - the image is area-downsampled to a 9 (wide) x 8 (tall) grid of box
      SUMS: row band r covers rows [floor(r*h/8), floor((r+1)*h/8)), col
      band i covers cols [floor(i*w/9), floor((i+1)*w/9));
    - bit k = 8*r + i (k in 0..63) is set iff box (r,i) has strictly
      greater MEAN brightness than box (r,i+1), decided by integer
      cross-multiplication s[r,i]*c[r,i+1] > s[r,i+1]*c[r,i] (c = pixel
      count) — no float division anywhere.

    Returns the two non-negative 32-bit halves (hi = bits 32..63,
    lo = bits 0..31) — the same two-halves convention as
    dedup.simhash_signatures, signed-shift-free on every engine.
    Requires w >= 9 and h >= 8 (each box must be non-empty);
    smaller images raise ValueError (DECODE_ERRORS)."""
    import numpy as np  # noqa: PLC0415

    if arr.ndim == 3:
        arr = arr.astype(np.int64).sum(axis=2)
    h, w = arr.shape
    if w < 9 or h < 8:
        raise ValueError(f"dhash needs >=9x8 pixels, got {w}x{h}")
    px = arr.astype(np.int64)
    rb = np.array([(r * h) // 8 for r in range(9)])
    cb = np.array([(i * w) // 9 for i in range(10)])
    # two reduceat passes replace 72 Python-level slice sums (measured
    # ~2x on the sf1 decode+hash pass); exact int64 sums either way
    s = np.add.reduceat(np.add.reduceat(px, rb[:8], axis=0), cb[:9], axis=1)
    c = np.diff(rb)[:, None] * np.diff(cb)[None, :]
    left = s[:, :8] * c[:, 1:]
    right = s[:, 1:] * c[:, :8]
    bits = (left > right).ravel()  # bit k = 8*r + i
    weights = 1 << np.arange(32, dtype=np.int64)
    lo = int(bits[:32] @ weights)
    hi = int(bits[32:] @ weights)
    return hi, lo


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual hash per image through the REAL decode path: decode
    pixels (PPM/PGM/BMP/PNG/JPEG native), compute ``dhash_array``, emit
    the two 32-bit halves. Near-identical images (recompression, small
    edits, brightness-preserving noise) land within a few Hamming bits —
    the standard image near-dup primitive in web-scale multimodal
    curation (LAION-style pipelines hash every image before dedup).
    Undecodable or sub-9x8 payloads null their own row, never the batch
    (same poison-pill isolation as ``image_stats``)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "dhash_hi": [], "dhash_lo": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    hi, lo = dhash_array(decode_image(bytes(p)))
                    out["dhash_hi"].append(hi)
                    out["dhash_lo"].append(lo)
                except DECODE_ERRORS:
                    out["dhash_hi"].append(None)
                    out["dhash_lo"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(_hash, schema=DHASH_SCHEMA)


def resize_image_array(arr, target_w: int, target_h: int):
    """Nearest-neighbor resize of a decoded pixel array — pure numpy
    index selection, exact and deterministic (no interpolation kernel to
    disagree about across platforms)."""
    import numpy as np  # noqa: PLC0415

    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return arr[ys][:, xs]


def encode_ppm(arr) -> bytes:
    """Re-encode an (h, w, 3) or (h, w) uint8 array as binary PPM/PGM —
    the inverse of the native decoder, so decode->transform->encode
    round-trips inside the pipeline without an imaging library."""
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"cannot encode shape {arr.shape} as PNM")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype("uint8").tobytes()


def resize_images(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """REAL image resize: decode (PPM/PGM/BMP native) -> nearest-neighbor
    downsample -> re-encode as PNM, per Arrow batch. Undecodable
    payloads pass through with null output (corrupt-row isolation, same
    policy as image_stats). The byte-stride ``resize_media`` below stays
    as the codec-free fallback the driver-checked queries use."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "thumb": [], "thumb_w": [], "thumb_h": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    arr = resize_image_array(decode_image(bytes(p)), target_w, target_h)
                    out["thumb"].append(encode_ppm(arr))
                    out["thumb_w"].append(target_w)
                    out["thumb_h"].append(target_h)
                except DECODE_ERRORS:
                    out["thumb"].append(None)
                    out["thumb_w"].append(None)
                    out["thumb_h"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        _resize, "media_id long, thumb binary, thumb_w long, thumb_h long"
    )


def decode_audio(payload: bytes):
    """Native WAV/PCM decoder: RIFF/WAVE chunk walk to the fmt and data
    chunks, returning (samples ndarray [n, channels], sample_rate).
    Supports 8-bit unsigned and 16-bit signed PCM (format tag 1) —
    stdlib struct + numpy only. Compressed audio (MP3/OGG/...) raises
    NotImplementedError: no audio library exists in this container.

    8-bit samples are returned RAW (unsigned, 128 = zero amplitude), as
    stored; amplitude-domain consumers must center them (audio_stats
    does)."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed/unknown audio container; only WAV/PCM decodes natively"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _, _, bits = fmt
    if tag != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (tag={tag}, bits={bits})")
    if channels <= 0 or rate <= 0:
        # a zero here would surface later as ZeroDivisionError mid-batch;
        # reject the malformed fmt chunk at the decode boundary instead
        raise ValueError(f"malformed fmt chunk (channels={channels}, rate={rate})")
    dtype = np.uint8 if bits == 8 else np.dtype("<i2")
    samples = np.frombuffer(data, dtype=dtype)
    n = (len(samples) // channels) * channels
    return samples[:n].reshape(-1, channels), rate


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode path: WAV/PCM payloads -> sample rate, channel
    count, duration, RMS amplitude, via the same Arrow batch shape with
    per-row corrupt-payload isolation.

    RMS is amplitude RMS: 8-bit PCM is unsigned with 128 as zero
    amplitude, so u8 samples are centered at 128 first — digital
    silence reports 0.0, not ~128 (16-bit PCM is already signed)."""
    import numpy as np  # noqa: PLC0415

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_STATS_SCHEMA.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    samples, rate = decode_audio(bytes(p))
                    amp = samples.astype(np.float64)
                    if samples.dtype == np.uint8:
                        amp -= 128.0
                    out["sample_rate"].append(rate)
                    out["channels"].append(samples.shape[1])
                    out["n_samples"].append(samples.shape[0])
                    out["duration_s"].append(round(samples.shape[0] / rate, 6))
                    out["rms"].append(round(float(np.sqrt((amp**2).mean())), 6))
                except DECODE_ERRORS:
                    for k in ("sample_rate", "channels", "n_samples", "duration_s", "rms"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(_stats, schema=AUDIO_STATS_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("afp_hi", LongType()),
        StructField("afp_lo", LongType()),
    ]
)


def audio_fingerprint_array(samples) -> tuple[int, int]:
    """64-bit energy-envelope fingerprint of decoded PCM — the 1-D
    analog of ``dhash_array`` and a simplified Haitsma-Kalker
    (ISMIR 2002) acoustic hash, in EXACT integer arithmetic so any
    engine walking the same samples derives the same bits:

    - multi-channel audio reduces to per-sample absolute-deviation SUMS
      across channels (u8 PCM deviates from 128, its zero-amplitude
      point; i16 from 0) — energy, not amplitude, so phase inversion
      and constant gain don't move it;
    - the sample stream splits into 65 frames, frame i covering
      samples [floor(i*n/65), floor((i+1)*n/65));
    - bit i (0..63) is set iff frame i+1 has strictly greater MEAN
      energy than frame i, decided by cross-multiplication
      e[i+1]*c[i] > e[i]*c[i+1] (c = frame length) — no float division.

    Gain invariance is exact: scaling every deviation by a constant g
    scales both sides of each comparison by g (pinned by a property
    test) — the volume-normalized re-encode, the most common audio
    near-duplicate, collides with its original. Returns the two
    non-negative 32-bit halves (hi = bits 32..63), the
    ``dedup.hamming_banded_pairs`` signature convention. Requires
    n >= 65 samples (each frame must be non-empty); shorter clips
    raise ValueError (DECODE_ERRORS)."""
    import numpy as np  # noqa: PLC0415

    center = 128 if samples.dtype == np.uint8 else 0
    dev = np.abs(samples.astype(np.int64) - center).sum(axis=1)
    n = dev.shape[0]
    if n < 65:
        raise ValueError(f"audio fingerprint needs >=65 samples, got {n}")
    fb = np.array([(i * n) // 65 for i in range(66)])
    e = np.add.reduceat(dev, fb[:65])
    c = np.diff(fb)
    bits = (e[1:] * c[:64]) > (e[:64] * c[1:])
    weights = 1 << np.arange(32, dtype=np.int64)
    return int(bits[32:] @ weights), int(bits[:32] @ weights)


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Perceptual hash per audio clip through the REAL decode path:
    decode WAV/PCM, compute the ``audio_fingerprint_array`` bits, emit
    the two 32-bit halves — the audio-dedup primitive mirroring
    ``image_dhash`` (every at-scale multimodal pipeline fingerprints
    audio before dedup; near-identical clips — re-encodes, gain
    changes, damaged tails — land within a few Hamming bits).
    Undecodable or sub-65-sample payloads null their own row, never
    the batch.

    The frame-energy step is batched across the WHOLE Arrow batch (one
    np.add.reduceat over the concatenated deviation streams, one 65xN
    boundary matrix, one comparison matrix) instead of per-clip numpy
    on tiny arrays — same bits as the per-clip reference
    (differentially pinned in tests), ~2x wall-clock on the sf1
    corpus."""
    import numpy as np  # noqa: PLC0415

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(32, dtype=np.int64)
        for pdf in batches:
            k = len(pdf)
            hi_out = np.full(k, np.nan)
            lo_out = np.full(k, np.nan)
            devs, rows = [], []
            for j, p in enumerate(pdf["payload"]):
                try:
                    samples, _rate = decode_audio(bytes(p))
                    if samples.shape[0] < 65:
                        continue
                    center = 128 if samples.dtype == np.uint8 else 0
                    devs.append(
                        np.abs(samples.astype(np.int64) - center).sum(axis=1)
                    )
                    rows.append(j)
                except DECODE_ERRORS:
                    continue
            if rows:
                ns = np.array([d.shape[0] for d in devs], dtype=np.int64)
                offsets = np.concatenate(([0], np.cumsum(ns)))
                cat = np.concatenate(devs)
                # fb[i, j] = clip i's frame-j start in cat; fb[i, 65]
                # == fb[i+1, 0], so flattening the first 65 columns
                # yields every frame of every clip for ONE reduceat.
                fb = (
                    offsets[:-1, None]
                    + (np.arange(66, dtype=np.int64)[None, :] * ns[:, None]) // 65
                )
                e = np.add.reduceat(cat, fb[:, :65].reshape(-1)).reshape(-1, 65)
                c = np.diff(fb)
                bits = (e[:, 1:] * c[:, :64]) > (e[:, :64] * c[:, 1:])
                hi_out[rows] = bits[:, 32:] @ weights
                lo_out[rows] = bits[:, :32] @ weights
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "afp_hi": hi_out, "afp_lo": lo_out}
            )

    return media.mapInPandas(_fp, schema=AUDIO_FP_SCHEMA)


def decode_video_y4m(payload: bytes):
    """Native YUV4MPEG2 (Y4M) decoder for 8-bit grayscale streams:
    stream-header parse (W/H/F tokens), per-frame FRAME-marker walk,
    returning (frames ndarray [n_frames, h, w] uint8, (fps_num,
    fps_den)) — stdlib + numpy only, the video analog of
    ``decode_audio``'s WAV chunk walk. Y4M is the standard uncompressed
    interchange container (ffmpeg/mpv/x264 all read it); ``Cmono`` is
    its 8-bit single-plane grayscale colorspace, so a frame is exactly
    w*h bytes. Compressed containers (MP4/MKV/...) raise
    NotImplementedError; non-mono colorspaces and malformed streams
    raise ValueError."""
    import numpy as np  # noqa: PLC0415

    magic = b"YUV4MPEG2 "
    if payload[: len(magic)] != magic:
        raise NotImplementedError(
            "compressed/unknown video container; only Y4M decodes natively"
        )
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M missing stream-header terminator")
    w = h = None
    fps = (25, 1)
    for tok in payload[len(magic) : nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif key == b"C" and not val.startswith(b"mono"):
            raise ValueError(f"only Cmono (8-bit grayscale) supported, got {val!r}")
    if not w or not h or w <= 0 or h <= 0:
        raise ValueError(f"malformed Y4M stream header (w={w}, h={h})")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame boundary missing FRAME marker")
        fnl = payload.find(b"\n", pos + 5)
        if fnl < 0 or fnl + 1 + w * h > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(payload[fnl + 1 : fnl + 1 + w * h], dtype=np.uint8)
        )
        pos = fnl + 1 + w * h
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return np.stack(frames).reshape(len(frames), h, w), fps


def dhash_stack(stack):
    """``dhash_array`` vectorized over a stack of same-shape grayscale
    frames [n, h, w]: the two box-sum reduceat passes and the
    cross-multiplied comparisons run once for the whole stack (axis 1/2
    boundaries are shared because every frame has the same h x w).
    Returns (hi ndarray [n], lo ndarray [n]) of non-negative 32-bit
    halves, bit-identical to per-frame ``dhash_array`` (differentially
    pinned in tests)."""
    import numpy as np  # noqa: PLC0415

    n, h, w = stack.shape
    if w < 9 or h < 8:
        raise ValueError(f"dhash needs >=9x8 pixels, got {w}x{h}")
    px = stack.astype(np.int64)
    rb = np.array([(r * h) // 8 for r in range(9)])
    cb = np.array([(i * w) // 9 for i in range(10)])
    s = np.add.reduceat(np.add.reduceat(px, rb[:8], axis=1), cb[:9], axis=2)
    c = np.diff(rb)[:, None] * np.diff(cb)[None, :]
    left = s[:, :, :8] * c[None, :, 1:]
    right = s[:, :, 1:] * c[None, :, :8]
    bits = (left > right).reshape(n, 64)
    weights = 1 << np.arange(32, dtype=np.int64)
    return bits[:, 32:] @ weights, bits[:, :32] @ weights


VIDEO_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("dh_hi", LongType()),
        StructField("dh_lo", LongType()),
    ]
)


def video_frame_dhash(media: DataFrame) -> DataFrame:
    """Per-frame perceptual hashes through the REAL video decode path:
    decode Y4M, dHash every frame, emit (media_id, frame_idx, dh_hi,
    dh_lo) — the frame-fingerprint primitive of content-based video
    dedup (two videos sharing k frame hashes are near-duplicate cuts /
    re-encodes of each other). All frames of every video in the Arrow
    batch that share a shape are hashed in ONE ``dhash_stack`` call.
    Undecodable payloads emit a single all-null frame row for their
    video, never failing the batch."""
    import numpy as np  # noqa: PLC0415

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids: list = []
            fidx: list = []
            by_shape: dict = {}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames, _fps = decode_video_y4m(bytes(p))
                    if frames.shape[2] < 9 or frames.shape[1] < 8:
                        raise ValueError("frames below dhash grid")
                except DECODE_ERRORS:
                    mids.append(mid)
                    fidx.append(None)
                    continue
                slot = by_shape.setdefault(frames.shape[1:], ([], []))
                for i in range(frames.shape[0]):
                    mids.append(mid)
                    fidx.append(i)
                    slot[0].append(frames[i])
                    slot[1].append(len(mids) - 1)
            hi_out = np.full(len(mids), np.nan)
            lo_out = np.full(len(mids), np.nan)
            for frame_list, rows in by_shape.values():
                hi, lo = dhash_stack(np.stack(frame_list))
                hi_out[rows] = hi
                lo_out[rows] = lo
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="Int64"),
                    "frame_idx": pd.array(fidx, dtype="Int64"),
                    "dh_hi": hi_out,
                    "dh_lo": lo_out,
                }
            )

    return media.mapInPandas(_fp, schema=VIDEO_DHASH_SCHEMA)


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """"Resize" in fake-codec mode: deterministic byte-stride downsample
    to ~``target_bytes`` per payload (a real deployment swaps the stride
    slice for codec decode + interpolation; the Spark plumbing — Arrow
    batches in, binary column out, original row count preserved — is
    identical). Output payloads are stable under repartitioning, so the
    thumbnail checksum is test-pinnable."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                b = bytes(p)
                stride = max(len(b) // target_bytes, 1)
                thumbs.append(b[::stride][:target_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "thumb": thumbs,
                    "thumb_bytes": [len(t) for t in thumbs],
                }
            )

    return media.mapInPandas(
        _resize, "media_id long, media_type string, thumb binary, thumb_bytes long"
    )


def sample_frames(media: DataFrame, n_frames: int = 4, frame_size: int = 64) -> DataFrame:
    """Deterministic "frame sampling" for video-typed payloads: slice the
    byte stream at n evenly spaced offsets (the real operator would seek
    keyframes; the partitioning/explode shape is identical). Frame
    checksums are md5 so an oracle can recompute them engine-independently."""
    frames = F.expr(
        f"transform(sequence(0, {n_frames - 1}), "
        f"i -> substring(payload, CAST(i * greatest(octet_length(payload) DIV {n_frames}, 1) + 1 AS INT), {frame_size}))"
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.posexplode(frames).alias("frame_idx", "frame_bytes"))
        .withColumn("frame_checksum", F.md5(F.col("frame_bytes")))
    )
