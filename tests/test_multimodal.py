"""Multimodal plumbing: binary payload schema, Arrow-batched feature
extraction, deterministic frame sampling; codec stub stays a stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.io import read_table
from multi_report_etl_pipeline_spark.operators import multimodal
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.documents_as_media(read_table(spark, SF_DIR, "documents"))


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "payload",
        "media_type",
        "meta_lang",
        "meta_source",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"


def test_extract_features_matches_local_decode(spark, media):
    feats = multimodal.extract_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert rows.keys() == src.keys()
    for mid, payload in list(src.items())[:25]:
        n, checksum, hist = multimodal.fake_decode(payload)
        got = rows[mid]
        assert (got.n_bytes, got.checksum) == (n, checksum)
        assert len(checksum) == 32  # md5 hex — oracle-reproducible
        assert [round(x, 6) for x in got.byte_histogram] == hist
        assert abs(sum(got.byte_histogram) - 1.0) < 1e-4


def test_payloads_are_ascii(media):
    """The video-frames oracle slices DuckDB VARCHAR by character while
    Spark slices the payload by byte; that equivalence requires ASCII
    fixtures — pin it so a fixture change can't silently skew the oracle."""
    non_ascii = media.filter(
        F.octet_length(F.col("payload")) != F.length(F.col("payload").cast("string"))
    ).count()
    assert non_ascii == 0


def test_extract_features_deterministic(media):
    a = sorted((r.media_id, r.checksum) for r in multimodal.extract_features(media).collect())
    b = sorted((r.media_id, r.checksum) for r in multimodal.extract_features(media).collect())
    assert a == b


def test_sample_frames_shape(media):
    frames = multimodal.sample_frames(media, n_frames=4, frame_size=16)
    n_videos = media.filter(F.col("media_type") == "video").count()
    assert frames.count() == 4 * n_videos
    per_media = frames.groupBy("media_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_media] == [4]


def test_decode_image_is_a_guarded_stub(media):
    payload = bytes(media.select("payload").first().payload)
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(payload)


def test_resize_media_deterministic_and_bounded(media):
    resized = multimodal.resize_media(media, target_bytes=64)
    rows = resized.collect()
    assert len(rows) == media.count()  # row count preserved
    assert all(r["thumb_bytes"] <= 64 and r["thumb_bytes"] > 0 for r in rows)
    # deterministic under repartitioning
    again = {
        r["media_id"]: bytes(r["thumb"])
        for r in multimodal.resize_media(media.repartition(5), target_bytes=64).collect()
    }
    assert {r["media_id"]: bytes(r["thumb"]) for r in rows} == again


def _make_ppm(width, height):
    """Deterministic P6 gradient with a header comment."""
    header = f"P6\n# golden\n{width} {height}\n255\n".encode()
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes([(x * 16) % 256, (y * 32) % 256, ((x + y) * 8) % 256])
    return header + bytes(px)


def _make_pgm(width, height):
    header = f"P5\n{width} {height}\n255\n".encode()
    return header + bytes([(x * y) % 256 for y in range(height) for x in range(width)])


def _make_bmp(width, height, bottom_up=True, bpp=24):
    """BI_RGB BMP with the same RGB gradient as _make_ppm."""
    import struct

    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    raster = bytearray()
    rows = range(height - 1, -1, -1) if bottom_up else range(height)
    for y in rows:
        row = bytearray()
        for x in range(width):
            r, g, b = (x * 16) % 256, (y * 32) % 256, ((x + y) * 8) % 256
            row += bytes([b, g, r] + ([0] if bpp == 32 else []))
        row += b"\x00" * (stride - len(row))
        raster += row
    offset = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", offset + len(raster), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height if bottom_up else -height,
        1, bpp, 0, len(raster), 2835, 2835, 0, 0,
    )
    return bytes(hdr + dib + raster)


def test_decode_image_ppm_pgm_bmp_golden():
    """The native codec must reproduce the exact pixel array for P6/P5
    and for bottom-up/top-down 24- and 32-bit BMPs of the same image."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import decode_image

    w, h = 7, 5  # odd width forces BMP row padding
    want = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            want[y, x] = [(x * 16) % 256, (y * 32) % 256, ((x + y) * 8) % 256]

    assert np.array_equal(decode_image(_make_ppm(w, h)), want)
    gray = decode_image(_make_pgm(w, h))
    assert gray.shape == (h, w)
    assert gray[2, 3] == 6
    for bottom_up in (True, False):
        for bpp in (24, 32):
            got = decode_image(_make_bmp(w, h, bottom_up, bpp))
            assert np.array_equal(got, want), f"bottom_up={bottom_up} bpp={bpp}"


def test_decode_image_rejects_unknown_without_pil():
    import pytest as _pytest

    from multi_report_etl_pipeline_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        _pytest.skip("PIL present; fallback would decode")
    except ImportError:
        pass
    with _pytest.raises((NotImplementedError, ValueError)):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")


def test_image_stats_decodes_through_arrow_path(spark):
    """End-to-end: real pixel decode inside mapInPandas — dims and
    per-channel means must match the numpy reference, and a corrupt
    payload yields null stats without failing the batch."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import image_stats

    w, h = 6, 4
    ppm = _make_ppm(w, h)
    bmp = _make_bmp(w, h)
    rows = [
        (1, ppm, "image", "en", "t"),
        (2, bmp, "image", "en", "t"),
        (3, b"not an image", "image", "en", "t"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, meta_lang string, meta_source string"
    )
    got = {r.media_id: r for r in image_stats(media).collect()}
    ref = np.zeros((h, w, 3), dtype=np.float64)
    for y in range(h):
        for x in range(w):
            ref[y, x] = [(x * 16) % 256, (y * 32) % 256, ((x + y) * 8) % 256]
    want_means = [round(float(m), 6) for m in ref.mean(axis=(0, 1))]
    for mid in (1, 2):
        r = got[mid]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert list(r.mean_pixel) == want_means
    assert got[3].width is None and got[3].mean_pixel is None


def test_resize_images_round_trips_through_pnm(spark):
    """decode -> nearest-neighbor resize -> PNM re-encode -> decode must
    equal the numpy reference selection exactly (no interpolation to
    disagree about)."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        decode_image,
        resize_images,
    )

    w, h, tw, th = 8, 6, 4, 3
    media = spark.createDataFrame(
        [(1, _make_ppm(w, h), "image", "en", "t"), (2, b"junk", "image", "en", "t")],
        "media_id long, payload binary, media_type string, meta_lang string, meta_source string",
    )
    got = {r.media_id: r for r in resize_images(media, tw, th).collect()}
    src = decode_image(_make_ppm(w, h))
    ys = np.minimum((np.arange(th) * h) // th, h - 1)
    xs = np.minimum((np.arange(tw) * w) // tw, w - 1)
    want = src[ys][:, xs]
    thumb = decode_image(bytes(got[1].thumb))
    assert thumb.shape == (th, tw, 3)
    assert np.array_equal(thumb, want)
    assert got[2].thumb is None


def _make_wav(rate=8000, n=1000, channels=1, bits=16):
    """Deterministic PCM sine-ish ramp."""
    import struct

    if bits == 16:
        frames = b"".join(
            struct.pack("<" + "h" * channels, *[((i * 37) % 2000 - 1000)] * channels)
            for i in range(n)
        )
    else:
        frames = bytes([(i * 7) % 256 for i in range(n * channels)])
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_audio_stats_decodes_wav(spark):
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import audio_stats

    wav = _make_wav(rate=8000, n=1000, channels=2)
    media = spark.createDataFrame(
        [(1, wav, "audio", "en", "t"), (2, b"ID3 not a wav", "audio", "en", "t")],
        "media_id long, payload binary, media_type string, meta_lang string, meta_source string",
    )
    got = {r.media_id: r for r in audio_stats(media).collect()}
    r = got[1]
    assert (r.sample_rate, r.channels, r.n_samples) == (8000, 2, 1000)
    assert r.duration_s == 0.125
    ref = np.array([((i * 37) % 2000 - 1000) for i in range(1000)], dtype=np.float64)
    want_rms = round(float(np.sqrt((np.repeat(ref, 2) ** 2).mean())), 6)
    assert r.rms == want_rms
    assert got[2].sample_rate is None


def test_decode_audio_8bit_and_alignment():
    from multi_report_etl_pipeline_spark.operators.multimodal import decode_audio

    samples, rate = decode_audio(_make_wav(rate=4000, n=99, channels=1, bits=8))
    assert rate == 4000 and samples.shape == (99, 1)
    assert int(samples[3, 0]) == 21


def test_u8_silence_has_zero_rms(spark):
    """8-bit PCM stores 128 as zero amplitude: digital silence must
    report RMS 0.0 (amplitude RMS), not ~128 (raw-sample RMS)."""
    from multi_report_etl_pipeline_spark.operators.multimodal import audio_stats

    import struct

    frames = bytes([128] * 400)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(frames)) + frames
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    [r] = audio_stats(
        spark.createDataFrame(
            [(1, wav, "audio", "en", "t")],
            "media_id long, payload binary, media_type string, "
            "meta_lang string, meta_source string",
        )
    ).collect()
    assert r.rms == 0.0


def test_truncated_and_zeroed_payloads_null_their_rows(spark):
    """Poison-pill guarantee for exception types OUTSIDE ValueError:
    struct.error (truncated 'BM'/RIFF headers — struct.error subclasses
    Exception, not ValueError) and zeroed fmt fields (channels=0,
    rate=0 would divide by zero downstream). Each must null its own
    row, not kill the Arrow batch; the valid row in the same batch
    must still decode."""
    import struct

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        audio_stats,
        image_stats,
        resize_images,
    )

    def wav_with_fmt(channels, rate, bits=8, n=16):
        frames = bytes([128] * (n * max(channels, 1)))
        fmt = struct.pack(
            "<HHIIHH", 1, channels, rate, rate * max(channels, 1), 1, bits
        )
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(frames)) + frames
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    schema = (
        "media_id long, payload binary, media_type string, "
        "meta_lang string, meta_source string"
    )
    bad_images = spark.createDataFrame(
        [
            (1, b"BM\x01\x02", "image", "en", "t"),  # truncated BMP header
            (2, _make_ppm(2, 2), "image", "en", "t"),  # valid, same batch
        ],
        schema,
    ).coalesce(1)
    got = {r.media_id: r for r in image_stats(bad_images).collect()}
    assert got[1].width is None and got[2].width == 2
    got = {r.media_id: r for r in resize_images(bad_images, 2, 2).collect()}
    assert got[1].thumb is None and got[2].thumb is not None

    truncated_fmt = b"RIFF" + struct.pack("<I", 12) + b"WAVE"
    truncated_fmt += b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    bad_audio = spark.createDataFrame(
        [
            (1, truncated_fmt, "audio", "en", "t"),  # short fmt -> struct.error
            (2, wav_with_fmt(channels=0, rate=8000), "audio", "en", "t"),
            (3, wav_with_fmt(channels=1, rate=0), "audio", "en", "t"),
            (4, wav_with_fmt(channels=1, rate=8000), "audio", "en", "t"),  # valid
        ],
        schema,
    ).coalesce(1)
    got = {r.media_id: r for r in audio_stats(bad_audio).collect()}
    assert got[1].sample_rate is None
    assert got[2].sample_rate is None
    assert got[3].sample_rate is None
    assert got[4].sample_rate == 8000 and got[4].rms == 0.0


def test_jpeg_decode_with_optional_pil_cross_check(spark):
    """JPEG is NATIVE now (round-6: Huffman + IDCT in numpy), so this
    test always runs — no PIL-conditional skip left in the suite. It
    decodes a baseline JFIF through the Arrow batch path (corrupt
    payload nulls its own row), and — only where an imaging library
    happens to exist — additionally cross-checks the native PNG and
    JPEG decoders against PIL's independent codecs."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        decode_image,
        encode_jpeg_gray,
        image_stats,
    )

    want = (np.arange(16 * 24) % 256).astype("uint8").reshape(16, 24)
    jpeg = encode_jpeg_gray(want, qtable=np.ones(64, np.int64))
    media = spark.createDataFrame(
        [
            (1, jpeg, "image", "en", "t"),
            (2, b"\xff\xd8\xff garbage jpeg", "image", "en", "t"),
        ],
        "media_id long, payload binary, media_type string, "
        "meta_lang string, meta_source string",
    ).coalesce(1)
    got = {r.media_id: r for r in image_stats(media).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (24, 16, 1)
    assert got[2].width is None  # poison row isolated, batch survived

    try:  # optional extra layer: cross-check vs libjpeg/libpng via PIL
        from PIL import Image
    except ImportError:
        return
    import io  # pragma: no cover - exercised when PIL is installed

    rgb = (np.arange(6 * 8 * 3) % 256).astype("uint8").reshape(6, 8, 3)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    assert np.array_equal(decode_image(buf.getvalue()), rgb)
    jbuf = io.BytesIO()
    Image.fromarray(rgb).save(jbuf, format="JPEG", quality=95)
    ours = decode_image(jbuf.getvalue()).astype(int)
    pils = np.asarray(Image.open(io.BytesIO(jbuf.getvalue()))).astype(int)
    assert ours.shape == pils.shape
    # float IDCT (ours) vs libjpeg's integer IDCT: off-by-rounding only
    assert np.abs(ours - pils).max() <= 2


def test_decode_png_all_filters_match_spec_reference():
    """The native PNG unfilter vs an independent all-Python
    transcription of the RFC 2083 recurrences, for every color type and
    a scanline stream cycling through all five filters."""
    import struct
    import zlib

    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import _decode_png

    def ref_unfilter(scan, w, h, ch):
        stride = w * ch
        out, prev, at = [], [0] * stride, 0
        for _y in range(h):
            f = scan[at]
            at += 1
            cur = list(scan[at : at + stride])
            at += stride
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 0:
                    v = cur[i]
                elif f == 1:
                    v = cur[i] + a
                elif f == 2:
                    v = cur[i] + b
                elif f == 3:
                    v = cur[i] + ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = cur[i] + pr
                rec[i] = v & 0xFF
            out.append(rec)
            prev = rec
        return np.array(out, dtype=np.uint8).reshape(h, w, ch)

    def png_from_raw(raw, w, h, color_type):
        def chunk(t, b):
            return struct.pack(">I", len(b)) + t + b + struct.pack(
                ">I", zlib.crc32(t + b)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(7)
    for ch, ctype in [(1, 0), (2, 4), (3, 2), (4, 6)]:
        w, h = 6, 10
        raw = bytearray()
        for y in range(h):
            raw.append(y % 5)  # every filter type appears twice
            raw.extend(rng.randint(0, 256, size=w * ch).astype(np.uint8).tobytes())
        got = _decode_png(png_from_raw(bytes(raw), w, h, ctype))
        if got.ndim == 2:
            got = got[:, :, None]
        assert np.array_equal(got, ref_unfilter(bytes(raw), w, h, ch)), (ch, ctype)


def test_encode_png_round_trips_and_rejects():
    import numpy as np
    import pytest as _pytest

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        _decode_png,
        decode_image,
        encode_png,
    )

    rng = np.random.RandomState(1)
    for shape in [(5, 7), (5, 7, 2), (5, 7, 3), (5, 7, 4)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        b = decode_image(encode_png(a))
        assert b.shape == a.shape and np.array_equal(a, b), shape
    with _pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 5), dtype=np.uint8))
    # malformed payloads raise inside DECODE_ERRORS, never escape it
    rgb = encode_png(rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8))
    for bad in (
        b"\x89PNG\r\n\x1a\n garbage",
        rgb[:40],  # truncated mid-chunk
        rgb[:8] + rgb[33:],  # IDAT but no IHDR
    ):
        with _pytest.raises(ValueError):
            _decode_png(bad)


def test_image_stats_decodes_png_through_arrow_path(spark):
    """The Arrow batch path over NATIVE PNG payloads: dims + means match
    numpy, corrupt PNG nulls its row, mixed containers coexist in one
    batch."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        encode_png,
        image_stats,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(4, 6, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, size=(3, 5)).astype(np.uint8)
    rows = [
        (1, encode_png(img), "image", "en", "t"),
        (2, encode_png(gray), "image", "en", "t"),
        (3, b"\x89PNG\r\n\x1a\n nope", "image", "en", "t"),
        (4, _make_ppm(6, 4), "image", "en", "t"),  # PNM in the same batch
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, media_type string, "
        "meta_lang string, meta_source string",
    ).coalesce(1)
    got = {r.media_id: r for r in image_stats(media).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (6, 4, 3)
    assert list(got[1].mean_pixel) == [
        round(float(m), 6) for m in img.astype(np.float64).mean(axis=(0, 1))
    ]
    assert (got[2].width, got[2].height, got[2].channels) == (5, 3, 1)
    assert got[3].width is None and got[3].mean_pixel is None
    assert got[4].width == 6


def test_jpeg_constant_blocks_round_trip_exactly():
    """The value-oracle construction behind docs_image_decode's JPEG
    tier: every possible byte value as an 8x8 constant block must
    survive encode -> Huffman -> dequantize -> IDCT bit-exactly (a
    constant block's only nonzero coefficient is DC = 8*(v-128), and
    the all-8s quantization table is the identity on it)."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        decode_image,
        encode_jpeg_gray,
    )

    row = np.arange(256, dtype=np.uint8)
    img = np.repeat(np.repeat(row[None, :], 8, axis=0), 8, axis=1)
    got = decode_image(encode_jpeg_gray(img))
    assert got.shape == (8, 2048)
    assert np.array_equal(got, img)


def test_jpeg_general_content_unit_quant_round_trip():
    """General (non-constant) content through the full AC path: with
    all-1 quantization the only loss is coefficient rounding, so the
    reconstruction must stay within 2 gray levels everywhere — any
    zigzag/Huffman/run-length bug produces gross errors, not +/-2."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        decode_image,
        encode_jpeg_gray,
    )

    h, w = 24, 32
    img = ((np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % 256).astype(
        np.uint8
    )
    got = decode_image(encode_jpeg_gray(img, qtable=np.ones(64, np.int64))).astype(int)
    assert got.shape == (h, w)
    assert np.abs(got - img.astype(int)).max() <= 2


def test_jpeg_decoder_matches_independent_idct_reference():
    """Golden test against an INDEPENDENT reference: hand-assemble a
    JPEG whose entropy stream encodes known quantized coefficients, and
    compare the native decoder's pixels with a from-the-spec float IDCT
    (T.81 A.3.3 double loop, no shared code with the decoder's matrix
    formulation)."""
    import math

    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        _ZIGZAG,
        _decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    q = np.ones(64, np.int64)
    payload = encode_jpeg_gray(img, qtable=q)
    got = _decode_jpeg(payload).astype(np.float64)

    # reference: recompute the quantized coefficients exactly as the
    # encoder's contract states (orthonormal FDCT, round, quantize),
    # then reconstruct with the spec's scalar IDCT formula.
    def spec_idct(coef):
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * coef[u, v]
                            * math.cos((2 * x + 1) * v * math.pi / 16)
                            * math.cos((2 * y + 1) * u * math.pi / 16)
                        )
                out[y, x] = s / 4 + 128.0
        return out

    cm = np.cos(
        (2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16
    ) * np.sqrt(0.25)
    cm[0] = np.sqrt(0.125)
    for y0 in range(0, 16, 8):
        for x0 in range(0, 16, 8):
            block = img[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
            coefs = np.round(cm @ block @ cm.T)  # quantize by 1
            want = np.clip(np.round(spec_idct(coefs)), 0, 255)
            assert np.array_equal(got[y0 : y0 + 8, x0 : x0 + 8], want), (y0, x0)


def test_jpeg_restart_markers_reset_dc_prediction():
    """DRI/RSTn handling: split a 2-MCU grayscale scan at every MCU and
    verify the decoder re-aligns to the byte boundary and resets the DC
    predictor per segment (the second block's DC is coded absolute, not
    as a diff)."""
    import struct

    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _BitWriter,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _build_huffman,
        _decode_jpeg,
    )

    dc_codes = {v: k for k, v in _build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS).items()}
    ac_codes = {v: k for k, v in _build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS).items()}

    def block_bits(writer, dc_value):
        # DC category + magnitude bits (positive values: no EXTEND flip)
        s = int(dc_value).bit_length() if dc_value else 0
        length, code = dc_codes[s]
        writer.write(code, length)
        if s:
            writer.write(dc_value if dc_value > 0 else dc_value + (1 << s) - 1, s)
        length, code = ac_codes[0x00]  # EOB
        writer.write(code, length)

    v1, v2 = 200, 40  # constant block values
    w1 = _BitWriter()
    block_bits(w1, v1 - 128)
    w2 = _BitWriter()
    block_bits(w2, v2 - 128)  # ABSOLUTE after restart (pred reset to 0)
    entropy = w1.flush() + b"\xff\xd0" + w2.flush()

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    q = bytes([8] * 64)
    dht = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht += bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + q)
        + seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, dht)
        + seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )
    got = _decode_jpeg(payload)
    want = np.concatenate(
        [np.full((8, 8), v1, np.uint8), np.full((8, 8), v2, np.uint8)], axis=1
    )
    assert np.array_equal(got, want)


def test_jpeg_color_420_interleaved_mcu():
    """3-component 4:2:0 scan, hand-assembled: one 16x16 MCU holds four
    Y blocks + one Cb + one Cr; constant planes round-trip exactly, so
    the interleaved MCU walk, per-component DC prediction, chroma
    replication upsample, and the JFIF YCbCr->RGB conversion are each
    pinned by the expected RGB triple."""
    import struct

    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _BitWriter,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _build_huffman,
        _decode_jpeg,
    )

    dc_codes = {v: k for k, v in _build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS).items()}
    ac_codes = {v: k for k, v in _build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS).items()}
    yv, cbv, crv = 120, 90, 180
    writer = _BitWriter()

    def block_bits(diff):
        s = int(diff).bit_length() if diff >= 0 else int(-diff).bit_length()
        length, code = dc_codes[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        length, code = ac_codes[0x00]
        writer.write(code, length)

    # MCU order: Y x4 (pred chains within the component), Cb, Cr
    block_bits(yv - 128)
    for _ in range(3):
        block_bits(0)
    block_bits(cbv - 128)
    block_bits(crv - 128)

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    q = bytes([8] * 64)
    dht = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht += bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + q)
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + seg(0xC4, dht)
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + writer.flush()
        + b"\xff\xd9"
    )
    got = _decode_jpeg(payload)
    assert got.shape == (16, 16, 3)
    r = np.clip(round(yv + 1.402 * (crv - 128)), 0, 255)
    g = np.clip(round(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128)), 0, 255)
    b = np.clip(round(yv + 1.772 * (cbv - 128)), 0, 255)
    assert np.array_equal(got[0, 0], np.array([r, g, b], np.uint8))
    assert (got == got[0, 0]).all()  # constant planes -> constant RGB


def test_jpeg_rejects_unsupported_variants():
    """Progressive scans, 16-bit quant tables, 12-bit precision, and
    truncation all raise inside DECODE_ERRORS (poison-row isolation)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        DECODE_ERRORS,
        _decode_jpeg,
        encode_jpeg_gray,
    )

    img = np.full((8, 8), 77, np.uint8)
    good = encode_jpeg_gray(img)

    progressive = bytearray(good)
    sof_at = good.index(b"\xff\xc0")
    progressive[sof_at + 1] = 0xC2  # SOF0 -> SOF2
    with _pytest.raises(ValueError, match="baseline"):
        _decode_jpeg(bytes(progressive))

    precision12 = bytearray(good)
    precision12[sof_at + 4] = 12
    with _pytest.raises(ValueError, match="8-bit"):
        _decode_jpeg(bytes(precision12))

    # truncated mid-stream: struct.error here, which DECODE_ERRORS lists
    # explicitly (it does NOT subclass ValueError) — poison-row isolation
    # is the contract, not any one exception class
    with _pytest.raises(DECODE_ERRORS):
        _decode_jpeg(good[: sof_at + 6])

    # encoder contract: dims must be block-aligned, input 2-D
    with _pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((7, 8), np.uint8))
    with _pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((8, 8, 3), np.uint8))
    assert struct.unpack_from(">H", good, sof_at + 7)[0] == 8  # sanity: w=8


def test_dhash_array_matches_brute_reference():
    """dhash_array vs an independent brute-force reference on random
    arrays (gray + RGB, non-divisible dims), plus the size contract."""
    import numpy as np
    import pytest as _pytest

    from multi_report_etl_pipeline_spark.operators.multimodal import dhash_array

    def brute(arr):
        a = arr.astype(object)
        if a.ndim == 3:
            a = a.sum(axis=2)
        h, w = a.shape
        hi = lo = 0
        for r in range(8):
            for i in range(8):
                def box(rr, ii):
                    rows = range((rr * h) // 8, ((rr + 1) * h) // 8)
                    cols = range((ii * w) // 9, ((ii + 1) * w) // 9)
                    vals = [int(a[y][x]) for y in rows for x in cols]
                    return sum(vals), len(vals)
                s1, c1 = box(r, i)
                s2, c2 = box(r, i + 1)
                if s1 * c2 > s2 * c1:
                    k = 8 * r + i
                    if k < 32:
                        lo |= 1 << k
                    else:
                        hi |= 1 << (k - 32)
        return hi, lo

    rng = np.random.RandomState(7)
    for shape in [(8, 9), (8, 72), (17, 23), (64, 64), (10, 100, 3)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert dhash_array(arr) == brute(arr), shape
    # halves are non-negative 32-bit
    hi, lo = dhash_array(rng.randint(0, 256, size=(33, 57)).astype(np.uint8))
    assert 0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)
    with _pytest.raises(ValueError):
        dhash_array(np.zeros((7, 9), np.uint8))
    with _pytest.raises(ValueError):
        dhash_array(np.zeros((8, 8), np.uint8))


def test_dhash_brightness_shift_invariance_and_sensitivity():
    """The hash must be invariant to global brightness scaling (the
    comparisons are ratios of box means) and must move only locally
    under a localized edit — the properties that make it a perceptual
    hash rather than a checksum."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import dhash_array

    rng = np.random.RandomState(11)
    base = rng.randint(40, 120, size=(32, 45)).astype(np.uint8)
    assert dhash_array(base) == dhash_array((base * 2).astype(np.uint8))
    # corrupt only the last column box of the last row band: every box
    # it does not touch keeps its sums, so only bit 63 may differ
    edited = base.copy()
    edited[(7 * 32) // 8 :, (8 * 45) // 9 :] = 255
    hi0, lo0 = dhash_array(base)
    hi1, lo1 = dhash_array(edited)
    assert lo0 == lo1
    assert (hi0 ^ hi1) & ~(1 << 31) == 0


def test_image_dhash_poison_rows_null_not_fail(spark):
    """Undecodable and sub-grid payloads null their own row through the
    Arrow path; good rows in the same batch still hash."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        dhash_array,
        encode_png,
        image_dhash,
    )

    rng = np.random.RandomState(3)
    good = rng.randint(0, 256, size=(8, 16)).astype(np.uint8)
    rows = [
        (1, encode_png(good)),
        (2, b"not an image at all"),
        (3, b"P5\n4 4\n255\n" + bytes(16)),  # decodes but under 9x8
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: (r.dhash_hi, r.dhash_lo) for r in image_dhash(media).collect()}
    assert got[1] == dhash_array(good)
    assert got[2] == (None, None)
    assert got[3] == (None, None)


def test_audio_fingerprint_array_matches_brute_reference():
    """audio_fingerprint_array vs an independent brute-force reference
    on random PCM (u8 mono/stereo + i16, frame-unaligned lengths), plus
    the >=65-sample contract and the 32-bit-halves invariant."""
    import numpy as np
    import pytest as _pytest

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        audio_fingerprint_array,
    )

    def brute(samples):
        center = 128 if samples.dtype == np.uint8 else 0
        dev = [
            sum(abs(int(v) - center) for v in row) for row in samples
        ]
        n = len(dev)
        e = [sum(dev[(i * n) // 65 : ((i + 1) * n) // 65]) for i in range(65)]
        c = [((i + 1) * n) // 65 - (i * n) // 65 for i in range(65)]
        hi = lo = 0
        for i in range(64):
            if e[i + 1] * c[i] > e[i] * c[i + 1]:
                if i < 32:
                    lo |= 1 << i
                else:
                    hi |= 1 << (i - 32)
        return hi, lo

    rng = np.random.RandomState(17)
    for shape, dtype in [
        ((65, 1), np.uint8),
        ((200, 2), np.uint8),
        ((1000, 1), np.int16),
        ((131, 3), np.int16),
    ]:
        lohi = (0, 256) if dtype == np.uint8 else (-30000, 30000)
        arr = rng.randint(*lohi, size=shape).astype(dtype)
        assert audio_fingerprint_array(arr) == brute(arr), (shape, dtype)
    hi, lo = audio_fingerprint_array(
        rng.randint(0, 256, size=(777, 1)).astype(np.uint8)
    )
    assert 0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)
    with _pytest.raises(ValueError):
        audio_fingerprint_array(np.zeros((64, 1), np.uint8))


def test_audio_fingerprint_gain_invariance_and_tail_sensitivity():
    """The hash must be exactly invariant to constant gain (the
    comparisons cross-multiply frame energies) and a damaged tail from
    frame boundary 62 on may flip only bits 61-63 — the two properties
    the near-dup query's twin construction relies on."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        audio_fingerprint_array,
    )

    rng = np.random.RandomState(23)
    dev = rng.randint(-63, 64, size=(400, 1))
    base = (128 + dev).astype(np.uint8)
    doubled = (128 + 2 * dev).astype(np.uint8)
    assert audio_fingerprint_array(base) == audio_fingerprint_array(doubled)
    # damaged tail: overwrite from floor(62*n/65) with near-silence.
    # Frames 62-64 are the only energies that move, so only bits 61-63
    # (the top 3 bits of the hi half) may flip.
    n = base.shape[0]
    edited = base.copy()
    edited[(62 * n) // 65 :] = 126
    hi0, lo0 = audio_fingerprint_array(base)
    hi1, lo1 = audio_fingerprint_array(edited)
    assert lo0 == lo1
    assert (hi0 ^ hi1) & ((1 << 29) - 1) == 0


def test_audio_fingerprint_poison_rows_null_not_fail(spark):
    """Undecodable and sub-65-sample payloads null their own row
    through the Arrow path; good rows in the same batch still hash."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        audio_fingerprint_array,
        decode_audio,
    )

    good = _make_wav(rate=8000, n=500, channels=2, bits=16)
    rows = [
        (1, good),
        (2, b"ID3 not a wav"),
        (3, _make_wav(rate=8000, n=64, channels=1, bits=8)),  # < 65 samples
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.afp_hi, r.afp_lo)
        for r in audio_fingerprint(media).collect()
    }
    assert got[1] == audio_fingerprint_array(decode_audio(good)[0])
    assert got[2] == (None, None)
    assert got[3] == (None, None)


def _make_y4m(w=9, h=8, n_frames=4, colorspace=b"mono", fps=b"25:1"):
    """Deterministic grayscale ramp clip."""
    header = b"YUV4MPEG2 W%d H%d F%s Ip A1:1 C%s\n" % (w, h, fps, colorspace)
    out = header
    for f in range(n_frames):
        data = bytes(((f * 31 + i * 7) % 256) for i in range(w * h))
        out += b"FRAME\n" + data
    return out


def test_decode_video_y4m_roundtrip_and_contract():
    import numpy as np
    import pytest as _pytest

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        decode_video_y4m,
    )

    frames, fps = decode_video_y4m(_make_y4m(w=12, h=10, n_frames=3))
    assert frames.shape == (3, 10, 12) and frames.dtype == np.uint8
    assert fps == (25, 1)
    assert frames[1, 0, 0] == 31 and frames[2, 0, 1] == (62 + 7) % 256
    with _pytest.raises(NotImplementedError):
        decode_video_y4m(b"\x00\x00\x00\x18ftypmp42 not a y4m")
    with _pytest.raises(ValueError):
        decode_video_y4m(_make_y4m(colorspace=b"420jpeg"))
    with _pytest.raises(ValueError):
        decode_video_y4m(_make_y4m()[:-5])  # truncated last frame
    with _pytest.raises(ValueError):
        decode_video_y4m(b"YUV4MPEG2 W9 H8\nNOPE\n" + bytes(72))


def test_dhash_stack_matches_dhash_array():
    """The stack-vectorized dHash must be bit-identical to the per-frame
    reference on every frame of a random same-shape stack."""
    import numpy as np

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        dhash_array,
        dhash_stack,
    )

    rng = np.random.RandomState(31)
    for shape in [(5, 8, 9), (3, 17, 23), (7, 64, 64)]:
        stack = rng.randint(0, 256, size=shape).astype(np.uint8)
        hi, lo = dhash_stack(stack)
        for i in range(shape[0]):
            assert (int(hi[i]), int(lo[i])) == dhash_array(stack[i]), (shape, i)


def test_video_frame_dhash_poison_rows_null_not_fail(spark):
    """Undecodable payloads emit one all-null frame row for their video;
    good clips in the same batch hash every frame."""
    from multi_report_etl_pipeline_spark.operators.multimodal import (
        decode_video_y4m,
        dhash_array,
        video_frame_dhash,
    )

    good = _make_y4m(w=9, h=8, n_frames=2)
    rows = [(1, good), (2, b"not a video"), (3, _make_y4m(w=4, h=4))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r.media_id, r.frame_idx): (r.dh_hi, r.dh_lo)
        for r in video_frame_dhash(media).collect()
    }
    frames, _ = decode_video_y4m(good)
    assert got[(1, 0)] == dhash_array(frames[0])
    assert got[(1, 1)] == dhash_array(frames[1])
    assert got[(2, None)] == (None, None)
    assert got[(3, None)] == (None, None)  # frames below the dhash grid
