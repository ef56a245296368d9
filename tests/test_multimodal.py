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


def test_compressed_decode_activates_with_pil(spark):
    """Capability-probe golden test: skipped in containers without an
    imaging library, ACTIVE wherever PIL exists — the remaining
    compressed-codec tier (JPEG, now that PNG decodes natively) then
    gets real coverage instead of staying a declared gap. Also
    cross-checks the NATIVE PNG decoder against PIL's independent
    encoder (filtered scanlines PIL chooses must reconstruct
    identically), and pins that a corrupt compressed payload still
    nulls its row rather than killing the batch (PIL raises OSError
    subclasses, which decode_image re-raises as ValueError)."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from multi_report_etl_pipeline_spark.operators.multimodal import (
        decode_image,
        image_stats,
    )

    want = (np.arange(6 * 8 * 3) % 256).astype("uint8").reshape(6, 8, 3)
    # native PNG decoder vs PIL's encoder (independent implementation)
    buf = io.BytesIO()
    Image.fromarray(want).save(buf, format="PNG")
    assert np.array_equal(decode_image(buf.getvalue()), want)

    # the PIL fallback tier: JPEG (lossy — check shape + rough values)
    jbuf = io.BytesIO()
    Image.fromarray(want).save(jbuf, format="JPEG", quality=95)
    jpeg = jbuf.getvalue()
    got_arr = decode_image(jpeg)
    assert got_arr.shape == want.shape

    media = spark.createDataFrame(
        [
            (1, jpeg, "image", "en", "t"),
            (2, b"\xff\xd8\xff garbage jpeg", "image", "en", "t"),
        ],
        "media_id long, payload binary, media_type string, "
        "meta_lang string, meta_source string",
    ).coalesce(1)
    got = {r.media_id: r for r in image_stats(media).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (8, 6, 3)
    assert got[2].width is None


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
