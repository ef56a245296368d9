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
