"""Multimodal column operators: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to a typed metadata struct, keep Spark's row
machinery away from pixel/sample decoding, and run decode / feature
extraction / resize / frame sampling as **Arrow-batched Python**
(``mapInPandas``), so bytes cross the JVM<->Python boundary once per
batch, not once per row.

The container has no image/audio libraries, so the actual codec step is
STUBBED: ``decode_image`` raises NotImplementedError unless PIL is
importable, and the tested path uses ``fake_decode`` — a deterministic
pure-bytes "decoder" (length, checksum, byte histogram). Everything
around it — schema, batch iteration, partitioning, output types — is the
real production plumbing.
"""

from __future__ import annotations

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


def decode_image(payload: bytes):
    """Real codec hook — requires an imaging library not present in this
    container. Deliberately NotImplemented rather than faked so callers
    can't mistake stub output for pixels."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - no PIL in container
        raise NotImplementedError(
            "image decoding requires PIL; this environment stubs the codec "
            "step (see fake_decode)"
        ) from exc


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
