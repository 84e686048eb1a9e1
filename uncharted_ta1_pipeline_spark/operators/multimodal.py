"""Multimodal (image/audio/video) column plumbing.

The reference consumes real imagery (PIL images / GeoTIFF bytes,
/root/reference/tasks/common/pipeline.py:99-104, io.py:207-342) and runs
batched model inference over tiles (YOLO batch 20,
/root/reference/tasks/point_extraction/point_extractor.py:43,215-230;
Detectron /root/reference/tasks/segmentation/detectron_segmenter.py:54-351).

Spark-side design (real and tested here):
- media are opaque ``binary`` columns with a typed metadata struct
  (mime, width, height, duration_ms, sample_rate) — the 100 TB layout;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages (bounded batches ≈ the reference's inference
  batch size), partition-parallel, schema-declared;
- the actual codec call is STUBBED: the container has no image/audio
  libraries, so ``decode_backend='real'`` raises NotImplementedError and
  the default deterministic fake derives "decoded" values purely from the
  payload bytes (md5-based) — making the plumbing testable and the outputs
  reproducible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, conv_id string, mime string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, sample_rate:int>"
)

FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, sha16 string, "
    "fake_brightness double, fake_n_frames int"
)

RESIZE_SCHEMA = (
    "media_id long, mime string, out_width int, out_height int, n_bytes long"
)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from
    (media_id, seed); mime cycles image/audio/video."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.concat(F.lit("conv"), F.lpad((F.col("id") % 10).cast("string"), 6, "0")).alias(
                "conv_id"
            ),
            F.element_at(
                F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("mime"),
            F.to_binary(
                F.repeat(F.md5(F.concat_ws("|", F.lit(seed), F.col("id"))), 8),
                F.lit("hex"),
            ).alias("payload"),
            F.struct(
                (F.col("id") % 640 + 64).cast("int").alias("width"),
                (F.col("id") % 480 + 48).cast("int").alias("height"),
                (F.col("id") % 60000).cast("int").alias("duration_ms"),
                F.lit(16000).cast("int").alias("sample_rate"),
            ).alias("meta"),
        )
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a codec: derives values from content."""
    h = hashlib.md5(payload).digest()
    return {
        "brightness": round(h[0] / 255.0, 6),
        "n_frames": 1 + h[1] % 32,
    }


def extract_features(media: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """Batched decode + feature extraction via mapInPandas (Arrow).

    ``decode_backend='real'`` is the production path (PIL/librosa/ffmpeg on
    the executors) — unavailable in this container by design."""
    if decode_backend == "real":
        raise NotImplementedError(
            "real codecs (PIL/librosa/ffmpeg) are not installed in this "
            "container; use decode_backend='fake' — the Spark plumbing "
            "(schema, batching, partitioning) is identical"
        )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:  # bounded Arrow batches ≈ inference batch size
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha16": [
                        hashlib.sha256(bytes(p)).hexdigest()[:16]
                        for p in pdf["payload"]
                    ],
                    "fake_brightness": [f["brightness"] for f in feats],
                    "fake_n_frames": [f["n_frames"] for f in feats],
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def resize(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize stage: computes target geometry JVM-side (pure expressions);
    the pixel resample itself is the stubbed codec step."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim)
        / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    return media.select(
        "media_id",
        "mime",
        F.floor(F.col("meta.width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("meta.height") * scale).cast("int").alias("out_height"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


def frame_sample(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    timestamp (pure row explosion — the decode of each frame is the stub)."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("mime").startswith("video/"))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_nr"),
        )
        .select(
            "media_id",
            "frame_nr",
            (F.col("frame_nr") * every_ms).cast("int").alias("frame_ts_ms"),
        )
    )
