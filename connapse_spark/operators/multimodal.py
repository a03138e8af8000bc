"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns + typed metadata, with decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

The decode kernels are STUBS (image/audio libraries are not in this
container): each is a deterministic fake clearly marked for replacement
(swap ``_decode_image_stub`` → Pillow, ``_sample_frames_stub`` → pyav, …).
The Spark-side contract — schemas, batch iteration, partitioning, output
shapes — is real and tested; it is exactly what a production pipeline
reuses when the real codecs are installed.

Scale: every stage is map-side (no shuffle); binary payloads stay in Arrow
record batches end-to-end; `spark.sql.execution.arrow.maxRecordsPerBatch`
and `maxPartitionBytes` bound per-task memory against large blobs. Partition
by (modality, shard) at write so downstream stages prune by modality.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, content binary, media_type string, "
    "width int, height int, duration_ms long"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_channels int, "
    "mean_luma double, phash string, decode_error string"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_index int, ts_ms long, frame binary"

RESIZE_SCHEMA = "media_id long, width int, height int, content binary"


def _stable_u32(blob: bytes, salt: str) -> int:
    return int(hashlib.sha256(salt.encode() + blob).hexdigest()[:8], 16)


def synthesize_media(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic fake media table from the documents corpus (no media in
    the driver's testdata): content = utf-8 text bytes, metadata derived by
    hash — stable inputs for exercising the pipeline plumbing."""
    blob = F.encode(F.col("text"), "UTF-8")
    h = F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 8), 16, 10).cast("bigint")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        blob.alias("content"),
        F.lit(f"{modality}/x-stub").alias("media_type"),
        (h % 1920 + 64).cast("int").alias("width"),
        (h % 1080 + 64).cast("int").alias("height"),
        (h % 600000).alias("duration_ms"),
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas. STUB decode: real impl
    opens ``content`` with Pillow and computes real stats; the stub derives
    deterministic pseudo-features from the bytes so shapes and determinism
    are testable."""

    def _decode_image_stub(blob: bytes) -> tuple[int, int, int, float, str, str | None]:
        if not blob:
            return 0, 0, 0, 0.0, "", "EmptyPayload"
        w = _stable_u32(blob, "w") % 1920 + 64
        h = _stable_u32(blob, "h") % 1080 + 64
        luma = (_stable_u32(blob, "l") % 256) / 255.0
        phash = hashlib.sha256(b"phash" + blob).hexdigest()[:16]
        return w, h, 3, luma, phash, None

    def _extract(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                w, h, c, luma, phash, err = _decode_image_stub(bytes(blob or b""))
                rows.append((mid, w, h, c, luma, phash, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_channels",
                    "mean_luma", "phash", "decode_error",
                ],
            )

    return media.select("media_id", "content").mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage. STUB kernel: truncates the payload proportionally to the
    area ratio (real impl: Pillow thumbnail + re-encode). Aspect ratio
    preserved; output dims are exact."""

    def _resize(batches):
        for pdf in batches:
            rows = []
            for mid, w, h, blob in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["content"]
            ):
                blob = bytes(blob or b"")
                scale = min(1.0, max_side / max(1, max(w, h)))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                keep = max(1, int(len(blob) * (nw * nh) / max(1, w * h)))
                rows.append((mid, nw, nh, blob[:keep]))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    return media.select("media_id", "width", "height", "content").mapInPandas(
        _resize, RESIZE_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video rows. STUB kernel: slices the payload into
    per-frame chunks at the sampling timestamps (real impl: pyav keyframe
    seek). Output: one row per sampled frame — the explode shape downstream
    vision models consume."""

    def _sample(batches):
        for pdf in batches:
            rows = []
            for mid, dur, blob in zip(pdf["media_id"], pdf["duration_ms"], pdf["content"]):
                blob = bytes(blob or b"")
                n = min(max_frames, max(1, int(dur) // every_ms + 1))
                step = max(1, len(blob) // n)
                for i in range(n):
                    rows.append((mid, i, i * every_ms, blob[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "ts_ms", "frame"])

    return media.select("media_id", "duration_ms", "content").mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Modality-level aggregate (bytes, dims) — the browse/stats query over a
    media lake; pure relational, oracle-checkable."""
    return (
        media.groupBy("modality", "media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
        )
        .orderBy("modality", "media_type")
    )
