"""Multimodal columns: opaque binary payloads + typed metadata.

Mandated beyond-reference surface: image/audio/video as ``binary``
columns with a typed metadata struct, and decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages. The
media libraries are not installed in this container, so the DECODE
BODY is stubbed (deterministic fake derived from the bytes), while the
Spark-side plumbing — schema, batch shape, partition discipline — is
real and tested.

At 100 TB: binary payloads ride the columnar scan (parquet BINARY with
metadata in sibling columns, never inside the blob); per-batch decode
keeps Arrow transfer amortized; repartition BEFORE decode by target
core count bounds worker memory (batch bytes ≈ maxRecordsPerBatch ×
median blob size — tune spark.sql.execution.arrow.maxRecordsPerBatch
down for large media).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, mime string, width int, height int, "
    "duration_ms long, sample_rate int"
)

IMAGE_FEATURES_SCHEMA = (
    "path string, width int, height int, mode string, feature array<float>, is_stub boolean"
)

FRAME_SAMPLE_SCHEMA = "path string, frame_idx int, frame_ms long, frame binary"


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata from magic bytes — pure column ops, no decode."""
    magic = F.substring(F.col(content_col), 1, 4)
    mime = (
        F.when(magic == F.lit(b"\x89PNG"), "image/png")
        .when(F.substring(F.col(content_col), 1, 3) == F.lit(b"\xff\xd8\xff"), "image/jpeg")
        .when(magic == F.lit(b"RIFF"), "audio/wav")
        .when(magic == F.lit(b"OggS"), "audio/ogg")
        .otherwise("application/octet-stream")
    )
    media_type = (
        F.when(mime.startswith("image/"), "image")
        .when(mime.startswith("audio/"), "audio")
        .otherwise("binary")
    )
    return df.withColumn("mime", mime).withColumn("media_type", media_type)


def _stub_image_decode(data: bytes) -> tuple[int, int, str, list[float]]:
    """STUB: PIL is unavailable here. Deterministic fake decode — dims
    and a 8-dim feature derived from a content digest, so tests are
    reproducible and downstream shapes are exercised for real."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        img = Image.open(io.BytesIO(data))
        w, h = img.size
        mode = img.mode
    except ImportError:
        digest = hashlib.sha256(data).digest()
        w = 64 + digest[0] % 192
        h = 64 + digest[1] % 192
        mode = "STUB"
    digest = hashlib.sha256(data).digest()
    feature = [b / 255.0 for b in digest[:8]]
    return w, h, mode, feature


def image_features(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """Decode + featurize images in Arrow batches (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, data in zip(pdf[path_col], pdf[content_col]):
                w, h, mode, feat = _stub_image_decode(bytes(data))
                rows.append((path, w, h, mode, feat, mode == "STUB"))
            yield pd.DataFrame(
                rows, columns=["path", "width", "height", "mode", "feature", "is_stub"]
            )

    return df.select(path_col, content_col).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Frame sampling for video blobs — one row per sampled frame.

    STUB decode (no video lib in container): emits deterministic
    byte-slices as fake frames; the row-explosion shape, frame
    timestamps, and batch discipline are the real, tested part.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, data in zip(pdf[path_col], pdf[content_col]):
                raw = bytes(data)
                n = min(max_frames, max(1, len(raw) // 64))
                for i in range(n):
                    rows.append((path, i, i * every_ms, raw[i * 64 : (i + 1) * 64]))
            yield pd.DataFrame(rows, columns=["path", "frame_idx", "frame_ms", "frame"])

    return df.select(path_col, content_col).mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
