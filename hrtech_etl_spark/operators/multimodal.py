"""Multimodal columns: typed binary assets + Arrow-batched transforms.

Media travel as opaque ``binary`` columns wrapped in a typed struct
(content + mime + metadata) — the pattern Spark's own ``binaryFile``
source uses, extended with per-asset metadata. The decode/resize/
frame-sample kernels are the only pieces that need media libraries
(Pillow/ffmpeg/torchaudio); those are NOT in this environment, so each
kernel is STUBBED behind ``NotImplementedError`` with a deterministic
fake used by default in tests — the Spark-side plumbing (schema,
``mapInPandas`` batch shape, Arrow transfer, partition sizing) is real
and tested.

Design rules for 100 TB of media:

- Assets stay binary end-to-end; only *features* (small arrays) leave
  the executor. Never collect media to the driver.
- All transforms are ``mapInPandas`` / pandas UDFs over Arrow batches:
  one Python roundtrip per ~10k-row batch, never per row.
- ``spark.sql.files.maxPartitionBytes`` (not row count) governs task
  sizing for binary scans; re-chunk with ``spread`` only when a
  CPU-heavy kernel follows a low-parallelism scan.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source_id", T.LongType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
        ),
    ]
)


def media_column(content: Column, mime: Column, source_id: Column) -> Column:
    """Assemble the typed media struct from a binary payload."""
    return F.struct(
        content.alias("content"),
        mime.alias("mime"),
        F.struct(
            source_id.cast("long").alias("source_id"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("checksum"),
        ).alias("meta"),
    )


def attach_fake_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic media fixture: each document's text bytes stand in
    for an image payload (same shape the real pipeline has after a
    binaryFile-source join)."""
    content = F.encode(F.col(text_col), "utf-8").cast("binary")
    return df.withColumn(
        "media", media_column(content, F.lit("image/fake"), F.col(id_col))
    )


# ---------------------------------------------------------------------------
# Kernels (stubs + deterministic fakes)
# ---------------------------------------------------------------------------

def decode_image(content: bytes) -> "object":
    """Real decode needs Pillow — not available here by design."""
    raise NotImplementedError(
        "image decode requires Pillow; inject a kernel via features_udf(...)"
    )


def fake_image_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an image-embedding kernel: md5-seeded
    pseudo-features in [0, 1). Stable across engines and processes, so
    tests and oracles can assert exact values."""
    out = []
    for i in range(dim):
        h = hashlib.md5(b"%d:" % i + content).hexdigest()[:8]
        out.append(round(int(h, 16) / 0xFFFFFFFF, 6))
    return out


def fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a resize kernel: tags the payload so
    lineage is observable without a codec."""
    return b"resized:%dx%d:" % (width, height) + content[:64]


def fake_frame_sample(content: bytes, every_n: int) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: byte-stride
    slices standing in for decoded frames."""
    return [content[i : i + 16] for i in range(0, len(content), 16 * every_n)][:8]


# ---------------------------------------------------------------------------
# Arrow-batched operators
# ---------------------------------------------------------------------------

def media_features(
    df: DataFrame,
    *,
    media_col: str = "media",
    id_col: str = "doc_id",
    dim: int = 8,
    kernel: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Feature extraction: (id, media) → (id, mime, n_bytes, features).

    ``mapInPandas`` contract: each batch arrives as a pandas DataFrame
    whose binary column holds Python ``bytes``; the kernel runs once
    per asset inside the Arrow batch (no per-row Python round trip).
    Swap ``kernel`` for a real model (e.g. CLIP) without touching the
    plumbing — output schema stays (id, mime, n_bytes, array<double>).
    """
    kern = kernel or (lambda b: fake_image_features(b, dim))
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "mime": [m["mime"] for m in media],
                    "n_bytes": [len(m["content"]) for m in media],
                    "features": [kern(bytes(m["content"])) for m in media],
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, schema=out_schema)


def media_resize(
    df: DataFrame,
    *,
    width: int,
    height: int,
    media_col: str = "media",
    kernel: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize: rewrites ``media.content`` in place (struct rebuilt so
    meta.n_bytes/checksum stay consistent with the new payload)."""
    kern = kernel or fake_resize

    @F.pandas_udf(T.BinaryType())
    def resize_udf(content: pd.Series) -> pd.Series:
        return content.map(lambda b: kern(bytes(b), width, height))

    new_content = resize_udf(F.col(f"{media_col}.content"))
    return df.withColumn(
        media_col,
        media_column(
            new_content,
            F.col(f"{media_col}.mime"),
            F.col(f"{media_col}.meta.source_id"),
        ),
    )


def media_frame_sample(
    df: DataFrame,
    *,
    every_n: int = 4,
    media_col: str = "media",
    id_col: str = "doc_id",
    kernel: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (id, frame_idx,
    frame) — the explode-shaped transform video pipelines need. Frames
    are emitted from inside the Arrow batch, so a long video never
    materializes all its frames in one Python list per partition."""
    kern = kernel or fake_frame_sample
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, m in zip(pdf[id_col], pdf[media_col]):
                for i, fr in enumerate(kern(bytes(m["content"]), every_n)):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, media_col).mapInPandas(run, schema=out_schema)
