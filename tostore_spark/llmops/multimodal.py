"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design: media rides in a ``binary`` column with a metadata struct alongside
(modality, mime, width/height/duration, sha256).  Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so each
task processes a columnar batch — the Spark-side plumbing (schema,
partitioning, batch shape) is real; the actual codec calls are STUBBED
because image/audio libraries are not available in this container:
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``deterministic_fake=True``, which produces seeded fake features so the
pipeline shape is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("modality", T.StringType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha256", T.StringType(), True),
])


def attach_media(df: DataFrame, binary_field: str, modality: str,
                 mime: str) -> DataFrame:
    """Wrap a binary column with its typed metadata struct (computed
    JVM-side: length + sha2 are built-ins, no Python)."""
    b = F.col(binary_field)
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime"),
        F.length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("sha256"),
    )
    return df.withColumn(f"{binary_field}_meta", meta)


_FEATURE_SCHEMA = "id long, n_bytes long, sha256 string, feature array<float>"


def extract_features(df: DataFrame, binary_field: str, id_field: str,
                     feature_dim: int = 8,
                     deterministic_fake: bool = False) -> DataFrame:
    """Feature-extraction stage over media batches (mapInPandas, Arrow).

    Real deployments plug a codec/model call into `_featurize`; here it is
    STUBBED: raises NotImplementedError unless deterministic_fake, which
    derives a seeded feature vector from the content hash (stable across
    partitionings and retries — safe for speculative execution).
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decoding requires codec libraries not present in "
                    "this environment; pass deterministic_fake=True for the "
                    "plumbing test path")
            out = []
            for _id, blob in zip(pdf["id"], pdf["blob"]):
                raw = bytes(blob) if blob is not None else b""
                digest = hashlib.sha256(raw).digest()
                feat = [((digest[i % 32] / 255.0) * 2.0 - 1.0)
                        for i in range(feature_dim)]
                out.append((_id, len(raw), digest.hex(), feat))
            yield pd.DataFrame(out, columns=["id", "n_bytes", "sha256", "feature"])

    narrow = df.select(F.col(id_field).cast("long").alias("id"),
                       F.col(binary_field).alias("blob"))
    return narrow.mapInPandas(_featurize, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = "id long, width int, height int, n_bytes long, blob binary"


def resize_images(df: DataFrame, binary_field: str, id_field: str,
                  width: int, height: int,
                  deterministic_fake: bool = False) -> DataFrame:
    """Image resize stage over Arrow batches (mapInPandas).

    The CODEC is stubbed (no image libraries in this container): real
    deployments replace ``_fake_resize`` with a decode→resize→encode call;
    the Spark-side plumbing — schema, batching, partition independence —
    is real and runs with ``deterministic_fake=True`` (content-hash-seeded
    output bytes sized to the target geometry)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; pass "
                    "deterministic_fake=True for the plumbing test path")
            out = []
            for _id, blob in zip(pdf["id"], pdf["blob"]):
                raw = bytes(blob) if blob is not None else b""
                seed = hashlib.sha256(raw).digest()
                n = width * height  # 1 fake byte per pixel
                fake = (seed * (n // len(seed) + 1))[:n]
                out.append((_id, width, height, len(fake), fake))
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "n_bytes", "blob"])

    narrow = df.select(F.col(id_field).cast("long").alias("id"),
                       F.col(binary_field).alias("blob"))
    return narrow.mapInPandas(_resize, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = "id long, frame_idx int, ts_ms long, blob binary"


def sample_frames(df: DataFrame, binary_field: str, id_field: str,
                  every_n_ms: int, duration_ms_field: str | None = None,
                  deterministic_fake: bool = False) -> DataFrame:
    """Video frame sampling: one output ROW per sampled frame (a fan-out
    mapInPandas stage — the batch shape real video pipelines need).  Codec
    stubbed as above; the fake path derives a deterministic frame count
    from the blob size and emits hash-seeded frame blobs."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video codecs unavailable in this environment; pass "
                    "deterministic_fake=True for the plumbing test path")
            out = []
            for _id, blob, dur in zip(pdf["id"], pdf["blob"], pdf["__dur"]):
                raw = bytes(blob) if blob is not None else b""
                duration = int(dur) if dur is not None else len(raw)
                for i, ts in enumerate(range(0, max(duration, 1), every_n_ms)):
                    seed = hashlib.sha256(raw + i.to_bytes(4, "big")).digest()
                    out.append((_id, i, ts, seed))
            yield pd.DataFrame(out, columns=["id", "frame_idx", "ts_ms", "blob"])

    dur = (F.col(duration_ms_field) if duration_ms_field
           else F.length(F.col(binary_field))).cast("long")
    narrow = df.select(F.col(id_field).cast("long").alias("id"),
                       F.col(binary_field).alias("blob"), dur.alias("__dur"))
    return narrow.mapInPandas(_frames, schema=_FRAME_SCHEMA)
