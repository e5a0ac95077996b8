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


def resize_images(df: DataFrame, binary_field: str, id_field: str,
                  width: int, height: int) -> DataFrame:
    """Image resize stage — STUB: the mapInPandas plumbing is identical to
    extract_features; the codec call is not available in this container."""
    raise NotImplementedError(
        "image codecs unavailable; plumbing pattern is extract_features()")


def sample_frames(df: DataFrame, binary_field: str, id_field: str,
                  every_n_ms: int) -> DataFrame:
    """Video frame sampling stage — STUB (same plumbing pattern)."""
    raise NotImplementedError(
        "video codecs unavailable; plumbing pattern is extract_features()")
