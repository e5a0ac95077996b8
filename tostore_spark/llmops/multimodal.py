"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design: media rides in a ``binary`` column with a metadata struct alongside
(modality, mime, width/height/duration, sha256).  Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so each
task processes a columnar batch — the Spark-side plumbing (schema,
partitioning, batch shape) is real.

Codecs are PLUGGABLE: every stage takes a ``codec`` callable (cloudpickled
to executors with the stage closure) so a deployment with PIL/ffmpeg
injects its real decode through the public API.  This container has no
media libraries, so the built-in fallbacks are: ``deterministic_fake=True``
routes through the same codec hook with a content-hash-seeded fake
(stable across partitionings and retries — safe for speculative
execution); with neither codec nor fake, the stage raises
``NotImplementedError`` at execution time.

Reference parity note: the reference stores media as opaque blobs only
(table_schema.dart blob type) — decode stages are parity-plus.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional, Sequence

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


def _resolve_codec(codec, deterministic_fake: bool, fake_codec,
                   what: str):
    """codec > deterministic_fake > error.  The fake is itself a codec
    going through the same hook, so the plumbing test path exercises
    exactly what a real deployment runs."""
    if codec is not None:
        return codec
    if deterministic_fake:
        return fake_codec
    def _missing(*_a, **_kw):
        raise NotImplementedError(
            f"{what} requires a codec; this environment has no media "
            "libraries — pass codec=<callable> (e.g. a PIL/ffmpeg "
            "wrapper) or deterministic_fake=True for the plumbing path")
    return _missing


_FEATURE_SCHEMA = "id long, n_bytes long, sha256 string, feature array<float>"

# codec signature: (blob: bytes) -> Sequence[float]
FeatureCodec = Callable[[bytes], Sequence[float]]


def fake_feature_codec(feature_dim: int = 8) -> FeatureCodec:
    """Content-hash-seeded fake feature vector (deterministic, dim-fixed)."""
    def _codec(raw: bytes) -> list[float]:
        digest = hashlib.sha256(raw).digest()
        return [((digest[i % 32] / 255.0) * 2.0 - 1.0)
                for i in range(feature_dim)]
    return _codec


def extract_features(df: DataFrame, binary_field: str, id_field: str,
                     feature_dim: int = 8,
                     deterministic_fake: bool = False,
                     codec: Optional[FeatureCodec] = None) -> DataFrame:
    """Feature-extraction stage over media batches (mapInPandas, Arrow).

    ``codec(blob) -> feature vector`` plugs a real model/decoder in;
    ``deterministic_fake=True`` uses ``fake_feature_codec`` through the
    same hook.  The feature column stays ``array<float>`` regardless of
    codec, so downstream ANN/dedup stages are codec-agnostic."""
    fn = _resolve_codec(codec, deterministic_fake,
                        fake_feature_codec(feature_dim), "feature extraction")

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, blob in zip(pdf["id"], pdf["blob"]):
                raw = bytes(blob) if blob is not None else b""
                feat = [float(x) for x in fn(raw)]
                out.append((_id, len(raw),
                            hashlib.sha256(raw).hexdigest(), feat))
            yield pd.DataFrame(out, columns=["id", "n_bytes", "sha256", "feature"])

    narrow = df.select(F.col(id_field).cast("long").alias("id"),
                       F.col(binary_field).alias("blob"))
    return narrow.mapInPandas(_featurize, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = "id long, width int, height int, n_bytes long, blob binary"

# codec signature: (blob: bytes, width: int, height: int) -> bytes
ResizeCodec = Callable[[bytes, int, int], bytes]


def fake_resize_codec(raw: bytes, width: int, height: int) -> bytes:
    """Hash-seeded fake: one byte per target pixel."""
    seed = hashlib.sha256(raw).digest()
    n = width * height
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(df: DataFrame, binary_field: str, id_field: str,
                  width: int, height: int,
                  deterministic_fake: bool = False,
                  codec: Optional[ResizeCodec] = None) -> DataFrame:
    """Image resize stage over Arrow batches (mapInPandas).

    ``codec(blob, width, height) -> resized encoded bytes`` plugs a real
    decode→resize→encode call (PIL etc.); the fake path routes the same
    hook."""
    fn = _resolve_codec(codec, deterministic_fake, fake_resize_codec,
                        "image resize")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, blob in zip(pdf["id"], pdf["blob"]):
                raw = bytes(blob) if blob is not None else b""
                resized = bytes(fn(raw, width, height))
                out.append((_id, width, height, len(resized), resized))
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "n_bytes", "blob"])

    narrow = df.select(F.col(id_field).cast("long").alias("id"),
                       F.col(binary_field).alias("blob"))
    return narrow.mapInPandas(_resize, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = "id long, frame_idx int, ts_ms long, blob binary"

# codec signature: (blob, duration_ms, every_n_ms)
#                  -> iterable of (frame_idx, ts_ms, frame_bytes)
FrameCodec = Callable[[bytes, int, int], "Sequence[tuple[int, int, bytes]]"]


def fake_frame_codec(raw: bytes, duration_ms: int,
                     every_n_ms: int) -> list[tuple[int, int, bytes]]:
    """Hash-seeded fake frames every ``every_n_ms`` across the duration."""
    frames = []
    for i, ts in enumerate(range(0, max(duration_ms, 1), every_n_ms)):
        seed = hashlib.sha256(raw + i.to_bytes(4, "big")).digest()
        frames.append((i, ts, seed))
    return frames


def sample_frames(df: DataFrame, binary_field: str, id_field: str,
                  every_n_ms: int, duration_ms_field: str | None = None,
                  deterministic_fake: bool = False,
                  codec: Optional[FrameCodec] = None) -> DataFrame:
    """Video frame sampling: one output ROW per sampled frame (a fan-out
    mapInPandas stage — the batch shape real video pipelines need).
    ``codec(blob, duration_ms, every_n_ms)`` yields (frame_idx, ts_ms,
    frame_bytes) tuples — an ffmpeg wrapper in real deployments; the fake
    path routes the same hook."""
    fn = _resolve_codec(codec, deterministic_fake, fake_frame_codec,
                        "frame sampling")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, blob, dur in zip(pdf["id"], pdf["blob"], pdf["__dur"]):
                raw = bytes(blob) if blob is not None else b""
                duration = int(dur) if dur is not None else len(raw)
                for idx, ts, fb in fn(raw, duration, every_n_ms):
                    out.append((_id, int(idx), int(ts), bytes(fb)))
            yield pd.DataFrame(out, columns=["id", "frame_idx", "ts_ms", "blob"])

    dur = (F.col(duration_ms_field) if duration_ms_field
           else F.length(F.col(binary_field))).cast("long")
    narrow = df.select(F.col(id_field).cast("long").alias("id"),
                       F.col(binary_field).alias("blob"), dur.alias("__dur"))
    return narrow.mapInPandas(_frames, schema=_FRAME_SCHEMA)
