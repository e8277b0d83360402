"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Graft addition for training-data pipelines. Images/audio/video travel as
`binary` columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched functions over mapInPandas.

The actual codec step is STUBBED (this container ships no image/audio libs):
`decode_media` raises NotImplementedError by design, and the tested pipeline
uses `fake_decode_features` — a deterministic byte-level stand-in with the
same Spark-side shape (schema, batch iteration, output arity) so swapping in
a real decoder is a one-function change. The Spark plumbing (schemas,
mapInPandas signatures, batch-shape invariance) is real and tested.

Scale notes: payloads dominate row width — `media_features` projects payload
away immediately after the UDF so downstream stages shuffle only features;
partition sizing must budget `spark.sql.execution.arrow.maxRecordsPerBatch`
x payload size per batch (see session.py defaults).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

N_FEATURES = 16  # byte-histogram buckets in the deterministic fake decoder

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def decode_media(payload: bytes, codec: str) -> np.ndarray:
    """Real codec hook — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; wire a decoder here and media_features picks it up"
    )


def _byte_histogram(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode': normalized 16-bucket byte histogram."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(N_FEATURES, dtype=np.float64)
    hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
    return hist / arr.size


def fake_decode_features(payloads: pd.Series) -> pd.DataFrame:
    """Vectorized-per-batch stand-in for decode + feature extraction."""
    feats = [_byte_histogram(p if p is not None else b"") for p in payloads]
    return pd.DataFrame({"features": feats})


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from the documents corpus (payload = utf-8
    text bytes posing as an encoded frame; meta derived arithmetically)."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            kind.alias("kind"),
            ((F.col(id_col) % 7 + 1) * 64).cast("int").alias("width"),
            ((F.col(id_col) % 5 + 1) * 64).cast("int").alias("height"),
            F.lit("fake/v1").alias("codec"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction; payload dropped at the UDF boundary."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = fake_decode_features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": feats["features"],
                }
            )

    return media.mapInPandas(gen, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = 64, every: int = 2) -> DataFrame:
    """Deterministic frame sampler: split payload into `frame_bytes` chunks,
    keep every `every`-th chunk — the video-sampling plumbing shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                n = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(0, n, every):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(gen, schema=FRAMES_SCHEMA)
