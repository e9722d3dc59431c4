"""Multimodal column plumbing (image/audio/video as opaque binary + metadata).

The Spark-side plumbing — schemas, partition-preserving mapInPandas transforms,
Arrow batch shapes, deterministic fake decode — is REAL and tested; the actual
codec calls are stubbed (``NotImplementedError``) because no image/audio
libraries exist in this container. On a real cluster, swap ``_decode_stub`` for
PIL/torchaudio/ffmpeg calls inside the same batch iterator: the distribution
story (binary column stays opaque to the JVM, decode happens in Arrow-batched
Python workers, output is fixed-width features) is already in place.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

REAL_DECODE = False  # flip when codec libs are installed on the cluster


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: feature vector derived from payload bytes.

    Stands in for (image: resize+embed, audio: mel features, video: frame
    sample+embed). Deterministic so tests are stable.
    """
    if payload is None:
        return np.full(8, np.nan)
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float64)
    return np.array(
        [
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            float(len(payload)),
            float(arr[::8].sum()),
            float((arr > 127).mean()),
            # str hash() is process-salted -> NOT deterministic across executors
            float({"image": 1.0, "audio": 2.0, "video": 3.0}.get(kind, 0.0)),
        ]
    )


def decode_features(df: DataFrame, out_width: int = 8) -> DataFrame:
    """Extract fixed-width features from media payloads via mapInPandas
    (vectorized over Arrow batches; one numpy stack per batch)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "payload"]
        + [T.StructField("media_features", T.ArrayType(T.DoubleType()), True)]
    )
    cols = [f.name for f in out_schema.fields if f.name != "media_features"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if REAL_DECODE:
            raise NotImplementedError(
                "real media decode requires PIL/torchaudio/ffmpeg; not in this container"
            )
        for pdf in batches:
            feats = [
                _decode_stub(p, k)
                for p, k in zip(pdf["payload"].tolist(), pdf["kind"].tolist())
            ]
            out = pdf[cols].copy()
            out["media_features"] = [f.tolist() for f in feats]
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def gen_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads from hash bytes)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.unhex(
        F.concat(
            *[F.lpad(F.hex(F.abs(F.xxhash64("id", F.lit(seed + i)))), 16, "0") for i in range(8)]
        )
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(1000).cast("int").alias("duration_ms"),
        payload.alias("payload"),
    )
