"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this container —
see ``decode_image_stub``); the Spark-side plumbing is real and tested:
schema contract, partition sizing for large blobs, batched UDF signature,
deterministic fake features so pipelines downstream are testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_sha", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: a real deployment decodes with PIL/libvips here. This container
    has neither, so we derive a deterministic 8-dim fake feature from the
    payload bytes — keeps the full pipeline shape testable end-to-end."""
    if payload is None:
        raise NotImplementedError("real image decode requires PIL/libvips; payload missing")
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:32], dtype=np.uint8)[:8].astype(np.float32) / 255.0)


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary batches; each pandas batch is processed
    vectorized (one hashlib call per blob is the stand-in for the decoder).
    At 100 TB: repartition upstream so (rows_per_partition × blob_size)
    fits executor memory; Arrow batch size is capped by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload.tobytes()),
                int(rng.integers(16, 4096)) if kind == "image" else None,
                int(rng.integers(16, 4096)) if kind == "image" else None,
                int(rng.integers(1000, 600000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
