"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode is REAL for the codec-library-free formats (PNG/BMP/PPM images,
PCM WAV audio — ``pipeline/imagecodec.py``, pure stdlib+numpy): payloads
are routed by magic bytes to a decoder and real features (dimensions,
statistics, 8×8 aHash bits for images; duration/rms/zcr/centroid for
audio). Formats that require native codecs (JPEG, video containers —
libjpeg/ffmpeg are absent here) fall back to a deterministic
payload-hash feature with ``decoded = false``, keeping the pipeline
shape intact; that fallback is the declared plug point for a real
deployment's PIL/libvips/ffmpeg step.

Reference parity: nixiesearch decodes images inside its embedding
preprocessors (``core/nn/model/embedding/*``); this module is the
Spark-side analog of that decode step feeding feature/embedding UDFs.

At 100 TB: repartition upstream so (rows_per_partition × blob_size) fits
executor memory; Arrow batch size is capped by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Decoding is per-blob
CPU work with no shuffle — it scales linearly with executors.
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
    BooleanType,
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
        StructField("decoded", BooleanType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def hash_features(payload: bytes) -> np.ndarray:
    """Deterministic 8-dim payload-hash feature — the fallback for formats
    whose decoders need native libraries (JPEG/video), and the feature the
    undecodable-payload path always produces."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:32], dtype=np.uint8)[:8].astype(np.float32) / 255.0


def media_features(payload: bytes) -> tuple[bool, np.ndarray]:
    """(decoded, features) for one blob: real decode when a codec exists
    for the sniffed container, hash fallback otherwise."""
    from nixiesearch_spark.pipeline import imagecodec as ic

    kind = ic.sniff(payload)
    try:
        if kind in ("png", "bmp", "ppm"):
            return True, ic.image_features(ic.decode_image(payload))
        if kind == "wav":
            return True, ic.audio_features(*ic.decode_wav(payload))
    except Exception:
        # unsupported variant OR a corrupt/truncated payload that merely
        # starts with a matching magic (zlib/struct errors) — one bad blob
        # must degrade to the hash feature, never fail the Spark job
        pass
    return False, hash_features(payload)


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow moves
    the binary batches; decode happens executor-side, no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded, feats = [], []
            for p in pdf["payload"]:
                ok, f = media_features(p)
                decoded.append(ok)
                feats.append(f.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "decoded": decoded,
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: REAL payloads (PNG/BMP/PPM
    images, PCM WAV audio — encoded by imagecodec) interleaved with
    undecodable video-ish blobs exercising the hash-fallback path."""
    from nixiesearch_spark.pipeline import imagecodec as ic

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        which = i % 5
        if which < 3:  # image in one of the three real formats
            h, w = int(rng.integers(4, 48)), int(rng.integers(4, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            enc = [ic.encode_png, ic.encode_bmp, ic.encode_ppm][which]
            mime = ["image/png", "image/bmp", "image/x-portable-pixmap"][which]
            rows.append(
                (i, "image", mime, bytearray(enc(img)), w, h, None)
            )
        elif which == 3:  # real PCM WAV
            sr = 8000
            nsamp = int(rng.integers(100, 2000))
            sig = (rng.normal(0, 0.2, nsamp).clip(-1, 1) * 32767).astype(np.int16)
            rows.append(
                (
                    i, "audio", "audio/wav", bytearray(ic.encode_wav(sig, sr)),
                    None, None, int(nsamp * 1000 / sr),
                )
            )
        else:  # video: no codec in-container → hash-fallback path
            payload = rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8)
            rows.append(
                (i, "video", "video/mp4", bytearray(payload.tobytes()),
                 None, None, int(rng.integers(1000, 600000)))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
