"""Multimodal column plumbing — image/audio/video as opaque binary + typed
metadata (task brief: Spark-side plumbing real and tested; codec decode
REAL for stdlib-decodable formats as of r3 — PCM WAV, 8-bit PNG, binary
PPM/PGM via functions/codecs.py — and honestly stubbed for formats that
need external codec libraries, JPEG/MP4/...).

Pattern: media rows carry (url, kind, payload binary, meta map). Feature
extraction runs as mapInPandas over Arrow batches — binary columns arrive
as zero-copy buffers, outputs are fixed-width float vectors, so the
shuffle after extraction is narrow regardless of payload size. Partitioning
guidance at scale: repartition by url-bucket BEFORE extraction so payload
bytes move once, then only features flow.

``decode`` is the single seam: real codecs plug in behind it (PIL/ffmpeg
import-gated); the default is a deterministic fake (seeded from payload
bytes) so the pipeline shape is fully testable in this sandbox.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_DIM = 16


def media_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),  # image|audio|video
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )


def _real_decode(payload: bytes, kind: str) -> np.ndarray:
    """REAL decode for stdlib-decodable formats (r3 — was a full stub):
    PCM WAV (manual RIFF parse), 8-bit PNG (zlib + filter
    reconstruction), binary PPM/PGM — see functions/codecs.py. Formats
    that need external codec libraries (JPEG, MP4, ...) still raise, with
    an honest message; PIL/ffmpeg would plug in here."""
    from rkmh_spark.functions.codecs import real_decode_features

    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    return real_decode_features(payload, kind, dim=FEATURE_DIM)


def deterministic_fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode: FEATURE_DIM floats derived from sha256(payload).

    Deterministic and collision-resistant enough for pipeline tests; NOT a
    real feature extractor (clearly marked per the task brief).
    """
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    d = hashlib.sha256(payload).digest() + hashlib.sha256(b"k" + payload).digest()
    raw = np.frombuffer(d[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw / np.float32(2**32)).astype(np.float32)


def extract_features(
    media: DataFrame,
    decode: Callable[[bytes, str], np.ndarray] = deterministic_fake_decode,
) -> DataFrame:
    """media → (url, kind, features array<float>, payload_bytes long)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, k_) for p, k_ in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"].values,
                    "kind": pdf["kind"].values,
                    "features": feats,
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
            T.StructField("payload_bytes", T.LongType(), False),
        ]
    )
    return media.select("url", "kind", "payload").mapInPandas(kernel, schema=schema)


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
) -> DataFrame:
    """Video frame sampling plumbing: deterministic byte-offset windows
    standing in for decoded frames (STUB decode; real path would slice
    decoded frames at the same indices). → (url, frame_idx, frame_bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, frames = [], [], []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                step = max(1, len(payload) // n_frames)
                for i in range(min(n_frames, len(payload))):
                    urls.append(url)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step : i * step + 64]))
            yield pd.DataFrame(
                {"url": urls, "frame_idx": idxs, "frame_bytes": frames}
            )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
        ]
    )
    return media.select("url", "payload").mapInPandas(kernel, schema=schema)
