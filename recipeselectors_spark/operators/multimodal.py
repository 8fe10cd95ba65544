"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this container — ``decode_image_batch`` raises NotImplementedError unless
``fake=True``, which produces a deterministic fake decode), but the
Spark-side plumbing is real and tested: schema contract, Arrow batch shape,
``mapInPandas`` partition flow, and feature-column outputs.

Schema contract for a media table:
    (media_id:long, kind:string, payload:binary,
     meta:struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, "
    "feat array<double>, decode_ok boolean"
)


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> np.ndarray:
    """Decode a batch of image payloads to a (batch, 8) feature matrix.

    STUB: real decoding needs an image library not present in this
    container. With ``fake=True`` a deterministic byte-statistics
    pseudo-decode keeps the full pipeline testable (same output shape and
    dtype as a real thumbnail-pool implementation would have).
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (not in this container); "
            "pass fake=True for the deterministic test stub"
        )
    out = np.zeros((len(payloads), 8), dtype=np.float64)
    for i, buf in enumerate(payloads):
        if buf is None or len(buf) == 0:
            continue
        arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
        out[i] = [
            arr.mean(), arr.std(), arr.min(), arr.max(),
            float(len(arr)),
            float(arr[0]), float(arr[-1]),
            float(np.bitwise_xor.reduce(arr.astype(np.uint8))),
        ]
    return out


def extract_media_features(
    media: DataFrame, batch_size: int = 256, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas over the media table: Arrow batches in, per-item feature
    vectors out. Partitioning: payloads stay where they are (no shuffle);
    the UDF is a pure map."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                feats = decode_image_batch(chunk["payload"], fake=fake_decode)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": [
                            0 if b is None else len(b) for b in chunk["payload"]
                        ],
                        "feat": [row.tolist() for row in feats],
                        "decode_ok": [
                            b is not None and len(b) > 0
                            for b in chunk["payload"]
                        ],
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n: int = 10, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plan for video rows: which frame indices to decode —
    pure Catalyst over the metadata (no payload touched, so Parquet column
    pruning skips the heavy binary column entirely)."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.slice(idx, 1, max_frames).alias("frame_indices"),
    )


def synthesize_media_pandas(n: int = 64, seed: int = 21) -> pd.DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(16, 256))).astype(
            np.uint8
        ).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {
                    "width": 64 if kind == "image" else None,
                    "height": 64 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": int(rng.integers(30, 300)) if kind == "video" else None,
                },
            )
        )
    return pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
