"""Multimodal columns: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB scale: the payload is an opaque
``binary`` column with a ``mime`` metadata column; decode / feature
extraction / resize / frame-sampling run as Arrow-batched ``mapInPandas``
stages so each task streams record batches without materializing the
whole partition.  The decode step itself is a STUB in this container
(no image/audio libraries available): ``decode_image``/``decode_audio``
raise ``NotImplementedError``, and ``extract_stub_features`` substitutes
a deterministic byte-level featurizer so the Spark-side plumbing —
schema, batch shape, UDF signature, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, byte_mean double, "
    "byte_entropy double, chunk_hashes array<long>"
)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Decode an image payload to HxWxC uint8.  STUB: requires an image
    library (PIL/opencv) not present in this container."""
    raise NotImplementedError("image decoding requires an image library (not in container)")


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """Decode an audio payload to a PCM float array.  STUB: requires an
    audio library (soundfile/ffmpeg) not present in this container."""
    raise NotImplementedError("audio decoding requires an audio library (not in container)")


def _byte_features(payload: bytes, n_chunks: int = 4) -> tuple[float, float, list[int]]:
    """Deterministic stand-in featurizer: byte mean, byte entropy, and
    per-chunk polynomial rolling hashes (the 'document fingerprinting'
    primitive applied to binary payloads)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0.0, [0] * n_chunks
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts[counts > 0] / arr.size
    entropy = float(-(p * np.log2(p)).sum())
    hashes = []
    for chunk in np.array_split(arr, n_chunks):
        h = np.uint64(1469598103934665603)  # FNV offset basis
        prime = np.uint64(1099511628211)
        # vectorized FNV-1a via cumulative fold in blocks
        acc = h
        for b in chunk[:256]:  # cap per-chunk work; deterministic prefix
            acc = np.uint64((int(acc) ^ int(b)) * int(prime) & 0xFFFFFFFFFFFFFFFF)
        hashes.append(int(np.int64(np.uint64(acc) & np.uint64(0x7FFFFFFFFFFFFFFF))))
    return float(arr.mean()), entropy, hashes


def extract_stub_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, blob, mime) rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, mime in zip(pdf["doc_id"], pdf["blob"], pdf["mime"]):
                mean, ent, hashes = _byte_features(bytes(blob))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "mime": mime,
                        "n_bytes": len(bytes(blob)),
                        "byte_mean": mean,
                        "byte_entropy": ent,
                        "chunk_hashes": hashes,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
