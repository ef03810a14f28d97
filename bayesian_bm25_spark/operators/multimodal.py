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

The featurizer output is scalar-only (``chunk_sig`` is a '|'-joined
string, not an array) so downstream canonicalization/sorting works, and
every column has an exact DuckDB oracle (entry ``multimodal_features``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, byte_mean double, "
    "byte_entropy double, chunk_sig string"
)

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)
_MASK63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Decode an image payload to HxWxC uint8.  STUB: requires an image
    library (PIL/opencv) not present in this container."""
    raise NotImplementedError("image decoding requires an image library (not in container)")


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """Decode an audio payload to a PCM float array.  STUB: requires an
    audio library (soundfile/ffmpeg) not present in this container."""
    raise NotImplementedError("audio decoding requires an audio library (not in container)")


def fnv_chunk_hashes(payloads: list[bytes], n_chunks: int = 4, cap: int = 256) -> np.ndarray:
    """(n, n_chunks) int64 FNV-1a rolling hashes, vectorized ACROSS docs.

    Each payload is split into ``n_chunks`` contiguous chunks
    (numpy.array_split boundaries: chunk c starts at c·(n//k)+min(c, n%k));
    the hash folds the first ``cap`` bytes of each chunk.  The fold is a
    sequential xor-multiply chain, so it is vectorized across the batch
    dimension instead: one (rows, cap) matrix, ``cap`` numpy steps total —
    no per-document Python loop in the fold.  Top bit cleared so the value
    fits a signed 64-bit column.
    """
    mats = []
    for b in payloads:
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        mat = np.full((n_chunks, cap), -1, dtype=np.int16)
        if arr.size:
            div, rem = divmod(arr.size, n_chunks)
            for c in range(n_chunks):
                start = c * div + min(c, rem)
                size = div + (1 if c < rem else 0)
                chunk = arr[start : start + min(size, cap)]
                mat[c, : len(chunk)] = chunk
        mats.append(mat)
    if not mats:
        return np.empty((0, n_chunks), dtype=np.int64)
    m = np.concatenate(mats)
    acc = np.full(m.shape[0], FNV_OFFSET, dtype=np.uint64)
    for j in range(cap):
        col = m[:, j]
        live = col >= 0
        if not live.any():
            break
        acc[live] = (acc[live] ^ col[live].astype(np.uint64)) * FNV_PRIME
    return (acc & _MASK63).astype(np.int64).reshape(-1, n_chunks)


def byte_stats(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n_bytes, byte_mean, byte_entropy) per payload (Shannon, log2)."""
    n = np.empty(len(payloads), dtype=np.int64)
    mean = np.zeros(len(payloads), dtype=np.float64)
    ent = np.zeros(len(payloads), dtype=np.float64)
    for i, b in enumerate(payloads):
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        n[i] = arr.size
        if arr.size:
            counts = np.bincount(arr, minlength=256).astype(np.float64)
            p = counts[counts > 0] / arr.size
            mean[i] = float(arr.mean())
            ent[i] = float(-(p * np.log2(p)).sum())
    return n, mean, ent


def extract_stub_features(df: DataFrame, n_chunks: int = 4) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, blob, mime) rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["blob"]]
            n_bytes, mean, ent = byte_stats(payloads)
            hashes = fnv_chunk_hashes(payloads, n_chunks=n_chunks)
            sigs = ["|".join(str(int(h)) for h in row) for row in hashes]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes,
                    "byte_mean": mean,
                    "byte_entropy": ent,
                    "chunk_sig": sigs,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
