"""Deterministic id / naming scalar functions (reference parity: M4, §2.6).

``airbyte_raw_id`` reproduces the reference's ``getAirbyteRawID``
(internal/connector/destination.go:502-510) exactly — uuid-shaped sha256 over
``namespace\\0stream\\0recordIndex\\0emittedAt`` — and is verified against the
three golden UUIDs of destination_test.go:226-269.  It is **replay-critical**:
record index is the global 0-based position over the whole sync input
(destination.go:393,423,453), so re-running a sync over the same input yields
the same ids, which is what makes append-mode re-delivery dedupable.
"""

from __future__ import annotations

import hashlib

import numpy as np


def airbyte_raw_id(namespace: str, stream: str, record_index: int, emitted_at_ms: int) -> str:
    """uuid-formatted sha256 of ns\\0stream\\0index\\0emitted_at (destination.go:502-510)."""
    payload = "\x00".join([namespace, stream, str(record_index), str(emitted_at_ms)])
    h = hashlib.sha256(payload.encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def raw_ids_for_batch(
    namespace: str,
    stream: str,
    record_indices: np.ndarray,
    emitted_at_ms: np.ndarray,
) -> np.ndarray:
    """Vectorized-ish raw-id for a batch.

    sha256 has no numpy kernel, so this is a tight Python loop over the batch
    (thousands of rows), not over the dataset — amortized by ``map_batches``
    batch size.  The per-row cost is one hash of a ~40-byte payload.
    """
    prefix = f"{namespace}\x00{stream}\x00".encode()
    out = np.empty(len(record_indices), dtype=object)
    sha256 = hashlib.sha256
    for i, (idx, ts) in enumerate(zip(record_indices, emitted_at_ms)):
        h = sha256(prefix + str(idx).encode() + b"\x00" + str(ts).encode()).hexdigest()
        out[i] = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
    return out


def table_unique_name(namespace: str, stream: str) -> str:
    """``namespace_stream``; bare stream when namespace is empty
    (reference getDataSourceUniqueName, destination.go:494-500)."""
    if not namespace:
        return stream
    return f"{namespace}_{stream}"


def rfc3339_nano(dt) -> str:
    """RFC3339Nano-style timestamp string (reference destination.go:208).

    Go's RFC3339Nano trims trailing zeros from the fractional seconds; we
    reproduce that trimming.
    """
    s = dt.strftime("%Y-%m-%dT%H:%M:%S")
    frac = f"{dt.microsecond:06d}".rstrip("0")
    if frac:
        s += "." + frac
    return s + "Z"
