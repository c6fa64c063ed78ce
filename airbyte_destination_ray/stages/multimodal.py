"""Multimodal (image/audio/video) actor-pool stages.

Media payloads are opaque ``binary`` columns with typed metadata, processed
by CALLABLE CLASSES passed to ``map_batches(Cls, concurrency=N,
batch_size=B, num_cpus=c)`` — expensive setup (codec/model load) happens once
per actor in ``__init__``, per-batch work in ``__call__``.  Batch sizes are
small because each row carries a large payload; at 100 TB the same stages run
unchanged with ``concurrency`` sized to the cluster.

The image/audio codec libraries are NOT in this container, so the decode
kernels are STUBS: with ``strict=True`` they raise ``NotImplementedError``
(clearly marking the integration point); by default they produce
DETERMINISTIC FAKE decodes derived from the payload bytes, which keeps the
Ray-side plumbing — schemas, actor signatures, fan-out layout, batch sizing —
real and testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# recommended per-stage tuning: payloads are MBs/row, so small batches
DEFAULT_MEDIA_BATCH_SIZE = 32

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("kind", pa.string(), nullable=False),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
    ]
)


def _stub_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    return np.random.default_rng(seed)


def synthesize_media_table(
    n: int, *, kind: str = "image", payload_bytes: int = 4096, seed: int = 42
) -> pa.Table:
    """Deterministic fake media corpus (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([f"{kind}/fake"] * n),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageDecodeStage:
    """payload → (width, height, channels, mean_luma).

    Real implementation decodes with PIL/opencv (loaded once per actor in
    ``__init__``); the stub derives deterministic fake dimensions/stats from
    the payload hash.
    """

    def __init__(self, *, strict: bool = False):
        self.strict = strict
        self.decoder = None  # real impl: self.decoder = PIL.Image / cv2 here

    def _decode_one(self, payload: bytes | None):
        if payload is None:
            return None, None, None, None
        if self.strict:
            raise NotImplementedError(
                "image decoding requires PIL/opencv, not present in this "
                "container — stubbed (see stages/multimodal.py)"
            )
        rng = _stub_rng(payload)
        w = int(rng.integers(64, 2048))
        h = int(rng.integers(64, 2048))
        return w, h, 3, float(rng.random())

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = [self._decode_one(p) for p in batch.column("payload").to_pylist()]
        batch = batch.drop_columns(["payload"])  # decoded output drops raw bytes
        batch = batch.append_column(
            "width", pa.array([d[0] for d in decoded], type=pa.int32())
        )
        batch = batch.append_column(
            "height", pa.array([d[1] for d in decoded], type=pa.int32())
        )
        batch = batch.append_column(
            "channels", pa.array([d[2] for d in decoded], type=pa.int32())
        )
        batch = batch.append_column(
            "mean_luma", pa.array([d[3] for d in decoded], type=pa.float64())
        )
        return batch


class ImageResizeStage:
    """payload → resized payload (stub: deterministic truncation/pad to the
    target byte budget) + target dims."""

    def __init__(self, width: int = 224, height: int = 224, *, strict: bool = False):
        self.width = width
        self.height = height
        self.strict = strict
        self.target_bytes = width * height * 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("resize requires an image codec — stubbed")
        out = []
        for p in batch.column("payload").to_pylist():
            if p is None:
                out.append(None)
                continue
            rep = (p * (self.target_bytes // max(len(p), 1) + 1))[: self.target_bytes]
            out.append(rep)
        batch = batch.set_column(
            batch.column_names.index("payload"),
            "payload",
            pa.array(out, type=pa.binary()),
        )
        batch = batch.append_column(
            "width", pa.array([self.width] * batch.num_rows, type=pa.int32())
        )
        batch = batch.append_column(
            "height", pa.array([self.height] * batch.num_rows, type=pa.int32())
        )
        return batch


class AudioFeatureStage:
    """payload → fixed-dim feature vector (stub: hash-seeded floats) +
    duration estimate from byte length."""

    def __init__(self, dim: int = 16, sample_rate: int = 16000, *, strict: bool = False):
        self.dim = dim
        self.sample_rate = sample_rate
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("audio decoding requires a codec — stubbed")
        feats, durs = [], []
        for p in batch.column("payload").to_pylist():
            if p is None:
                feats.append(None)
                durs.append(None)
                continue
            durs.append(len(p) / (2 * self.sample_rate))  # 16-bit mono estimate
            feats.append(_stub_rng(p).random(self.dim).astype(np.float32).tolist())
        batch = batch.drop_columns(["payload"])
        batch = batch.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32()))
        )
        batch = batch.append_column(
            "duration_sec", pa.array(durs, type=pa.float64())
        )
        return batch


class VideoFrameSampleStage:
    """One video row → ``frames_per_video`` frame rows (fan-out layout:
    the output table is LONGER than the input — media_id + frame_idx key).

    Stub samples evenly spaced byte windows as fake frames.
    """

    def __init__(self, frames_per_video: int = 4, frame_bytes: int = 1024, *, strict: bool = False):
        self.n_frames = frames_per_video
        self.frame_bytes = frame_bytes
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video demux requires a codec — stubbed")
        ids, idxs, frames = [], [], []
        for mid, p in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if p is None:
                continue
            stride = max((len(p) - self.frame_bytes) // max(self.n_frames - 1, 1), 1)
            for i in range(self.n_frames):
                start = min(i * stride, max(len(p) - self.frame_bytes, 0))
                ids.append(mid)
                idxs.append(i)
                frames.append(p[start : start + self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int64()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def decode_images(ds, *, concurrency: int = 4, batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    """Actor-pool image decode over a media Dataset."""
    return ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(
    ds, *, frames_per_video: int = 4, concurrency: int = 4,
    batch_size: int = DEFAULT_MEDIA_BATCH_SIZE,
):
    """Actor-pool frame sampling (fan-out) over a media Dataset."""
    return ds.map_batches(
        VideoFrameSampleStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"frames_per_video": frames_per_video},
    )
