"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample stages over opaque binary payload columns.

Image/audio/video payloads are treated as opaque ``binary`` columns
with typed metadata (media_type, width/height/duration), exactly how
the reference treats chunk payloads as opaque byte buffers
(reference: include/config.h:53-56 — bytes in, bytes out).

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the codec step is STUBBED: ``DecodeMedia`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the payload hash) produces
arrays of the declared shape.  Everything around the stub — schema,
actor-pool signature, batch sizing, output layout — is real and
tested, so swapping in a real codec is a one-function change.

Scale notes: payload rows are large; use a small ``batch_size`` (the
per-batch bytes, not row count, is what must fit the worker heap) and
an actor pool (decoder state loads once per actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from dedup_restore_ray.functions.hashing import hash_bytes_u64


class DecodeMedia:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    Use as ``ds.map_batches(DecodeMedia(fake=True), batch_format="pyarrow",
    batch_size=64, concurrency=N)``.  Real codecs load in __init__.
    """

    def __init__(self, payload_col: str = "payload", feature_dim: int = 64,
                 fake: bool = False):
        self.payload_col = payload_col
        self.feature_dim = feature_dim
        self.fake = fake
        if not fake:
            # real decoder would be constructed here (once per actor)
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "pass fake=True for the deterministic stub decoder")

    def _decode_one(self, payload: bytes | None) -> np.ndarray:
        if payload is None:
            return np.zeros(self.feature_dim, dtype=np.float32)
        seed = hash_bytes_u64(payload) & 0xFFFFFFFF
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        feats = np.stack([self._decode_one(p) for p in payloads]) \
            if payloads else np.zeros((0, self.feature_dim), np.float32)
        flat = pa.array(feats.reshape(-1), pa.float32())
        offsets = pa.array(
            np.arange(len(payloads) + 1, dtype=np.int32) * self.feature_dim)
        out = batch.drop_columns([self.payload_col])
        return (out.append_column("features",
                                  pa.ListArray.from_arrays(offsets, flat))
                   .append_column("payload_bytes", pa.array(
                       [len(p) if p else 0 for p in payloads], pa.int64())))


class ResizeImage:
    """Actor-pool stage stub: binary image -> binary image at (w, h).
    Real implementation would use PIL; the stub passes bytes through
    and records the target shape (schema-correct plumbing)."""

    def __init__(self, width: int, height: int, payload_col: str = "payload"):
        self.width = width
        self.height = height
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return (batch.append_column("target_w",
                                    pa.array([self.width] * n, pa.int32()))
                     .append_column("target_h",
                                    pa.array([self.height] * n, pa.int32())))


class FrameSample:
    """Actor-pool stage stub: video payload -> every-k-th frame refs.
    Emits (doc ref, frame_index) rows — the flat_map shape a real
    ffmpeg-backed sampler would produce."""

    def __init__(self, every_k: int = 10, duration_col: str = "duration_s",
                 fps: float = 30.0):
        self.every_k = every_k
        self.duration_col = duration_col
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs = batch.column(self.duration_col).to_pylist()
        n_frames = [max(0, int((d or 0) * self.fps)) // self.every_k
                    for d in durs]
        idx = np.repeat(np.arange(batch.num_rows), n_frames)
        frames = np.concatenate(
            [np.arange(k, dtype=np.int64) * self.every_k for k in n_frames]
        ) if n_frames else np.empty(0, np.int64)
        out = batch.select([batch.schema.names[0]]).take(pa.array(idx))
        return out.append_column("frame_index", pa.array(frames))


def synth_media_table(docs: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic fake media payloads derived from a docs table (the
    testdata has no binary columns; payload = utf-8 bytes + sha1 tag)."""
    texts = docs.column(text_col).to_pylist()
    payloads = [
        (t or "").encode() + hashlib.sha1((t or "").encode()).digest()
        for t in texts]
    return pa.table({
        "doc_id": docs.column("doc_id"),
        "media_type": pa.array(["image/fake"] * len(texts)),
        "payload": pa.array(payloads, pa.binary()),
        "duration_s": pa.array([len(t or "") / 100.0 for t in texts]),
    })
