"""Multimodal column stages: decode / feature-extract / resize /
frame-sample over opaque binary payload columns.

Image/audio/video payloads are treated as opaque ``binary`` columns
with typed metadata (media_type, duration), exactly how the reference
treats chunk payloads as opaque byte buffers (reference:
include/config.h:53-56 — bytes in, bytes out).

The decode step is REAL for the uncompressed formats a pure-python
decoder can handle (functions/codecs.py): PPM/PGM images, PCM WAV
audio, YUV4MPEG2 (C420) video.  Compressed codecs (JPEG/MP3/H.264 —
their libraries are absent from this container) raise ValueError with
a clear message; ``fake=True`` keeps the deterministic stub decoder
for plumbing tests.

Scale notes: payload rows are large; use a small ``batch_size`` (the
per-batch BYTES, not row count, must fit the worker heap) and an
actor pool (decoder dispatch tables built once per actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from dedup_restore_ray.functions.hashing import hash_bytes_u64


class DecodeMedia:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    Use as ``ds.map_batches(DecodeMedia(), batch_format="pyarrow",
    batch_size=64, concurrency=N)``.  Dispatches on ``media_type``:
    image/ppm, audio/wav, video/y4m decode for real
    (functions/codecs.py); unknown types raise unless ``fake=True``.
    """

    def __init__(self, payload_col: str = "payload",
                 type_col: str = "media_type",
                 feature_dim: int = 64, fake: bool = False):
        from dedup_restore_ray.functions import codecs
        self.payload_col = payload_col
        self.type_col = type_col
        self.feature_dim = feature_dim
        self.fake = fake
        self.codecs = codecs   # module bound once per actor

    def _decode_fake(self, payload: bytes | None) -> np.ndarray:
        if payload is None:
            return np.zeros(self.feature_dim, dtype=np.float32)
        seed = hash_bytes_u64(payload) & 0xFFFFFFFF
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def _decode_one(self, payload: bytes | None, mtype: str) -> np.ndarray:
        if self.fake:
            return self._decode_fake(payload)
        c = self.codecs
        if payload is None:
            return np.zeros(self.feature_dim, dtype=np.float32)
        if mtype in ("image/ppm", "image/pgm"):
            return c.image_features(c.decode_ppm(payload), self.feature_dim)
        if mtype == "audio/wav":
            samples, rate = c.decode_wav(payload)
            return c.audio_features(samples, rate, self.feature_dim)
        if mtype == "video/y4m":
            frames, w, h = c.decode_y4m(payload)
            feats = np.stack([c.image_features(f, self.feature_dim)
                              for f in frames])
            return feats.mean(axis=0).astype(np.float32)
        raise ValueError(
            f"no decoder for media_type {mtype!r} (compressed codecs "
            f"are unavailable in this environment; supported: "
            f"image/ppm, image/pgm, audio/wav, video/y4m)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        types = (batch.column(self.type_col).to_pylist()
                 if self.type_col in batch.schema.names
                 else ["image/fake"] * len(payloads))
        feats = np.stack([self._decode_one(p, t)
                          for p, t in zip(payloads, types)]) \
            if payloads else np.zeros((0, self.feature_dim), np.float32)
        flat = pa.array(feats.reshape(-1), pa.float32())
        offsets = pa.array(
            np.arange(len(payloads) + 1, dtype=np.int32) * self.feature_dim)
        out = batch.drop_columns([self.payload_col])
        return (out.append_column("features",
                                  pa.ListArray.from_arrays(offsets, flat))
                   .append_column("payload_bytes", pa.array(
                       [len(p) if p else 0 for p in payloads], pa.int64())))


class DecodeChecksum:
    """Actor-pool stage: REAL payload decode -> integer content
    digest per row: (id, media_type, payload_bytes, n_units,
    content_sum).  n_units counts decoded atoms (pixels / samples /
    luma pixels x frames) and content_sum is their exact int64 sum —
    the decode path exercised for real, with an output a SQL oracle
    can recompute byte-for-byte from md5-derived payloads
    (synth_media_table(content="md5"))."""

    def __init__(self, payload_col: str = "payload",
                 type_col: str = "media_type", id_col: str = "doc_id"):
        from dedup_restore_ray.functions import codecs
        self.payload_col = payload_col
        self.type_col = type_col
        self.id_col = id_col
        self.codecs = codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self.codecs
        payloads = batch.column(self.payload_col).to_pylist()
        types = batch.column(self.type_col).to_pylist()
        n_units: list[int] = []
        csum: list[int] = []
        for p, mtype in zip(payloads, types):
            if mtype in ("image/ppm", "image/pgm"):
                img = c.decode_ppm(p)
                n_units.append(int(img.size))
                csum.append(int(img.astype(np.int64).sum()))
            elif mtype == "audio/wav":
                samples, _rate = c.decode_wav(p)
                n_units.append(int(samples.shape[0]))
                csum.append(int(samples.astype(np.int64).sum()))
            elif mtype == "video/y4m":
                frames, w, h = c.decode_y4m(p)
                n_units.append(len(frames) * w * h)
                csum.append(int(sum(f.astype(np.int64).sum()
                                    for f in frames)))
            else:
                raise ValueError(f"no decoder for {mtype!r}")
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "media_type": batch.column(self.type_col),
            "payload_bytes": pa.array(
                [len(p) if p else 0 for p in payloads], pa.int64()),
            "n_units": pa.array(n_units, pa.int64()),
            "content_sum": pa.array(csum, pa.int64())})


class ResizeImage:
    """Actor-pool stage: PPM/PGM payload -> PPM/PGM payload resized to
    (width, height) with nearest-neighbor sampling (pure numpy;
    functions/codecs.resize_nearest).  Non-image payloads pass
    through untouched."""

    def __init__(self, width: int, height: int, payload_col: str = "payload",
                 type_col: str = "media_type"):
        from dedup_restore_ray.functions import codecs
        self.width = width
        self.height = height
        self.payload_col = payload_col
        self.type_col = type_col
        self.codecs = codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self.codecs
        payloads = batch.column(self.payload_col).to_pylist()
        types = (batch.column(self.type_col).to_pylist()
                 if self.type_col in batch.schema.names
                 else [""] * len(payloads))
        out_payloads = []
        for p, t in zip(payloads, types):
            if p is not None and t in ("image/ppm", "image/pgm"):
                img = c.decode_ppm(p)
                out_payloads.append(c.encode_ppm(
                    c.resize_nearest(img, self.width, self.height)))
            else:
                out_payloads.append(p)
        n = batch.num_rows
        out = batch.drop_columns([self.payload_col])
        return (out.append_column(self.payload_col,
                                  pa.array(out_payloads, pa.binary()))
                   .append_column("target_w",
                                  pa.array([self.width] * n, pa.int32()))
                   .append_column("target_h",
                                  pa.array([self.height] * n, pa.int32())))


class FrameSample:
    """Actor-pool stage: video payload -> every-k-th frame rows.

    For real video/y4m payloads the frames are decoded and each
    sampled frame is emitted as a PPM payload row (flat_map shape).
    For other rows the frame schedule is derived from the declared
    duration (plumbing parity with the original stub)."""

    def __init__(self, every_k: int = 10, payload_col: str = "payload",
                 type_col: str = "media_type",
                 duration_col: str = "duration_s", fps: float = 30.0):
        from dedup_restore_ray.functions import codecs
        self.every_k = every_k
        self.payload_col = payload_col
        self.type_col = type_col
        self.duration_col = duration_col
        self.fps = fps
        self.codecs = codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self.codecs
        id_name = batch.schema.names[0]
        types = (batch.column(self.type_col).to_pylist()
                 if self.type_col in batch.schema.names
                 else [""] * batch.num_rows)
        payloads = (batch.column(self.payload_col).to_pylist()
                    if self.payload_col in batch.schema.names
                    else [None] * batch.num_rows)
        durs = (batch.column(self.duration_col).to_pylist()
                if self.duration_col in batch.schema.names
                else [0.0] * batch.num_rows)
        row_idx: list[int] = []
        frame_idx: list[int] = []
        frame_ppm: list[bytes | None] = []
        for i, (p, t, d) in enumerate(zip(payloads, types, durs)):
            if p is not None and t == "video/y4m":
                frames, w, h = c.decode_y4m(p)
                for fi in range(0, len(frames), self.every_k):
                    row_idx.append(i)
                    frame_idx.append(fi)
                    frame_ppm.append(c.encode_ppm(frames[fi]))
            else:
                k = max(0, int((d or 0) * self.fps)) // self.every_k
                for j in range(k):
                    row_idx.append(i)
                    frame_idx.append(j * self.every_k)
                    frame_ppm.append(None)
        out = batch.select([id_name]).take(
            pa.array(np.asarray(row_idx, dtype=np.int64)))
        return (out.append_column("frame_index",
                                  pa.array(frame_idx, pa.int64()))
                   .append_column("frame_payload",
                                  pa.array(frame_ppm, pa.binary())))


def _md5_stream(text: str, tag: str, n: int) -> bytes:
    """``n`` deterministic bytes from chained md5 digests of
    ``f"{text}|{tag}|{j}"`` — the same bytes DuckDB's ``md5()``
    produces from ``text || '|tag|' || j``, which makes payload
    CONTENT (not just sizes) SQL-recomputable (media_features
    oracle)."""
    import hashlib
    out = bytearray()
    j = 0
    while len(out) < n:
        out += hashlib.md5(f"{text}|{tag}|{j}".encode()).digest()
        j += 1
    return bytes(out[:n])


def synth_media_table(docs: pa.Table, text_col: str = "text",
                      content: str = "rng") -> pa.Table:
    """Deterministic REAL media payloads derived from a docs table
    (the testdata has no binary columns): doc_id mod 3 selects a PPM
    image, a PCM WAV clip, or a 3-frame Y4M video, with pixel/sample
    content seeded by the text — so decode stages exercise the real
    codecs end-to-end.  ``content="rng"`` seeds numpy PCG64 from the
    text hash; ``content="md5"`` derives the bytes from chained md5
    digests (bit-recomputable in SQL — the media_features oracle)."""
    from dedup_restore_ray.functions import codecs
    if content not in ("rng", "md5"):
        raise ValueError(f"content must be 'rng' or 'md5', "
                         f"got {content!r}")
    texts = docs.column(text_col).to_pylist()
    ids = docs.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    mtypes: list[str] = []
    durs: list[float] = []
    for i, t in zip(ids, texts):
        t = t or ""
        rng = (np.random.default_rng(hash_bytes_u64(t.encode())
                                     & 0xFFFFFFFF)
               if content == "rng" else None)
        kind = (int(i) % 3 if isinstance(i, (int, np.integer))
                else int(hash_bytes_u64(str(i).encode()) % 3))
        if kind == 0:
            img = (rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                   if rng is not None else
                   np.frombuffer(_md5_stream(t, "img", 192),
                                 np.uint8).reshape(8, 8, 3))
            payloads.append(codecs.encode_ppm(img))
            mtypes.append("image/ppm")
            durs.append(0.0)
        elif kind == 1:
            if rng is not None:
                n = 64 + int(rng.integers(0, 64))
                samples = (rng.standard_normal(n) * 8000
                           ).astype(np.int16)
            else:
                n = 64 + _md5_stream(t, "len", 1)[0] % 64
                samples = np.frombuffer(
                    _md5_stream(t, "aud", 2 * n), "<i2")
            payloads.append(codecs.encode_wav(samples, rate=8000))
            mtypes.append("audio/wav")
            durs.append(n / 8000.0)
        else:
            if rng is not None:
                frames = [rng.integers(0, 256, (4, 4), dtype=np.uint8)
                          for _ in range(3)]
            else:
                frames = [np.frombuffer(_md5_stream(t, f"vid{k}", 16),
                                        np.uint8).reshape(4, 4)
                          for k in range(3)]
            payloads.append(codecs.encode_y4m(frames, fps=30))
            mtypes.append("video/y4m")
            durs.append(3 / 30.0)
    return pa.table({
        "doc_id": docs.column("doc_id"),
        "media_type": pa.array(mtypes),
        "payload": pa.array(payloads, pa.binary()),
        "duration_s": pa.array(durs, pa.float64()),
    })


class PHashImage:
    """Actor-pool stage: image payload -> 64-bit perceptual
    average-hash in a ``simhash`` column, so the output feeds the
    SimHash band machinery (stages/pairs.candidate_pairs with
    use_simhash=True) unchanged — the image near-dup rail reuses the
    text rail's candidate sort, pairing kernels and exact-Hamming
    verify wholesale.  Non-image rows are dropped (the rail is
    image-only); decode errors raise (same honest-scope contract as
    DecodeMedia)."""

    def __init__(self, payload_col: str = "payload",
                 type_col: str = "media_type", id_col: str = "doc_id"):
        from dedup_restore_ray.functions import codecs
        self.payload_col = payload_col
        self.type_col = type_col
        self.id_col = id_col
        self.codecs = codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column(self.type_col).to_pylist()
        keep = [i for i, t in enumerate(types)
                if t in ("image/ppm", "image/pgm")]
        ids = batch.column(self.id_col).take(pa.array(keep, pa.int64()))
        payloads = batch.column(self.payload_col) \
            .take(pa.array(keep, pa.int64())).to_pylist()
        hashes = np.array(
            [self.codecs.average_hash(self.codecs.decode_ppm(p))
             for p in payloads], dtype=np.uint64)
        return pa.table({self.id_col: ids,
                         "simhash": pa.array(hashes, pa.uint64())})


def phash_pairs(media: "ray.data.Dataset", hamming_max: int = 2,
                id_col: str = "doc_id", cfg=None) -> "ray.data.Dataset":
    """Image near-dup pairs over a media table (payload +
    media_type): PHashImage actor pool -> the generic
    (doc_id, simhash) -> (u, v, hamming) rail below."""
    sigs = media.map_batches(PHashImage(id_col=id_col),
                             batch_format="pyarrow",
                             batch_size=64).materialize()
    return simhash_pairs_from_sigs(sigs, hamming_max=hamming_max,
                                   id_col=id_col, cfg=cfg)


def simhash_pairs_from_sigs(sigs: "ray.data.Dataset",
                            hamming_max: int = 2,
                            id_col: str = "doc_id",
                            cfg=None) -> "ray.data.Dataset":
    """(id, simhash) signature table -> near-dup pairs: SimHash band
    candidates (the TEXT rail's sort/pair/distinct chain, reused
    wholesale) -> sort-scatter signature attaches -> exact-Hamming
    verify.  Returns (u, v, hamming) with u < v; empty inputs and
    empty candidate sets short-circuit to an empty typed Dataset.
    ``sigs`` should be materialized (it is consumed three times)."""
    import ray.data as rd

    from dedup_restore_ray.config import PipelineConfig
    from dedup_restore_ray.functions.simhash import popcount64
    from dedup_restore_ray.stages.cluster import _scatter_lookup
    from dedup_restore_ray.stages.pairs import candidate_pairs

    cfg = cfg or PipelineConfig()
    empty_tbl = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
    if sigs.count() == 0:
        return rd.from_arrow(empty_tbl)
    cands = candidate_pairs(sigs, cfg, use_minhash=False,
                            use_simhash=True, use_fingerprints=False,
                            use_norm=False).materialize()
    if cands.count() == 0:
        return rd.from_arrow(empty_tbl)

    def store(side: str):
        return sigs.map_batches(
            lambda b, s=side: pa.table({s: b.column(id_col),
                                        f"sh_{s}": b.column("simhash")}),
            batch_format="pyarrow")

    with_u = _scatter_lookup(cands, store("u"), key_col="u",
                             payload_col="sh_u", out_cols=["u", "v"])
    both = _scatter_lookup(with_u, store("v"), key_col="v",
                           payload_col="sh_v",
                           out_cols=["u", "v", "sh_u"])

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_tbl
        d = popcount64(np.bitwise_xor(
            np.asarray(b.column("sh_u"), dtype=np.uint64),
            np.asarray(b.column("sh_v"), dtype=np.uint64)))
        keep = d <= hamming_max
        return pa.table({"u": b.column("u").filter(pa.array(keep)),
                         "v": b.column("v").filter(pa.array(keep)),
                         "hamming": pa.array(d[keep].astype(np.int64))})

    return both.map_batches(verify, batch_format="pyarrow")
