"""Pure-python media codecs for uncompressed formats.

PIL/ffmpeg are absent from this environment, but three classic
uncompressed formats decode with numpy alone, which makes the
multimodal stages (stages/multimodal.py) REAL end-to-end:

- PPM (P6) / PGM (P5): netpbm binary images;
- WAV: RIFF PCM audio (8/16-bit);
- Y4M (YUV4MPEG2, C420): uncompressed video — real frame extraction.

All decoders validate headers and raise ValueError on malformed
payloads (a corrupt payload must fail loudly, same discipline as the
restore paths).  Encoders exist so tests can round-trip and so the
synthetic corpus carries REAL payloads.
"""

from __future__ import annotations

import numpy as np


# ----------------------------------------------------------------------
# PPM / PGM
# ----------------------------------------------------------------------

def _read_pnm_tokens(data: bytes, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace/comment-separated integer tokens after
    the magic; returns (tokens, offset past the single whitespace that
    terminates the last token)."""
    toks: list[int] = []
    i = 2  # past magic
    n = len(data)
    while len(toks) < count:
        while i < n and data[i:i + 1].isspace():
            i += 1
        if i < n and data[i] == ord("#"):
            while i < n and data[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < n and not data[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(int(data[i:j]))
        i = j
    return toks, i + 1   # single whitespace after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 PPM -> uint8 [h, w, 3]; P5 PGM -> uint8 [h, w]."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {magic!r}")
    (w, h, maxval), off = _read_pnm_tokens(data, 3)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    if len(raw) < need:
        raise ValueError("truncated PNM data")
    img = raw.reshape(h, w, ch)
    return img if ch == 3 else img[:, :, 0]


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm wants [h,w,3] or [h,w]")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, vectorized (index gather)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]


# ----------------------------------------------------------------------
# WAV (RIFF PCM)
# ----------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples [n, channels] int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    samples = None
    rate = 0
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        size = int.from_bytes(data[i + 4:i + 8], "little")
        body = data[i + 8:i + 8 + size]
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            if audio_fmt != 1:
                raise ValueError("only PCM WAV supported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            fmt = (channels, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            channels, bits = fmt
            if bits == 16:
                arr = np.frombuffer(body, dtype="<i2")
            elif bits == 8:
                arr = (np.frombuffer(body, dtype=np.uint8)
                       .astype(np.int16) - 128) * 256
            else:
                raise ValueError(f"unsupported WAV bit depth {bits}")
            samples = arr.reshape(-1, channels)
        i += 8 + size + (size & 1)
    if samples is None:
        raise ValueError("WAV has no data chunk")
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    body = s.tobytes()
    byte_rate = rate * ch * 2
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
           + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    datac = b"data" + len(body).to_bytes(4, "little") + body
    riff_body = b"WAVE" + fmt + datac
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


# ----------------------------------------------------------------------
# Y4M (YUV4MPEG2) — uncompressed video, C420
# ----------------------------------------------------------------------

def decode_y4m(data: bytes) -> tuple[list[np.ndarray], int, int]:
    """YUV4MPEG2 C420 -> (list of Y-plane frames uint8 [h, w], w, h).
    (Chroma planes are parsed/skipped; the luma plane is what the
    feature stages consume.)"""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    header = data[:nl].split(b" ")
    w = h = 0
    for tok in header[1:]:
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C") and not tok.startswith(b"C420"):
            raise ValueError(f"only C420 supported, got {tok!r}")
    if not w or not h:
        raise ValueError("Y4M missing W/H")
    frame_size = w * h + 2 * ((w // 2) * (h // 2))
    frames = []
    i = nl + 1
    while i < len(data):
        fnl = data.find(b"\n", i)
        if fnl < 0 or not data[i:i + 5] == b"FRAME":
            raise ValueError("malformed Y4M frame header")
        start = fnl + 1
        if start + frame_size > len(data):
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(data, dtype=np.uint8, count=w * h,
                          offset=start).reshape(h, w)
        frames.append(y)
        i = start + frame_size
    return frames, w, h


def encode_y4m(frames: list[np.ndarray], fps: int = 30) -> bytes:
    if not frames:
        raise ValueError("need >= 1 frame")
    h, w = frames[0].shape
    if w % 2 or h % 2:
        raise ValueError("C420 needs even dimensions")
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)]
    chroma = np.full(((h // 2) * (w // 2)), 128, dtype=np.uint8).tobytes()
    for f in frames:
        out.append(b"FRAME\n")
        out.append(np.asarray(f, dtype=np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


# ----------------------------------------------------------------------
# Feature extraction (shared by image/audio decode stages)
# ----------------------------------------------------------------------

def image_features(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Deterministic fixed-dim features: intensity histogram (dim-8
    bins) + mean/std/min/max + shape, normalized."""
    gray = img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    hist, _ = np.histogram(gray, bins=dim - 8, range=(0, 255))
    hist = hist / max(gray.size, 1)
    stats = np.array([gray.mean() / 255.0, gray.std() / 255.0,
                      gray.min() / 255.0, gray.max() / 255.0,
                      img.shape[0] / 4096.0, img.shape[1] / 4096.0,
                      (img.ndim == 3) * 1.0, 1.0])
    return np.concatenate([hist, stats]).astype(np.float32)


def audio_features(samples: np.ndarray, rate: int, dim: int = 64
                   ) -> np.ndarray:
    """Amplitude histogram + RMS/zero-crossing/duration stats."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    hist, _ = np.histogram(mono, bins=dim - 8, range=(-1, 1))
    hist = hist / max(len(mono), 1)
    zc = (np.count_nonzero(np.diff(np.signbit(mono))) / max(len(mono), 1)
          if len(mono) > 1 else 0.0)
    rms = float(np.sqrt((mono ** 2).mean())) if len(mono) else 0.0
    stats = np.array([rms, zc, len(mono) / max(rate, 1) / 3600.0,
                      float(mono.max(initial=0)),
                      float(mono.min(initial=0)),
                      rate / 96000.0, samples.shape[1] / 8.0, 1.0])
    return np.concatenate([hist, stats]).astype(np.float32)


def average_hash(img: np.ndarray, side: int = 8) -> int:
    """64-bit perceptual average-hash (aHash): grayscale ->
    nearest-neighbor resize to side x side -> bit i set iff pixel i
    >= the tile mean.  Invariant under uniform brightness shifts
    (the threshold moves with the pixels) and under any resize that
    preserves the side x side nearest-sample grid — the cheap
    near-dup signature for decoded images; pair it with the SimHash
    band machinery for candidate generation."""
    a = np.asarray(img)
    if a.ndim == 3:
        a = a.mean(axis=2)
    a = a.astype(np.float64)
    g = resize_nearest(a[..., None], side, side)[..., 0]
    bits = (g >= g.mean()).reshape(-1).astype(np.uint64)
    return int(np.bitwise_or.reduce(
        bits << np.arange(side * side, dtype=np.uint64)))
