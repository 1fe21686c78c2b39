"""Document fingerprinting: rolling-hash k-grams + winnowing.

Direct descendant of the reference's rolling Adler-32 window
(reference: src/adler32.c:27-45, consumed by the chunker
src/chunk.c:31-127): a base-P polynomial rolling hash over the
*normalized character stream*, winnowed (Schleimer et al., MOSS) so each
document keeps O(n / window) fingerprints while guaranteeing that any
shared substring of length >= kgram + window - 1 chars is detected in
both documents.

These fingerprints drive the scale path of the substring-dedup pass
(the suffix-array operator in functions/suffix.py is the per-partition
exact formulation; this one turns substring matching into a plain
groupby shuffle).
"""

from __future__ import annotations

import numpy as np

from dedup_restore_ray.functions.hashing import U64, mix64

_BASE = np.uint64(1000003)


def kgram_hashes(text: str, k: int) -> np.ndarray:
    """uint64 rolling hashes of every k-char window (vectorized: k
    shifted adds over the byte array — k C-loops, no Python per-char
    loop).  len(text) < k -> empty."""
    data = np.frombuffer(
        text if isinstance(text, bytes)
        else text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = len(data)
    if n < k:
        return np.empty(0, dtype=U64)
    m = n - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=U64)
        for j in range(k):
            acc = acc * _BASE + data[j : j + m]
    return mix64(acc)


def winnow(hashes: np.ndarray, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing: from every ``window`` consecutive k-gram hashes keep
    the minimum (rightmost on ties).  Returns (positions, fingerprints)
    deduplicated by position, sorted by position."""
    m = len(hashes)
    if m == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=U64)
    if m <= window:
        pos = np.array([int(np.flatnonzero(hashes == hashes.min())[-1])], dtype=np.int64)
        return pos, hashes[pos]
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)  # [m-w+1, w]
    # rightmost argmin: reverse, argmin, map back
    rev = sw[:, ::-1]
    am = window - 1 - rev.argmin(axis=1)
    pos = am + np.arange(len(sw), dtype=np.int64)
    sel = np.unique(pos)
    return sel, hashes[sel]


def winnowed_fingerprints(text: str, k: int, window: int) -> np.ndarray:
    """Sorted-unique winnowed fingerprint hashes for one document."""
    h = kgram_hashes(text, k)
    _, fp = winnow(h, window)
    return np.unique(fp)


_BASE_INV = np.uint64(pow(int(_BASE), -1, 1 << 64))  # P odd => invertible
_MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def batch_lgram_hashes(texts: list[str], L: int) -> list[np.ndarray]:
    """Sorted-unique uint64 rolling hashes of every L-*character* gram,
    per document, in one O(total chars) pass (same modular-inverse
    prefix-sum trick as the winnowing path, over the UTF-32 code-point
    stream so gram length counts CHARACTERS, matching SQL
    ``substr(s, i, L)`` semantics exactly).

    Two docs share an L-char substring iff their hash sets intersect
    (up to 64-bit collisions, ~2^-64 per cross pair) — the exact-verify
    primitive for the substring-dedup pass: shared normalized run
    >= L chars ⟺ shared L-gram.  Accepts str or utf-8 bytes per doc.
    """
    enc = [(t.decode("utf-8", "surrogatepass") if isinstance(t, bytes)
            else t).encode("utf-32-le") for t in texts]
    lens = np.fromiter((len(e) >> 2 for e in enc), dtype=np.int64,
                       count=len(enc))
    n = int(lens.sum())
    if n == 0 or n < L:
        out = []
        for i, t in enumerate(texts):
            if lens[i] < L:
                out.append(np.empty(0, dtype=U64))
            else:
                data = np.frombuffer(enc[i], dtype=np.uint32)
                out.append(np.unique(mix64(_global_kgram_hashes(data, L))))
        return out
    data = np.frombuffer(b"".join(enc), dtype=np.uint32)
    acc = mix64(_global_kgram_hashes(data, L))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    hlens = np.maximum(lens - L + 1, 0)
    out = []
    for i in range(len(texts)):
        if hlens[i] <= 0:
            out.append(np.empty(0, dtype=U64))
        else:
            s = starts[i]
            out.append(np.unique(acc[s:s + hlens[i]]))
    return out


_POW_CACHE: dict[str, np.ndarray | int] = {"n": 0}


def _pow_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Process-cached P^1..P^n / P^-1..P^-n tables (data-independent —
    recomputing them per batch was two full-size accumulate passes of
    pure allocation traffic on every signature batch)."""
    if _POW_CACHE["n"] < n:
        size = max(n, 1 << 16, _POW_CACHE["n"] * 2)
        with np.errstate(over="ignore"):
            _POW_CACHE["powP"] = np.multiply.accumulate(
                np.full(size, _BASE, dtype=U64), dtype=U64)
            _POW_CACHE["powPinv"] = np.multiply.accumulate(
                np.full(size, _BASE_INV, dtype=U64), dtype=U64)
        _POW_CACHE["n"] = size
    return _POW_CACHE["powP"], _POW_CACHE["powPinv"]


def _global_kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """O(n) rolling polynomial hash of every k-window via modular-
    inverse prefix sums:  h[i] = P^{i+k-1} * (S[i+k] - S[i])  with
    S[m] = Σ_{t<m} d[t]·P^{-t}  (all mod 2^64) — identical values to
    the k-pass shifted-add loop.  Allocation-lean: power tables are
    process-cached and the result is built in place (3 temporaries,
    vs 6+ in the naive form — cold page faults on fresh numpy arrays
    are the multi-worker scaling limiter on shared hosts)."""
    n = len(data)
    m = n - k + 1
    powP, powPinv = _pow_tables(n)
    with np.errstate(over="ignore"):
        # d[t] * P^-t  (P^0 for t=0)
        term = data.astype(U64)
        np.multiply(term[1:], powPinv[: n - 1], out=term[1:])
        S = np.empty(n + 1, dtype=U64)
        S[0] = 0
        np.cumsum(term, dtype=U64, out=S[1:])
        h = S[k:] - S[:-k]
        if k >= 2:
            h[0] = h[0] * powP[k - 2]                          # P^{k-1}
            np.multiply(h[1:], powP[k - 1 : n - 1], out=h[1:])  # P^{i+k-1}
        elif m >= 2:
            np.multiply(h[1:], powP[: m - 1], out=h[1:])       # P^i, k==1
        return h


def _batched_window_min(h: np.ndarray, doc_starts: np.ndarray,
                        doc_lens: np.ndarray, w: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Sliding-window minima (values) for many docs at once via van
    Herk block prefix/suffix minima on a doc-block-aligned padded
    array.  Returns CSR (flat minima, offsets per doc).  Docs shorter
    than w emit their single overall min; the fingerprint VALUE set of
    winnowing is invariant to argmin tie rules, so value-mins suffice.
    """
    n_docs = len(doc_lens)
    blocks = np.maximum((doc_lens + w - 1) // w, 1)
    pad_starts = np.concatenate(([0], np.cumsum(blocks[:-1] * w)))
    total = int((blocks * w).sum())
    padded = np.full(total, _MAX_U64, dtype=U64)
    # scatter each doc's hashes into its padded region (vectorized)
    src_idx = np.repeat(doc_starts, doc_lens) + _ramp(doc_lens)
    dst_idx = np.repeat(pad_starts, doc_lens) + _ramp(doc_lens)
    padded[dst_idx] = h[src_idx]
    a = padded.reshape(-1, w)
    prefix = np.minimum.accumulate(a, axis=1).reshape(-1)
    suffix = np.minimum.accumulate(a[:, ::-1], axis=1)[:, ::-1].reshape(-1)
    # valid window starts per doc: 0 .. max(len - w, 0)
    n_wins = np.maximum(doc_lens - w, 0) + 1
    win_idx = np.repeat(pad_starts, n_wins) + _ramp(n_wins)
    mins = np.minimum(suffix[win_idx], prefix[win_idx + w - 1])
    offsets = np.concatenate(([0], np.cumsum(n_wins)))
    return mins, offsets


def _ramp(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for a counts vector (vectorized)."""
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(np.concatenate(([0], np.cumsum(counts[:-1]))), counts)
    return out


def batch_winnowed_fingerprints(texts: list[str], k: int, window: int
                                ) -> list[np.ndarray]:
    """Winnowed fingerprints for a whole batch: ONE O(n) global rolling
    hash + ONE batched van Herk sliding-min; per doc only the final
    unique() remains.  Values identical to winnowed_fingerprints per
    doc (same hash formula; winnowing value sets are tie-rule
    invariant).  Accepts str or pre-encoded bytes per text (the
    signature stage encodes the normalized text ONCE and reuses the
    bytes for SHA-1 + fingerprints — re-encoding here was a full
    corpus-size copy per batch)."""
    enc = [t if isinstance(t, bytes) else
           t.encode("utf-8", "surrogatepass") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    if lens.sum() == 0:
        return [np.empty(0, dtype=U64) for _ in texts]
    data = np.frombuffer(b"".join(enc), dtype=np.uint8)
    n = len(data)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    if n < k:
        return [winnowed_fingerprints(t, k, window) for t in texts]
    acc = mix64(_global_kgram_hashes(data, k))
    # per-doc hash spans (docs shorter than k have none)
    hlens = np.maximum(lens - k + 1, 0)
    hstarts = starts  # acc[p] covers data[p:p+k], so spans share starts
    ok = hlens > 0
    if not ok.any():
        return [np.empty(0, dtype=U64) for _ in texts]
    mins, offs = _batched_window_min(acc, hstarts[ok], hlens[ok], window)
    out: list[np.ndarray] = []
    j = 0
    for i in range(len(texts)):
        if not ok[i]:
            out.append(np.empty(0, dtype=U64))
            continue
        out.append(np.unique(mins[offs[j]:offs[j + 1]]))
        j += 1
    return out
