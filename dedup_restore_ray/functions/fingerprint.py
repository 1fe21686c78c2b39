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
                out.append(np.unique(_global_kgram_hashes(data, L, mixed=True)))
        return out
    data = np.frombuffer(b"".join(enc), dtype=np.uint32)
    acc = _global_kgram_hashes(data, L, mixed=True)
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


def _global_kgram_hashes(data: np.ndarray, k: int,
                         mixed: bool = False,
                         use_scratch: bool = False) -> np.ndarray:
    """O(n) rolling polynomial hash of every k-window via modular-
    inverse prefix sums:  h[i] = P^{i+k-1} * (S[i+k] - S[i])  with
    S[m] = Σ_{t<m} d[t]·P^{-t}  (all mod 2^64) — identical values to
    the k-pass shifted-add loop.  Allocation-lean: power tables are
    process-cached, the result reuses the term buffer, and with
    ``mixed=True`` the splitmix64 finalizer runs in place with the
    prefix-sum buffer as scratch (2 temporaries total, vs 10+ in the
    naive form — cold page faults on fresh numpy arrays are the
    multi-worker scaling limiter on shared hosts).

    With ``use_scratch=True`` the two working buffers come from the
    process-local scratch arena (``hashing.scratch``) and the returned
    array is a VIEW into it — valid only until the next
    use_scratch call; callers must consume it before then.
    """
    from dedup_restore_ray.functions.hashing import mix64_inplace, scratch

    n = len(data)
    m = n - k + 1
    powP, powPinv = _pow_tables(n)
    with np.errstate(over="ignore"):
        # d[t] * P^-t  (P^0 for t=0)
        if use_scratch:
            term = scratch("kg_term", n)
            np.copyto(term, data, casting="unsafe")
            S = scratch("kg_S", n + 1)
        else:
            term = data.astype(U64)
            S = np.empty(n + 1, dtype=U64)
        np.multiply(term[1:], powPinv[: n - 1], out=term[1:])
        S[0] = 0
        np.cumsum(term, dtype=U64, out=S[1:])
        h = term[:m]                       # reuse term's pages
        np.subtract(S[k:], S[: m], out=h)
        if k >= 2:
            h[0] = h[0] * powP[k - 2]                          # P^{k-1}
            np.multiply(h[1:], powP[k - 1 : n - 1], out=h[1:])  # P^{i+k-1}
        elif m >= 2:
            np.multiply(h[1:], powP[: m - 1], out=h[1:])       # P^i, k==1
        if mixed:
            h = mix64_inplace(h, scratch=S)
        return h


def _batched_window_min(h: np.ndarray, doc_starts: np.ndarray,
                        doc_lens: np.ndarray, w: int,
                        use_scratch: bool = False
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Sliding-window minima (values) for many docs at once via van
    Herk block prefix/suffix minima on a doc-block-aligned padded
    array.  Returns CSR (flat minima, offsets per doc).  Docs shorter
    than w emit their single overall min; the fingerprint VALUE set of
    winnowing is invariant to argmin tie rules, so value-mins suffice.

    ``use_scratch=True`` sources the three working buffers from the
    process-local arena; the returned minima are a VIEW valid until the
    next use_scratch call.
    """
    from dedup_restore_ray.functions.hashing import scratch

    n_docs = len(doc_lens)
    blocks = np.maximum((doc_lens + w - 1) // w, 1)
    pad_w = blocks * w
    pad_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(pad_w[:-1], out=pad_starts[1:])
    total = int(pad_w.sum())
    # per-doc slice copies (2 tiny numpy calls per doc) replace the
    # three full-size int64 index arrays (repeat + arange + fancy
    # gather/scatter) of the vectorized form — ~6x less memory traffic,
    # and fresh-page faults on big temporaries are the measured
    # multi-worker scaling limiter on shared hosts.
    padded = scratch("wm_pad", total) if use_scratch \
        else np.empty(total, dtype=U64)
    ds_l = doc_starts.tolist()
    dl_l = doc_lens.tolist()
    ps_l = pad_starts.tolist()
    pw_l = pad_w.tolist()
    for s, l, p, b in zip(ds_l, dl_l, ps_l, pw_l):
        padded[p:p + l] = h[s:s + l]
        padded[p + l:p + b] = _MAX_U64          # tail padding only
    a = padded.reshape(-1, w)
    # suffix minima written straight into a flat buffer through a
    # reversed view (no [::-1].reshape copy-back); prefix minima in
    # place into `padded` itself.
    suffix = scratch("wm_suf", total) if use_scratch \
        else np.empty(total, dtype=U64)
    np.minimum.accumulate(a[:, ::-1], axis=1,
                          out=suffix.reshape(-1, w)[:, ::-1])
    np.minimum.accumulate(a, axis=1, out=a)
    prefix = padded
    # valid window starts per doc: 0 .. max(len - w, 0)
    n_wins = np.maximum(doc_lens - w, 0) + 1
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_wins, out=offsets[1:])
    mins = scratch("wm_min", int(offsets[-1])) if use_scratch \
        else np.empty(int(offsets[-1]), dtype=U64)
    off_l = offsets.tolist()
    for i, p in enumerate(ps_l):
        o0, o1 = off_l[i], off_l[i + 1]
        nw = o1 - o0
        np.minimum(suffix[p:p + nw], prefix[p + w - 1:p + w - 1 + nw],
                   out=mins[o0:o1])
    return mins, offsets


def _ramp(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for a counts vector (vectorized)."""
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(np.concatenate(([0], np.cumsum(counts[:-1]))), counts)
    return out


_SEG_CHARS = 1 << 20    # chars per processing segment (scratch ~40 MB)


def batch_winnowed_fingerprints_csr(texts: list[str], k: int, window: int
                                    ) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed fingerprints for a whole batch as CSR (flat sorted-
    unique values, int64 offsets per doc).  Values identical to
    winnowed_fingerprints per doc (same hash formula; winnowing value
    sets are tie-rule invariant).  Accepts str or pre-encoded bytes per
    text (the signature stage encodes the normalized text ONCE and
    reuses the bytes for SHA-1 + fingerprints).

    Processes the batch in ~1M-char segments of whole docs over the
    process-local scratch arena: the rolling hash, van Herk sliding-min
    and keep masks all live in a few MB of buffers that fault ONCE per
    worker and stay warm.  The previous whole-batch form allocated
    ~5 × 8 bytes/char of fresh temporaries per batch (~80 MB for a 10 MB
    batch) — measured 14x slowdown under 4-way concurrency on this
    host's page-fault-bandwidth-limited windows.  Per segment, adjacent-
    equal window minima are compacted first (winnowing density ≈ 2/w),
    so the only full-batch allocation is the ~4%-sized result.

    ``texts`` may also be an Arrow binary/string array: segments are
    then ZERO-COPY views of the Arrow data buffer (binary_csr) — no
    per-doc Python bytes and no b"".join copy per segment."""
    import pyarrow as pa

    from dedup_restore_ray.functions.hashing import (binary_csr,
                                                     csr_sorted_unique,
                                                     scratch)

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arrow_data, arrow_offs = binary_csr(texts)
        n_docs = len(arrow_offs) - 1
        enc = None
        lens = np.diff(arrow_offs)
    else:
        arrow_data = arrow_offs = None
        n_docs = len(texts)
        enc = [t if isinstance(t, bytes) else
               t.encode("utf-8", "surrogatepass") for t in texts]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64,
                           count=n_docs)
    counts = np.zeros(n_docs, dtype=np.int64)
    pieces: list[np.ndarray] = []
    if n_docs:
        csum = np.cumsum(lens)
        # doc -> segment by start offset; a segment holds whole docs and
        # totals <= _SEG_CHARS + one doc
        seg_id = (csum - lens) // _SEG_CHARS
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(seg_id)) + 1, [n_docs]))
    else:
        bounds = np.array([0], dtype=np.int64)
    for b in range(len(bounds) - 1):
        i0, i1 = int(bounds[b]), int(bounds[b + 1])
        dl = lens[i0:i1]
        hl = np.maximum(dl - k + 1, 0)
        ok = hl > 0
        if not ok.any():
            continue
        data = (arrow_data[arrow_offs[i0]:arrow_offs[i1]]
                if enc is None
                else np.frombuffer(b"".join(enc[i0:i1]), dtype=np.uint8))
        acc = _global_kgram_hashes(data, k, mixed=True, use_scratch=True)
        dstarts = np.zeros(len(dl), dtype=np.int64)
        np.cumsum(dl[:-1], out=dstarts[1:])
        mins, offs = _batched_window_min(acc, dstarts[ok], hl[ok], window,
                                         use_scratch=True)
        # adjacent-equal compaction: winnowing emits each fingerprint
        # for a run of consecutive windows; dropping in-run repeats
        # preserves each doc's value SET exactly
        keep = scratch("wm_keep", len(mins), dtype=bool)
        keep[0] = True
        np.not_equal(mins[1:], mins[:-1], out=keep[1:])
        keep[offs[:-1]] = True          # doc restarts (all docs nonempty)
        pieces.append(mins[keep])
        kcum = scratch("wm_kcum", len(mins), dtype=np.int64)
        np.cumsum(keep, out=kcum)
        ends = kcum[offs[1:] - 1]
        counts[i0:i1][ok] = np.diff(np.concatenate(
            (np.zeros(1, dtype=np.int64), ends)))
    flat = (np.concatenate(pieces) if pieces
            else np.empty(0, dtype=U64))
    out_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offs[1:])
    if len(flat) == 0:
        return flat, out_offs
    # sorted-unique per doc without 2 allocations/doc (in-place segment
    # sorts + ONE global keep mask)
    return csr_sorted_unique(flat, out_offs)


def batch_winnowed_fingerprints(texts: list[str], k: int, window: int
                                ) -> list[np.ndarray]:
    """List-of-arrays view of batch_winnowed_fingerprints_csr (compat
    shim for tests and cold paths; the signature stage consumes the CSR
    form directly)."""
    flat, offs = batch_winnowed_fingerprints_csr(texts, k, window)
    return [flat[offs[i]:offs[i + 1]] for i in range(len(texts))]
