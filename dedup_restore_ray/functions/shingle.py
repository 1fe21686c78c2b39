"""Tokenization and k-gram word shingling (vectorized per batch).

Role of the reference's content-defined chunker (rolling Adler-32
window cutter, reference: src/chunk.c:31-127): split each document into
overlapping content units whose hashes feed the dedup index.  For the
web-text target the unit is the 5-gram word shingle (north_rule).

Output representation is a *flat* uint64 array of per-doc sorted-unique
shingle hashes plus an int64 offsets array (CSR layout) so the MinHash /
SimHash kernels can reduce per-document with ``np.minimum.reduceat`` —
no Python loop in the signature math.
"""

from __future__ import annotations

import re

import numpy as np

from dedup_restore_ray.functions.hashing import U64, WordHasher, combine64

# \w+ over lowercased text: deterministic, locale-independent.
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# polynomial base for combining word hashes into a shingle hash
_POLY = np.uint64(0x100000001B3)  # FNV-ish 64-bit prime


def tokenize(text: str | None) -> list[str]:
    """Lowercase word tokens. None/empty -> []."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def normalize_text(text: str | None) -> str:
    """Canonical normalized form: lowercased tokens joined by single
    spaces.  Used by the substring pass and quality metrics so that
    whitespace / case variations don't defeat exact matching.  The
    per-url byte-identity invariant (input_hint) is checked over this
    form's SHA-1."""
    return " ".join(tokenize(text))


def shingle_hashes_for_tokens(word_hashes: np.ndarray, k: int) -> np.ndarray:
    """uint64 hashes of the k-gram windows of ``word_hashes``
    (vectorized rolling polynomial combine, the spiritual successor of
    the reference's rolling checksum src/adler32.c:27-45).

    Docs with 0 < n < k tokens produce one shingle over all n tokens;
    n == 0 produces an empty array.  Returns sorted-unique hashes.
    """
    n = len(word_hashes)
    if n == 0:
        return np.empty(0, dtype=U64)
    if n < k:
        k = n
    with np.errstate(over="ignore"):
        acc = word_hashes[: n - k + 1].astype(U64, copy=True)
        for j in range(1, k):
            acc = acc * _POLY + word_hashes[j : n - k + 1 + j]
    return np.unique(acc)  # sorted unique


class ShingleEncoder:
    """Batch encoder: list of texts -> CSR (flat shingle hashes, offsets).

    Holds the word-hash cache; build once per actor (SURVEY §7.2: the
    'loaded once per worker' pattern)."""

    def __init__(self, k: int = 5, seed: int = 0):
        self.k = k
        self.hasher = WordHasher(seed=seed)

    def encode(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Returns (flat: uint64 [S_total], offsets: int64 [n+1]) where
        flat[offsets[i]:offsets[i+1]] are doc i's sorted-unique shingle
        hashes."""
        return self.encode_tokens([tokenize(t) for t in texts])

    def encode_tokens(self, token_lists) -> tuple[np.ndarray, np.ndarray]:
        """CSR shingle hashes from pre-tokenized docs (lets callers
        tokenize once and reuse the tokens for counts/normalization)."""
        from dedup_restore_ray.functions.hashing import scratch

        n_docs = len(token_lists)
        counts = np.fromiter((len(t) for t in token_lists),
                             dtype=np.int64, count=n_docs)
        total = int(counts.sum())
        if total == 0:
            return (np.empty(0, dtype=U64),
                    np.zeros(n_docs + 1, dtype=np.int64))
        all_words: list[str] = []
        for toks in token_lists:
            all_words.extend(toks)
        wh = self.hasher.hash_words(all_words,
                                    out=scratch("se_wh", total))
        return self.encode_word_hashes(wh, counts)

    def encode_word_hashes(self, wh: np.ndarray, counts: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
        """CSR shingle hashes from a flat word-hash array + per-doc
        token counts (the vectorized core; the Arrow tokenizer feeds it
        directly with a gathered dictionary lookup).

        The k-pass rolling polynomial runs ONCE over the batch's flat
        word-hash array, each doc contributing its valid window span —
        values identical to the per-doc form, but one numpy dispatch
        per pass instead of one per doc, and the per-doc np.unique is
        the shared in-place-sort global-mask pass (csr_sorted_unique).
        Docs with 0 < n < k tokens keep the per-doc path (one shingle
        with effective k = n).  Working buffers (rolling accumulator,
        raw shingle buffer) live in the process-local scratch arena —
        ~2 x 8 B/token of fresh-page faults per batch otherwise; the
        compacted result is the only fresh allocation that escapes."""
        from dedup_restore_ray.functions.hashing import (csr_sorted_unique,
                                                         scratch)

        k = self.k
        n_docs = len(counts)
        total = int(counts.sum())
        if total == 0:
            return (np.empty(0, dtype=U64),
                    np.zeros(n_docs + 1, dtype=np.int64))
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        n_sh = np.where(counts >= k, counts - k + 1,
                        np.minimum(counts, 1))
        raw_offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_sh, out=raw_offs[1:])
        raw = scratch("se_raw", int(raw_offs[-1]))
        m = total - k + 1
        if m >= 1:
            with np.errstate(over="ignore"):
                acc = scratch("se_acc", m)
                np.copyto(acc, wh[:m])
                for j in range(1, k):
                    np.multiply(acc, _POLY, out=acc)
                    np.add(acc, wh[j:j + m], out=acc)
        st_l = starts.tolist()
        cn_l = counts.tolist()
        ro_l = raw_offs.tolist()
        for i in range(n_docs):
            c = cn_l[i]
            if c >= k:
                s = st_l[i]
                raw[ro_l[i]:ro_l[i + 1]] = acc[s:s + c - k + 1]
            elif c:
                raw[ro_l[i]] = shingle_hashes_for_tokens(
                    wh[st_l[i]:st_l[i] + c], k)[0]
        return csr_sorted_unique(raw, raw_offs)


def token_counts(texts) -> np.ndarray:
    """Whitespace-word counts per text (matches DuckDB oracle:
    number of \\w+ matches in lowercased text)."""
    return np.array([len(tokenize(t)) for t in texts], dtype=np.int64)


def arrow_token_hashes(tcol, hasher: "WordHasher"):
    """Lean tokenizer path: just ``(wh, counts)`` — per-occurrence
    word hashes (a scratch-arena VIEW, see arrow_token_stats) and
    per-doc token counts, WITHOUT materializing the normalized-text
    join or the raw-bytes cast.  For consumers that only need the
    token hash stream (positional k-grams, token counts), the
    space-joined norm string is pure memory traffic — skip it."""
    wh, counts, _, _ = arrow_token_stats(tcol, hasher, want_norm=False)
    return wh, counts


def arrow_token_stats(tcol, hasher: "WordHasher", want_norm: bool = True):
    """Vectorized tokenization of an Arrow string column — the hot
    tokenize path (lower, \\w+ split, per-doc counts, normalized join)
    runs as Arrow C++ kernels for the batch's ASCII rows, and word
    hashing touches only the DISTINCT tokens (dictionary encode), not
    every occurrence.  Non-ASCII rows (rare in web corpora, but every
    synthetic corpus plants some) take the per-doc Python tokenizer
    and are stitched back in row order — on ASCII input the two are
    EXACTLY equivalent (Python ``\\w`` over lowercased ASCII is
    [a-z0-9_], the split complement below), so results are independent
    of which rows ride which path.

    Returns ``(wh, counts, norm_arr, raw_arr)``:
      wh        uint64 [T]       flat per-occurrence word hashes in doc
                                 order — a SCRATCH-ARENA VIEW ("se_wh"),
                                 valid until the next se_wh request
      counts    int64 [n]        tokens per doc
      norm_arr  pa.BinaryArray   per-doc normalized text (tokens joined
                                 by single spaces), utf-8 — stays an
                                 Arrow buffer so SHA-1/winnowing read it
                                 zero-copy (content_hashes_arrow /
                                 binary_csr), never a Python bytes list
      raw_arr   pa.BinaryArray   per-doc raw text bytes (None -> b""),
                                 a zero-copy cast of the input column
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from dedup_restore_ray.functions.hashing import scratch

    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    n = len(tcol)
    if n == 0:
        empty = pa.array([], pa.binary())
        return (np.empty(0, U64), np.zeros(0, np.int64), empty, empty)
    if tcol.null_count:
        tcol = tcol.fill_null("")
    raw_arr = tcol.cast(pa.binary()) if want_norm else None
    ascii_mask = np.asarray(pc.string_is_ascii(tcol))
    all_ascii = bool(ascii_mask.all())
    acol = tcol if all_ascii \
        else tcol.filter(pa.array(ascii_mask, pa.bool_()))

    low = pc.ascii_lower(acol)
    sp = pc.split_pattern_regex(low, "[^a-z0-9_]+")
    flat = pc.list_flatten(sp)
    off = np.asarray(sp.offsets, dtype=np.int64)
    mask_pa = pc.greater(pc.binary_length(flat), 0)
    mask = np.asarray(mask_pa)
    # per-doc nonempty-token counts + filtered list offsets, one cumsum
    cum = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=cum[1:])
    a_counts = cum[off[1:]] - cum[off[:-1]]
    ff = flat.filter(mask_pa)
    d = pc.dictionary_encode(ff)
    idx = np.asarray(d.indices, dtype=np.int64)
    uh = hasher.hash_words(d.dictionary.to_pylist())
    a_norm = None
    if want_norm:
        norm_list = pa.ListArray.from_arrays(
            pa.array(cum[off], type=pa.int32()), ff)
        a_norm = pc.binary_join(norm_list, " ").cast(pa.binary())

    if all_ascii:
        wh = scratch("se_wh", len(idx))
        np.take(uh, idx, out=wh)
        return wh, a_counts, a_norm, raw_arr

    # stitch: slow rows via the Python tokenizer, in row order
    slow_rows = np.flatnonzero(~ascii_mask)
    slow_toks = [tokenize(tcol[int(r)].as_py()) for r in slow_rows]
    counts = np.empty(n, dtype=np.int64)
    counts[ascii_mask] = a_counts
    counts[slow_rows] = [len(t) for t in slow_toks]
    dest = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=dest[1:])
    wh = scratch("se_wh", int(dest[-1]))
    # ascii token spans: contiguous in (uh[idx]) order -> one scatter
    a_rows = np.flatnonzero(ascii_mask)
    if len(idx):
        a_cum = np.zeros(len(a_counts) + 1, dtype=np.int64)
        np.cumsum(a_counts, out=a_cum[1:])
        pos = (np.repeat(dest[a_rows] - a_cum[:-1], a_counts)
               + np.arange(len(idx), dtype=np.int64))
        wh[pos] = uh[idx]
    for r, toks in zip(slow_rows, slow_toks):
        if toks:
            hasher.hash_words(toks, out=wh[dest[r]:dest[r] + len(toks)])
    if not want_norm:
        return wh, counts, None, None
    # row-ordered norm array built with ONE Arrow take (no Python copy
    # of the ascii rows' norms — a single non-ASCII row in a batch must
    # not demote the whole batch to the Python heap)
    slow_norm = pa.array(
        [" ".join(toks).encode("utf-8", "surrogatepass")
         for toks in slow_toks], pa.binary())
    combined = pa.concat_arrays(
        [a_norm.combine_chunks()
         if isinstance(a_norm, pa.ChunkedArray) else a_norm, slow_norm])
    perm = np.empty(n, dtype=np.int64)
    perm[a_rows] = np.arange(len(a_rows), dtype=np.int64)
    perm[slow_rows] = len(a_rows) + np.arange(len(slow_rows),
                                              dtype=np.int64)
    norm_arr = combined.take(pa.array(perm))
    return wh, counts, norm_arr, raw_arr
