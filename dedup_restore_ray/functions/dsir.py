"""DSIR-style hashed n-gram importance weighting.

Data Selection for Language Models via Importance Resampling (Xie et
al., NeurIPS 2023): represent every document by hashed n-gram counts
(unigrams + bigrams into B buckets), fit bag-of-hashed-grams models
for a TARGET distribution p and the RAW corpus q, weight each document
by its importance log-ratio sum_g log(p(bucket(g)) / q(bucket(g))),
and resample with Gumbel-top-k.  The reference engine has no analogue;
this is one of the training-data-curation operators the engine adds
(README "beyond the reference").

Oracle contract (bit-exact like the KMV sketch / bigram-LM micro-nat
pattern): the gram hash is DuckDB ``md5_number_lower`` (little-endian
uint64 of md5 bytes 8..16) mod ``n_buckets``, and all weights/scores
are fixed-point MICRO-NATS — ``floor(ln(rational) * 1e6)`` of exact
integer-count rationals — so the DuckDB equivalent hashes identically.
A production run at 100 TB would swap the md5 bucketer for the
splitmix word-hash rail (functions/hashing) via the same interfaces;
md5 is the *oracle mode*, kept because its cost is amortized over
DISTINCT grams only (dictionary-encode + actor-lifetime cache).

Scale shape: fit is a per-batch bincount partial (B integers per
block) + one tiny grouped sum; scoring broadcasts the B-entry weight
vector and reduces per doc with ``np.add.reduceat`` — no corpus-wide
shuffle anywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

U64_DENOM = float(2 ** 64)


def md5_u64(s: str) -> int:
    """DuckDB md5_number_lower: little-endian uint64 of md5 bytes 8..16."""
    d = hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()
    return int.from_bytes(d[8:16], "little")


class GramBucketer:
    """gram string -> md5-u64 % n_buckets, cached for the actor's
    lifetime (same amortization pattern as hashing.WordHasher)."""

    __slots__ = ("cache", "n_buckets", "_max_cache")

    def __init__(self, n_buckets: int, max_cache: int = 1 << 20):
        self.cache: dict[str, int] = {}
        self.n_buckets = n_buckets
        self._max_cache = max_cache

    def buckets(self, grams: list[str]) -> np.ndarray:
        cache = self.cache
        nb = self.n_buckets
        out = np.empty(len(grams), dtype=np.int64)
        for i, g in enumerate(grams):
            v = cache.get(g)
            if v is None:
                d = hashlib.md5(g.encode("utf-8", "surrogatepass")).digest()
                v = int.from_bytes(d[8:16], "little") % nb
                if len(cache) < self._max_cache:
                    cache[g] = v
            out[i] = v
        return out


def doc_gram_buckets(tcol, bucketer: GramBucketer):
    """Hashed unigram+bigram bucket stream per document.

    Returns ``(flat, counts, rows)``: ``flat`` int64 bucket ids of
    every gram occurrence grouped by *compact* doc (ascii docs in row
    order, then non-ascii fallback docs), ``counts`` grams per compact
    doc, ``rows`` the original batch row of each compact doc.  Callers
    reduce with ``np.add.reduceat`` over ``counts`` and scatter back
    through ``rows`` — gram order within a doc is irrelevant to every
    consumer (bag-of-grams), which is what lets the ascii rows stay
    fully vectorized.

    The tokenizer is the corpus-wide contract (lower + \\w+): Arrow
    C++ kernels for ascii rows, shingle.tokenize for the rest —
    exactly equivalent on ascii input (see arrow_token_stats).
    Bigram strings are built only for DISTINCT in-batch token pairs
    (np.unique over packed dictionary-index pairs).
    """
    from dedup_restore_ray.functions.shingle import tokenize
    from dedup_restore_ray.stages.groups import _ramp

    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    n = len(tcol)
    empty = np.empty(0, dtype=np.int64)
    if n == 0:
        return empty, empty, empty
    if tcol.null_count:
        tcol = tcol.fill_null("")
    ascii_mask = np.asarray(pc.string_is_ascii(tcol))
    a_rows = np.flatnonzero(ascii_mask)
    s_rows = np.flatnonzero(~ascii_mask)

    a_flat = empty
    a_counts = np.empty(0, dtype=np.int64)
    if len(a_rows):
        acol = tcol if len(s_rows) == 0 \
            else tcol.filter(pa.array(ascii_mask, pa.bool_()))
        low = pc.ascii_lower(acol)
        sp = pc.split_pattern_regex(low, "[^a-z0-9_]+")
        flat_toks = pc.list_flatten(sp)
        off = np.asarray(sp.offsets, dtype=np.int64)
        mask_pa = pc.greater(pc.binary_length(flat_toks), 0)
        mask = np.asarray(mask_pa)
        cum = np.zeros(len(mask) + 1, dtype=np.int64)
        np.cumsum(mask, out=cum[1:])
        tok_counts = cum[off[1:]] - cum[off[:-1]]
        ff = flat_toks.filter(mask_pa)
        d = pc.dictionary_encode(ff)
        idx = np.asarray(d.indices, dtype=np.int64)
        dict_tokens = d.dictionary.to_pylist()
        dict_buckets = bucketer.buckets(dict_tokens)
        uni = dict_buckets[idx] if len(idx) else empty

        nb = np.maximum(tok_counts - 1, 0)
        if int(nb.sum()):
            starts = np.zeros(len(tok_counts), dtype=np.int64)
            np.cumsum(tok_counts[:-1], out=starts[1:])
            sel = nb > 0
            bpos = np.repeat(starts[sel], nb[sel]) + _ramp(nb[sel])
            packed = ((idx[bpos].astype(np.uint64) << np.uint64(32))
                      | idx[bpos + 1].astype(np.uint64))
            upair, inv = np.unique(packed, return_inverse=True)
            i1 = (upair >> np.uint64(32)).astype(np.int64)
            i2 = (upair & np.uint64(0xFFFFFFFF)).astype(np.int64)
            pair_buckets = bucketer.buckets(
                [dict_tokens[a] + " " + dict_tokens[b]
                 for a, b in zip(i1.tolist(), i2.tolist())])
            bi = pair_buckets[inv]
        else:
            bi = empty

        a_counts = tok_counts + nb
        a_flat = np.empty(int(a_counts.sum()), dtype=np.int64)
        dest = np.zeros(len(a_counts) + 1, dtype=np.int64)
        np.cumsum(a_counts, out=dest[1:])
        if len(uni):
            selu = tok_counts > 0
            upos = (np.repeat(dest[:-1][selu], tok_counts[selu])
                    + _ramp(tok_counts[selu]))
            a_flat[upos] = uni
        if len(bi):
            selb = nb > 0
            bpos2 = (np.repeat(dest[:-1][selb] + tok_counts[selb], nb[selb])
                     + _ramp(nb[selb]))
            a_flat[bpos2] = bi

    s_parts: list[np.ndarray] = []
    s_counts = np.empty(len(s_rows), dtype=np.int64)
    for j, r in enumerate(s_rows):
        toks = tokenize(tcol[int(r)].as_py())
        grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
        s_counts[j] = len(grams)
        if grams:
            s_parts.append(bucketer.buckets(grams))

    flat = a_flat if not s_parts else np.concatenate([a_flat] + s_parts)
    counts = np.concatenate([a_counts, s_counts]) if len(s_rows) \
        else a_counts
    rows = np.concatenate([a_rows, s_rows]) if len(s_rows) else a_rows
    return flat, counts, rows


def dsir_weight_micro(t_counts: np.ndarray, r_counts: np.ndarray,
                      t_total: int, r_total: int,
                      n_buckets: int) -> np.ndarray:
    """Per-bucket importance log-ratio in fixed-point micro-nats.

    w[b] = floor(ln( ((t[b]+1) * (R+B)) / ((r[b]+1) * (T+B)) ) * 1e6)

    — the Laplace-smoothed log(p_target(b) / q_raw(b)) as ONE log of an
    exact-integer rational, so DuckDB's ``ln`` evaluates the identical
    float64 and the floor is bit-stable (same contract as the
    unigram/bigram LM operators).
    """
    t = t_counts.astype(np.float64) + 1.0
    r = r_counts.astype(np.float64) + 1.0
    num = t * float(r_total + n_buckets)
    den = r * float(t_total + n_buckets)
    return np.floor(np.log(num / den) * 1e6).astype(np.int64)


def gumbel_micro_for_ids(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-doc Gumbel noise in micro-nats for Gumbel
    top-k resampling: u = (md5_u64(str(id)) + 0.5) / 2^64,
    g = floor(-ln(-ln(u)) * 1e6).  Reproducible in SQL via
    md5_number_lower(CAST(id AS VARCHAR))."""
    hv = np.array([md5_u64(str(int(i))) for i in ids], dtype=np.uint64)
    u = (hv.astype(np.float64) + 0.5) / U64_DENOM
    return np.floor(-np.log(-np.log(u)) * 1e6).astype(np.int64)
