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
        tokenize once and reuse the tokens for counts/normalization).

        The k-pass rolling polynomial runs ONCE over the batch's flat
        word-hash array (in place), each doc contributing its valid
        window span — values identical to the per-doc form, but one
        numpy dispatch per pass instead of one per doc, and the
        per-doc np.unique is the shared in-place-sort global-mask pass
        (csr_sorted_unique).  Docs with 0 < n < k tokens keep the
        per-doc path (one shingle with effective k = n)."""
        from dedup_restore_ray.functions.hashing import csr_sorted_unique

        k = self.k
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
        wh = self.hasher.hash_words(all_words)
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        n_sh = np.where(counts >= k, counts - k + 1,
                        np.minimum(counts, 1))
        raw_offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_sh, out=raw_offs[1:])
        raw = np.empty(int(raw_offs[-1]), dtype=U64)
        m = total - k + 1
        if m >= 1:
            with np.errstate(over="ignore"):
                acc = wh[:m].astype(U64, copy=True)
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
