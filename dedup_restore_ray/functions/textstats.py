"""Text analysis kernels: language-ID, quality scoring, token counting.

New first-class operators for a training-data pipeline (task brief),
implemented as deterministic batch kernels suitable for
``map_batches``.  No external models — the language identifier is a
stopword/character n-gram heuristic with profiles for the languages in
the synthetic corpora (en/de/fr/es/zh).
"""

from __future__ import annotations

import re

import numpy as np

from dedup_restore_ray.functions.shingle import tokenize

# minimal stopword profiles (public common-word lists)
_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to a in is it you that he was for on are with as i his they be at".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als".split()),
    "fr": frozenset("le la de et les des en un du une que est pour qui dans par plus pas au sur".split()),
    "es": frozenset("de la que el en y a los se del las un por con no una su para es al lo".split()),
}
_CJK_RE = re.compile(r"[一-鿿]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_STOPWORDS_EN = _PROFILES["en"]

# GPT-2-style pre-tokenizer regex (public, from the GPT-2 released
# code), simplified to contractions, word chunks, number chunks,
# punctuation chunks.  Classes are EXPLICIT ASCII and the trailing
# `\s+(?!\S)` alternative is dropped — the lookahead only moves the
# final space of a run between tokens, never changes the COUNT — so
# the count is reproducible in RE2 (DuckDB) verbatim: the
# bpe_token_counts oracle runs this exact string.
_BPE_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d| ?[0-9A-Za-z_]+"
                r"| ?[^ \t\n\r\f\v0-9A-Za-z_]+|[ \t\n\r\f\v]+")
_BPE_RE = re.compile(_BPE_PATTERN)


def detect_language(text: str | None) -> str:
    """Heuristic language id: CJK char ratio -> 'zh'; else the stopword
    profile with the highest hit rate; 'und' when nothing matches."""
    if not text:
        return "und"
    n_cjk = len(_CJK_RE.findall(text))
    if n_cjk >= 3 and n_cjk * 10 >= len(text):
        return "zh"
    toks = tokenize(text)
    if not toks:
        return "und"
    best_lang, best_hits = "und", 0
    for lang, prof in _PROFILES.items():
        hits = sum(1 for t in toks if t in prof)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"


def quality_features(texts) -> dict[str, np.ndarray]:
    """Per-doc quality signals: n_chars, n_tokens, mean token length,
    punctuation ratio, stopword ratio, uppercase ratio, and a composite
    quality_score in [0, 1] (monotone heuristic, deterministic)."""
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_tokens = np.zeros(n, dtype=np.int64)
    mean_tok = np.zeros(n, dtype=np.float64)
    punct = np.zeros(n, dtype=np.float64)
    stop = np.zeros(n, dtype=np.float64)
    upper = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        n_chars[i] = len(t)
        toks = tokenize(t)
        n_tokens[i] = len(toks)
        if toks:
            mean_tok[i] = sum(map(len, toks)) / len(toks)
            stop[i] = sum(1 for w in toks if w in _STOPWORDS_EN) / len(toks)
        punct[i] = len(_PUNCT_RE.findall(t)) / len(t)
        upper[i] = sum(1 for c in t if c.isupper()) / len(t)
    # composite: reward moderate token length & stopword presence,
    # penalize extreme punctuation / uppercase density
    score = (
        np.clip(n_tokens / 64.0, 0, 1) * 0.35
        + np.clip(1.0 - np.abs(mean_tok - 5.0) / 5.0, 0, 1) * 0.2
        + np.clip(stop * 4.0, 0, 1) * 0.2
        + np.clip(1.0 - punct * 4.0, 0, 1) * 0.15
        + np.clip(1.0 - upper * 4.0, 0, 1) * 0.1
    ) * (n_tokens > 0)            # token-less docs score 0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok,
        "punct_ratio": punct,
        "stopword_ratio": stop,
        "upper_ratio": upper,
        "quality_score": score,
    }


_UPPER_RE = re.compile(r"[A-Z]")

# Gopher-style filter thresholds (in the spirit of the published Gopher
# rules, arXiv:2112.11446 table A1), expressed so every rule is an
# exact INTEGER comparison — no float ratios, hence bit-identical to
# the DuckDB oracle regardless of summation order:
#   5 <= n_tokens <= 50000
#   2 <= mean token length <= 12   ->  2*n_tokens <= sum_len <= 12*n_tokens
#   stopword fraction >= 0.05      ->  20*stop_hits >= n_tokens
#   punctuation ratio <= 0.2       ->  5*n_punct <= n_chars
#   uppercase ratio <= 0.3         ->  10*n_upper <= 3*n_chars
def quality_filter_counts(texts) -> dict[str, np.ndarray]:
    """Integer inputs for the Gopher-style keep/drop filter: token
    count, summed token length, EN-stopword hits, punctuation chars
    (``[^\\w\\s]``), ASCII uppercase chars, total chars."""
    n = len(texts)
    out = {k: np.zeros(n, dtype=np.int64) for k in
           ("n_chars", "n_tokens", "sum_token_len", "stop_hits",
            "n_punct", "n_upper")}
    for i, t in enumerate(texts):
        if not t:
            continue
        out["n_chars"][i] = len(t)
        toks = tokenize(t)
        out["n_tokens"][i] = len(toks)
        out["sum_token_len"][i] = sum(map(len, toks))
        out["stop_hits"][i] = sum(1 for w in toks if w in _STOPWORDS_EN)
        out["n_punct"][i] = len(_PUNCT_RE.findall(t))
        out["n_upper"][i] = len(_UPPER_RE.findall(t))
    return out


def gopher_keep_mask(c: dict[str, np.ndarray]) -> np.ndarray:
    """Boolean keep mask from ``quality_filter_counts`` outputs."""
    nt = c["n_tokens"]
    return ((nt >= 5) & (nt <= 50000)
            & (c["sum_token_len"] >= 2 * nt)
            & (c["sum_token_len"] <= 12 * nt)
            & (20 * c["stop_hits"] >= nt)
            & (5 * c["n_punct"] <= c["n_chars"])
            & (10 * c["n_upper"] <= 3 * c["n_chars"]))


# ----------------------------------------------------------------------
# Arrow-vectorized quality / language-id kernels (VERDICT r4 #1).
#
# The per-doc Python loops above stay as the bit-exact parity
# references; the functions below run the tokenizer and regex work as
# Arrow C++ (RE2) kernels for the batch's ASCII rows — the same
# stitched fast/slow split as shingle.arrow_token_stats, so results
# are IDENTICAL regardless of which rows ride which path — and route
# the rare non-ASCII rows through the Python reference kernel.
# ----------------------------------------------------------------------

# Python's `[^\w\s]` restricted to ASCII, written as an explicit class
# so RE2 agrees byte-for-byte (RE2's own \s lacks \v, Python's has it).
_ASCII_PUNCT_PATTERN = "[^0-9A-Za-z_ \t\n\r\x0b\x0c]"

_STOP_ARR = None          # lazy pa.array of _STOPWORDS_EN
_PROFILE_ARRS: dict | None = None


def _arrow_ascii_tokens(acol):
    """lower + ``\\w+`` tokenization of an all-ASCII Arrow string
    column (split on the complement class — exactly Python ``\\w`` on
    lowercased ASCII).  Returns ``(ff, n_tokens, doc_off)``: the flat
    non-empty token array, per-doc token counts, and int64 [n+1]
    occurrence offsets into ``ff``."""
    import pyarrow.compute as pc

    low = pc.ascii_lower(acol)
    sp = pc.split_pattern_regex(low, "[^a-z0-9_]+")
    flat = pc.list_flatten(sp)
    off = np.asarray(sp.offsets, dtype=np.int64)
    mask_pa = pc.greater(pc.binary_length(flat), 0)
    cum = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(np.asarray(mask_pa), out=cum[1:])
    doc_off = cum[off]
    return flat.filter(mask_pa), doc_off[1:] - doc_off[:-1], doc_off


def _segment_sums(per_occ: np.ndarray, doc_off: np.ndarray) -> np.ndarray:
    """Per-doc sums of a per-occurrence int vector via one prefix sum."""
    p = np.zeros(len(per_occ) + 1, dtype=np.int64)
    np.cumsum(per_occ, out=p[1:])
    return p[doc_off[1:]] - p[doc_off[:-1]]


def _ascii_partition(tcol):
    """Shared preamble: combined, null-filled column + ascii row split.
    Returns (tcol, a_rows, slow_rows, acol) with acol the filtered
    (or whole) ASCII sub-column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    if tcol.null_count:
        tcol = tcol.fill_null("")
    ascii_mask = np.asarray(pc.string_is_ascii(tcol))
    a_rows = np.flatnonzero(ascii_mask)
    slow_rows = np.flatnonzero(~ascii_mask)
    acol = (tcol if len(a_rows) == len(tcol)
            else tcol.filter(pa.array(ascii_mask, pa.bool_())))
    return tcol, a_rows, slow_rows, acol


def quality_filter_counts_arrow(tcol) -> dict[str, np.ndarray]:
    """``quality_filter_counts`` with the hot work in Arrow C++:
    identical outputs (parity-tested), one regex/tokenize dispatch per
    batch instead of one per doc."""
    import pyarrow as pa
    import pyarrow.compute as pc

    global _STOP_ARR
    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    n = len(tcol)
    out = {k: np.zeros(n, dtype=np.int64) for k in
           ("n_chars", "n_tokens", "sum_token_len", "stop_hits",
            "n_punct", "n_upper")}
    if n == 0:
        return out
    tcol, a_rows, slow_rows, acol = _ascii_partition(tcol)
    if len(a_rows):
        ff, ntok, doc_off = _arrow_ascii_tokens(acol)
        if _STOP_ARR is None:
            _STOP_ARR = pa.array(sorted(_STOPWORDS_EN))
        # per-token properties via the DISTINCT-token dictionary (the
        # batch has ~60 distinct words per 2.6M occurrences in webtext;
        # membership/length on the dictionary + one np.take beats any
        # occurrence-level kernel)
        d = pc.dictionary_encode(ff)
        idx = np.asarray(d.indices, dtype=np.int64)
        dlen = np.asarray(pc.binary_length(d.dictionary),
                          dtype=np.int64)
        dstop = np.asarray(pc.is_in(d.dictionary, value_set=_STOP_ARR)
                           ).astype(np.int64)
        out["n_chars"][a_rows] = np.asarray(pc.binary_length(acol))
        out["n_tokens"][a_rows] = ntok
        out["sum_token_len"][a_rows] = _segment_sums(dlen[idx], doc_off)
        out["stop_hits"][a_rows] = _segment_sums(dstop[idx], doc_off)
        out["n_punct"][a_rows] = np.asarray(
            pc.count_substring_regex(acol, _ASCII_PUNCT_PATTERN))
        out["n_upper"][a_rows] = np.asarray(
            pc.count_substring_regex(acol, "[A-Z]"))
    if len(slow_rows):
        c = quality_filter_counts(
            [tcol[int(r)].as_py() for r in slow_rows])
        for k in out:
            out[k][slow_rows] = c[k]
    return out


def detect_language_arrow(tcol) -> np.ndarray:
    """Vectorized ``detect_language`` over an Arrow string column.
    ASCII rows (no CJK possible) resolve via per-profile ``is_in``
    membership + per-doc segment sums with Python's first-max-wins tie
    rule (np.argmax); non-ASCII rows take the reference scalar path.
    Returns an object ndarray of language codes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    global _PROFILE_ARRS
    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    n = len(tcol)
    result = np.full(n, "und", dtype=object)
    if n == 0:
        return result
    tcol, a_rows, slow_rows, acol = _ascii_partition(tcol)
    if len(a_rows):
        if _PROFILE_ARRS is None:
            _PROFILE_ARRS = {lang: pa.array(sorted(prof))
                             for lang, prof in _PROFILES.items()}
        ff, _, doc_off = _arrow_ascii_tokens(acol)
        d = pc.dictionary_encode(ff)
        idx = np.asarray(d.indices, dtype=np.int64)
        order = list(_PROFILES)      # dict order == Python loop order
        hits = np.empty((len(order), len(a_rows)), dtype=np.int64)
        for j, lang in enumerate(order):
            member = np.asarray(
                pc.is_in(d.dictionary,
                         value_set=_PROFILE_ARRS[lang])).astype(np.int64)
            hits[j] = _segment_sums(member[idx], doc_off)
        best = np.argmax(hits, axis=0)
        langs = np.array(order, dtype=object)[best]
        langs[hits[best, np.arange(len(a_rows))] == 0] = "und"
        result[a_rows] = langs
    for r in slow_rows:
        result[int(r)] = detect_language(tcol[int(r)].as_py())
    return result


def bpe_token_count(text: str | None) -> int:
    """Count of GPT-2-style pre-tokenizer chunks — a fast proxy for BPE
    token counts without a vocab."""
    if not text:
        return 0
    return len(_BPE_RE.findall(text))
