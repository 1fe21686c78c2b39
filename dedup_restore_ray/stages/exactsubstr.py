"""ExactSubstr span-level dedup (Lee et al. 2022, arXiv:2107.06499).

Flags every maximal token span covered by a word k-gram that occurs
more than once ANYWHERE in the corpus — the span-granular exact dedup
the paper runs with a suffix array over the token stream.  The suffix
array is replaced by the engine's sort-shuffle: one positional k-gram
hash row per token window, one sort by gram hash, vectorized group
marking, then a per-doc interval merge.  Same O(total-tokens) row
volume as the paper's suffix array, expressed as Ray Data passes
(reference analogue: the fingerprint-index first-occurrence dedup,
src/dedup.c:135-173, applied at sub-document granularity).

Tokenizer parity: ``functions/shingle.tokenize`` (``\\w+`` over
lowercased text) — the same contract every oracle-checked text
operator shares, so the DuckDB oracle reproduces grams exactly with
``regexp_extract_all(lower(text), '\\w+')``.

Modes:

- ``mode="all"``: every occurrence of a duplicated k-gram is flagged
  (the corpus-global "remove it wherever it repeats" rule; SQL:
  ``HAVING count(*) > 1``).
- ``mode="first_wins"``: the corpus-order first occurrence (doc_id,
  then position) survives, later occurrences are flagged — the
  engine's standard first-occurrence-wins convention.

Scale shape: gram identities shuffle as 16 B/row (uint64 rolling-poly
hash + packed int64 order), never text; both marking passes are ONE
sort + per-block numpy kernels with boundary residuals (stages/groups
machinery), and the interval merge is a third sort over only the
flagged positions (usually a small fraction of the corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from dedup_restore_ray.functions.hashing import WordHasher
from dedup_restore_ray.functions.shingle import _POLY, tokenize

# order = (doc_id << _POS_BITS) | window_pos.  2^24 token positions
# (~16M tokens/doc) leaves 2^39 doc ids; both overflow loudly below.
_POS_BITS = 24
_POS_MASK = (1 << _POS_BITS) - 1

_SPAN_SCHEMA = pa.schema([("doc_id", pa.int64()),
                          ("span_start", pa.int64()),
                          ("span_end", pa.int64())])


def _empty_spans() -> pa.Table:
    return _SPAN_SCHEMA.empty_table()


class GramRows:
    """Batch -> (ghash uint64, order int64), one row per positional
    word k-gram window.  Docs with fewer than k tokens emit nothing
    (matching the oracle's ``range(1, greatest(len-k+1, 0) + ...)``
    window count).  Callable class: the WordHasher cache builds once
    per actor.  Tokenization rides the Arrow C++ kernel path
    (``arrow_token_hashes`` — no normalized-string join, word hashing
    touches only distinct tokens); the k-pass rolling polynomial runs
    ONCE over the batch's flat word-hash stream in the scratch arena,
    and each doc gathers its valid window span (window p spans
    wh[p:p+k]; cross-doc windows are simply never gathered)."""

    def __init__(self, k: int, id_col: str, text_col: str, seed: int = 0):
        self.k = k
        self.id_col = id_col
        self.text_col = text_col
        self.hasher = WordHasher(seed=seed)

    def __call__(self, b: pa.Table) -> pa.Table:
        from dedup_restore_ray.functions.hashing import scratch
        from dedup_restore_ray.functions.shingle import arrow_token_hashes
        from dedup_restore_ray.stages.groups import _ramp

        k = self.k
        ids = np.asarray(b.column(self.id_col), dtype=np.int64)
        wh, counts = arrow_token_hashes(b.column(self.text_col),
                                        self.hasher)
        wins = np.maximum(counts - k + 1, 0)
        n_wins = int(wins.sum())
        if n_wins == 0:
            return pa.table({"ghash": pa.array([], pa.uint64()),
                             "order": pa.array([], pa.int64())})
        if len(ids) and (int(ids.min()) < 0
                         or int(ids.max()) >> (63 - _POS_BITS)):
            raise ValueError(
                f"doc ids outside [0, 2^{63 - _POS_BITS}): order packing "
                "would bleed position bits into doc-id bits")
        if int(counts.max()) > _POS_MASK:
            raise ValueError(
                f"doc has > 2^{_POS_BITS} tokens: order packing would "
                "overflow into doc-id bits")
        total = len(wh)
        m = total - k + 1  # >= 1 whenever any doc has a window
        with np.errstate(over="ignore"):
            acc = scratch("xs_acc", m)
            np.copyto(acc, wh[:m])
            for j in range(1, k):
                np.multiply(acc, _POLY, out=acc)
                np.add(acc, wh[j:j + m], out=acc)
        off = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=off[1:])
        pos = _ramp(wins)
        idx = np.repeat(off, wins) + pos
        ghash = np.take(acc, idx)  # fresh array: escapes the arena
        order = (np.repeat(ids, wins) << _POS_BITS) | pos
        return pa.table({"ghash": pa.array(ghash, pa.uint64()),
                         "order": pa.array(order, pa.int64())})


def _dup_occurrences(rows: "ray.data.Dataset", mode: str
                     ) -> "ray.data.Dataset":
    """(ghash, order) -> flagged (doc_id, pos) occurrences.  One sort
    by [ghash, order]; interior blocks hold whole gram groups, edge
    groups are re-marked whole by the residual pass."""
    from dedup_restore_ray.stages.groups import group_bounds, sorted_split

    interior, edge = sorted_split(rows, ["ghash", "order"], ["ghash"])

    def block_flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        starts, ends = group_bounds(b, ["ghash"])
        sizes = ends - starts
        order = np.asarray(b.column("order"), dtype=np.int64)
        if mode == "all":
            sel = np.repeat(sizes >= 2, sizes)
        else:  # first_wins: sorted by order within group -> drop firsts
            sel = np.ones(len(order), dtype=bool)
            sel[starts] = False
        o = order[sel]
        return pa.table({"doc_id": pa.array(o >> _POS_BITS),
                         "pos": pa.array(o & _POS_MASK)})

    def residual_flag(g: pa.Table) -> pa.Table:
        return block_flag(g.sort_by([("ghash", "ascending"),
                                     ("order", "ascending")]))

    return (interior.map_batches(block_flag, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby("ghash").map_groups(
                residual_flag, batch_format="pyarrow")))


def _merge_spans(occ: "ray.data.Dataset", k: int) -> "ray.data.Dataset":
    """Flagged (doc_id, pos) -> merged maximal intervals
    (doc_id, span_start, span_end): each occurrence covers
    [pos, pos + k); overlapping/adjacent-overlapping covers fuse.
    One sort by [doc_id, pos] + a vectorized gaps-and-islands kernel;
    docs split across blocks are re-merged whole by the residual."""
    from dedup_restore_ray.stages.groups import group_bounds, sorted_split

    interior, edge = sorted_split(occ, ["doc_id", "pos"], ["doc_id"])
    # per-group monotone offset so ONE global cummax handles all docs
    # in a block; must exceed any span end (pos < 2^_POS_BITS, +k).
    big = np.int64(1) << np.int64(_POS_BITS + 1)

    def block_merge(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return _empty_spans()
        starts, ends = group_bounds(b, ["doc_id"])
        pos = np.asarray(b.column("pos"), dtype=np.int64)
        end = pos + k
        grp = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        shift = grp * big
        cm = np.maximum.accumulate(end + shift)
        new = np.ones(n, dtype=bool)
        new[1:] = (pos[1:] + shift[1:]) > cm[:-1]
        isl = np.flatnonzero(new)
        return pa.table({
            "doc_id": b.column("doc_id").take(pa.array(isl)),
            "span_start": pa.array(pos[isl]),
            "span_end": pa.array(np.maximum.reduceat(end, isl))})

    def residual_merge(g: pa.Table) -> pa.Table:
        return block_merge(g.sort_by([("doc_id", "ascending"),
                                      ("pos", "ascending")]))

    return (interior.map_batches(block_merge, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby("doc_id").map_groups(
                residual_merge, batch_format="pyarrow")))


def exact_substring_spans(ds: "ray.data.Dataset", k: int = 8,
                          mode: str = "all", id_col: str = "doc_id",
                          text_col: str = "text") -> "ray.data.Dataset":
    """Maximal duplicated-substring token spans per doc:
    (doc_id, span_start, span_end) with 0-based token indices,
    span_end exclusive.  ``k`` is the minimum match length in word
    tokens (the paper uses 50 BPE tokens at web scale)."""
    if mode not in ("all", "first_wins"):
        raise ValueError(f"mode must be 'all' or 'first_wins', "
                         f"got {mode!r}")
    rows = ds.map_batches(GramRows(k, id_col, text_col),
                          batch_format="pyarrow", concurrency=8)
    return _merge_spans(_dup_occurrences(rows, mode), k)


def _collect_span_lists(spans: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, span_start, span_end) -> one (doc_id, span_flat
    list<int64>) row per affected doc, spans interleaved
    [s0, e0, s1, e1, ...] in ascending-start order.  Sort + per-block
    ListArray assembly; docs split across blocks are rebuilt whole by
    the residual pass."""
    from dedup_restore_ray.stages.groups import group_bounds, sorted_split

    interior, edge = sorted_split(spans, ["doc_id", "span_start"],
                                  ["doc_id"])

    def block_collect(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "span_flat": pa.array([], pa.list_(pa.int64()))})
        starts, ends = group_bounds(b, ["doc_id"])
        s = np.asarray(b.column("span_start"), dtype=np.int64)
        e = np.asarray(b.column("span_end"), dtype=np.int64)
        flat = np.empty(2 * n, dtype=np.int64)
        flat[0::2] = s
        flat[1::2] = e
        offsets = np.empty(len(starts) + 1, dtype=np.int64)
        offsets[:-1] = 2 * starts
        offsets[-1] = 2 * n
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pa.array(flat, pa.int64())).cast(pa.list_(pa.int64()))
        return pa.table({"doc_id": b.column("doc_id").take(pa.array(starts)),
                         "span_flat": lists})

    def residual_collect(g: pa.Table) -> pa.Table:
        return block_collect(g.sort_by([("doc_id", "ascending"),
                                        ("span_start", "ascending")]))

    return (interior.map_batches(block_collect, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby("doc_id").map_groups(
                residual_collect, batch_format="pyarrow")))


def _clean_kernel(id_col: str, text_col: str, with_spans: bool,
                  emit_text: bool = False):
    import hashlib

    empty_md5 = hashlib.md5(b"").hexdigest()

    def clean(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        span_lists = (b.column("span_flat").to_pylist() if with_spans
                      else [None] * len(ids))
        md5 = hashlib.md5
        n_tok, n_dup, clean_md5 = [], [], []
        clean_text: list[str] = []
        for t, flat in zip(texts, span_lists):
            toks = tokenize(t)
            n_tok.append(len(toks))
            if flat:
                keep = np.ones(len(toks), dtype=bool)
                for j in range(0, len(flat), 2):
                    keep[flat[j]:flat[j + 1]] = False
                n_dup.append(int(len(toks) - keep.sum()))
                kept = " ".join(tok for tok, kp in zip(toks, keep) if kp)
            else:
                n_dup.append(0)
                kept = " ".join(toks)
            clean_md5.append(md5(kept.encode("utf-8")).hexdigest()
                             if kept else empty_md5)
            if emit_text:
                clean_text.append(kept)
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_dup_tokens": pa.array(n_dup, pa.int64()),
                "clean_md5": pa.array(clean_md5, pa.string())}
        if emit_text:
            cols["clean_text"] = pa.array(clean_text, pa.string())
        return pa.table(cols)
    return clean


def exact_substring_clean(ds: "ray.data.Dataset", k: int = 8,
                          mode: str = "first_wins", id_col: str = "doc_id",
                          text_col: str = "text",
                          emit_text: bool = False) -> "ray.data.Dataset":
    """The paper's deliverable: remove every token covered by a merged
    duplicated span and re-join the survivors with single spaces.  One
    row per input doc: (doc_id, n_tokens, n_dup_tokens, clean_md5);
    clean_md5 is md5('') for token-less or fully-dropped docs.  The
    default ``mode="first_wins"`` keeps the corpus-order first copy of
    each duplicated window (Lee et al.'s all-but-one removal);
    ``mode="all"`` drops every copy (boilerplate-style).  Span lists
    fold to one small row per affected doc and rendezvous back onto the
    corpus via the sort-scatter — the corpus text shuffles once."""
    from dedup_restore_ray.stages.cluster import scatter_lookup_split

    spans = exact_substring_spans(ds, k, mode, id_col, text_col)
    collected = _collect_span_lists(spans).materialize()
    # identity pyarrow pass: pandas-origin inputs otherwise reach the
    # scatter with pandas dtypes in Dataset.schema() (zero-copy for
    # Arrow blocks)
    docs = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: b, batch_format="pyarrow")
    if collected.count() == 0:
        # no duplicated spans anywhere: every doc is a miss (an empty
        # store has no schema and would trip the scatter rendezvous)
        return docs.map_batches(
            _clean_kernel(id_col, text_col, False, emit_text),
            batch_format="pyarrow")
    hits, misses = scatter_lookup_split(docs, collected, id_col,
                                        "span_flat", [id_col, text_col])
    return (hits.map_batches(
                _clean_kernel(id_col, text_col, True, emit_text),
                batch_format="pyarrow")
            .union(misses.map_batches(
                _clean_kernel(id_col, text_col, False, emit_text),
                batch_format="pyarrow")))


def exact_substring_stats(ds: "ray.data.Dataset", k: int = 8,
                          mode: str = "all", id_col: str = "doc_id",
                          text_col: str = "text") -> "ray.data.Dataset":
    """Per-doc totals over the merged spans: (doc_id, n_tokens,
    n_dup_tokens) for EVERY input doc (0 for untouched docs) —
    the per-doc duplicate-token budget the paper reports corpus-wide.
    The spans fold to one small row per affected doc and rendezvous
    back onto the doc list via the sort-scatter (no Dataset.join)."""
    from dedup_restore_ray.stages.cluster import scatter_lookup_split
    from dedup_restore_ray.stages.groups import grouped_aggregate

    spans = exact_substring_spans(ds, k, mode, id_col, text_col)

    def span_len(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("span_start"), dtype=np.int64)
        e = np.asarray(b.column("span_end"), dtype=np.int64)
        return pa.table({"doc_id": b.column("doc_id"),
                         "dup_tokens": pa.array(e - s)})

    per_doc = grouped_aggregate(
        spans.map_batches(span_len, batch_format="pyarrow"),
        ["doc_id"], {"n_dup_tokens": ("dup_tokens", "sum")})

    hasher = WordHasher(seed=0)

    def tok_counts(b: pa.Table) -> pa.Table:
        from dedup_restore_ray.functions.shingle import arrow_token_hashes
        _, counts = arrow_token_hashes(b.column(text_col), hasher)
        return pa.table({"doc_id": b.column(id_col),
                         "n_tokens": pa.array(counts, pa.int64())})

    docs = ds.map_batches(tok_counts, batch_format="pyarrow")
    hits, misses = scatter_lookup_split(docs, per_doc, "doc_id",
                                        "n_dup_tokens",
                                        ["doc_id", "n_tokens"])

    def zero_fill(b: pa.Table) -> pa.Table:
        return b.append_column(
            "n_dup_tokens", pa.array(np.zeros(b.num_rows, np.int64)))

    return hits.union(misses.map_batches(zero_fill,
                                         batch_format="pyarrow"))
