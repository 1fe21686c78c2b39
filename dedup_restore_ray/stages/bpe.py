"""Distributed BPE tokenizer TRAINING (Sennrich et al., ACL 2016) —
the full iterative merge loop, not just one counting step
(cf. queries.q_bpe_merge_pairs_docs).

BPE trains on the WORD-FREQUENCY table, not the raw corpus: the
corpus collapses to distinct (word, count) rows once (the standard
scalable formulation), then each round
  1. counts adjacent symbol pairs weighted by word count
     (per-block exact partials -> one small grouped sum),
  2. picks the argmax pair on the driver (ties broken by the pair's
     SYMBOL STRINGS, so the merge list is a deterministic function of
     the corpus alone),
  3. applies the merge to every word with a vectorized CSR kernel
     (leftmost-first non-overlapping, the classic greedy rule).

State per round: the (syms: list<int32>, cnt) Dataset (materialized —
two consumers per round, see CLAUDE.md's double-consumer note) and a
driver-held id->string vocab that grows by ONE entry per round.
Symbols are int32 ids; pair keys pack (a << 21 | b) into one int64.

Scale contract: the word table is bounded by |distinct words| (well
below corpus size; the round loop is K sequential barriers over it).
The default ``mode="delta"`` counts the full pair table once, then
per round recounts ONLY the words the previous merge touched (those
containing the new symbol; the pre-merge pairs are recovered by
expanding it back — the merge is invertible) and folds the tiny
(pk, ±n) delta into a driver-held dict of per-distinct-pair counts
(bounded by vocab², independent of corpus size).  ``mode="full"``
re-aggregates every round (kept for parity tests).

Tokens come from ``lower(text)`` split on ``\\W+`` — RE2's ``\\w`` is
ASCII-only, so initial symbols are single ASCII bytes and the vocab
ids stay well under the 2^21 pack bound for any realistic K.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_PACK_BITS = 21
_PACK_MAX = 1 << _PACK_BITS


def merge_pair_csr(flat: np.ndarray, offsets: np.ndarray,
                   a: int, b: int, new_id: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Apply one merge (a, b) -> new_id over CSR symbol sequences,
    leftmost-first non-overlapping within each word.

    Overlapping candidates (possible only when a == b, e.g. 'aaaa')
    are resolved by run parity: within each maximal run of
    consecutive candidate positions, keep positions 0, 2, 4, ... —
    exactly the greedy left-to-right scan's choice."""
    n = len(flat)
    if n < 2:
        return flat, offsets
    cand = np.zeros(n - 1, dtype=bool)
    np.logical_and(flat[:-1] == a, flat[1:] == b, out=cand)
    # position i+1 must not start a new word
    starts = offsets[1:-1]
    cand[starts[(starts > 0) & (starts < n)] - 1] = False
    if not cand.any():
        return flat, offsets
    # run parity: distance from each run's head must be even
    idx = np.flatnonzero(cand)
    run_head = np.ones(len(idx), dtype=bool)
    run_head[1:] = np.diff(idx) > 1
    head_pos = idx[run_head]
    dist = idx - np.repeat(head_pos, np.diff(
        np.concatenate((np.flatnonzero(run_head), [len(idx)]))))
    keep = idx[(dist & 1) == 0]
    out = flat.copy()
    out[keep] = new_id
    dead = np.zeros(n, dtype=bool)
    dead[keep + 1] = True
    # per-word removed count -> new offsets
    w = np.searchsorted(offsets, keep + 1, side="right") - 1
    removed = np.bincount(w, minlength=len(offsets) - 1)
    new_offsets = offsets.copy()
    new_offsets[1:] -= np.cumsum(removed)
    return out[~dead], new_offsets


def _pairs_weighted(flat: np.ndarray, offsets: np.ndarray,
                    cnt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact weighted adjacent-pair counts over CSR words:
    (unique packed pair keys, totals).  Pure numpy, no word spans."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if len(flat) < 2:
        return empty
    valid = np.ones(len(flat) - 1, dtype=bool)
    starts = offsets[1:-1]
    valid[starts[(starts > 0) & (starts < len(flat))] - 1] = False
    if not valid.any():
        return empty
    f64 = flat.astype(np.int64, copy=False)
    pk = (f64[:-1] << _PACK_BITS) | f64[1:]
    w = np.repeat(cnt, np.diff(offsets))[:-1]
    pk, w = pk[valid], w[valid]
    uniq, inv = np.unique(pk, return_inverse=True)
    tot = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(tot, inv, w)
    return uniq, tot


def _pair_partial(b: pa.Table) -> pa.Table:
    """Per-block exact pair-count partial: (packed pair key, count)."""
    syms = b.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    offsets = np.asarray(syms.offsets, dtype=np.int64)
    flat = np.asarray(syms.values, dtype=np.int64)
    cnt = np.asarray(b.column("cnt"), dtype=np.int64)
    uniq, tot = _pairs_weighted(flat, offsets, cnt)
    return pa.table({"pk": pa.array(uniq), "pn": pa.array(tot)})


def _delta_partial(b: pa.Table, a: int, bb: int, nid: int) -> pa.Table:
    """Pair-count DELTA contributed by this block's words that were
    touched by the merge (a, bb) -> nid, computed AFTER the merge was
    applied: touched words are exactly those containing ``nid``, and
    the pre-merge word is recovered by expanding ``nid`` back to
    (a, bb) — the merge is invertible, so no pre-merge copy is kept.
    Emits (pk, pn) rows with pn = post-count - pre-count; words not
    containing nid contribute nothing (their pairs are unchanged)."""
    e = pa.array([], pa.int64())
    syms = b.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    offsets = np.asarray(syms.offsets, dtype=np.int64)
    flat = np.asarray(syms.values, dtype=np.int32)
    cnt = np.asarray(b.column("cnt"), dtype=np.int64)
    has = flat == nid
    if not has.any():
        return pa.table({"pk": e, "pn": e})
    word_of = np.searchsorted(offsets, np.flatnonzero(has),
                              side="right") - 1
    touched = np.unique(word_of)
    lens = np.diff(offsets)
    sl = lens[touched]
    so = np.zeros(len(touched) + 1, np.int64)
    np.cumsum(sl, out=so[1:])
    idx = (np.repeat(offsets[touched], sl)
           + (np.arange(so[-1], dtype=np.int64) - np.repeat(so[:-1], sl)))
    sel_flat = flat[idx]
    sel_cnt = cnt[touched]
    new_pk, new_n = _pairs_weighted(sel_flat, so, sel_cnt)
    # expand nid -> (a, bb) to reconstruct the pre-merge words
    is_new = sel_flat == nid
    cum = np.zeros(len(sel_flat) + 1, np.int64)
    np.cumsum(is_new, out=cum[1:])
    old_flat = np.empty(len(sel_flat) + int(cum[-1]), sel_flat.dtype)
    pos = np.arange(len(sel_flat), dtype=np.int64) + cum[:-1]
    old_flat[pos] = np.where(is_new, np.int32(a), sel_flat)
    old_flat[pos[is_new] + 1] = np.int32(bb)
    old_off = so + cum[so]
    old_pk, old_n = _pairs_weighted(old_flat, old_off, sel_cnt)
    allpk = np.concatenate([new_pk, old_pk])
    alln = np.concatenate([new_n, -old_n])
    uniq, inv = np.unique(allpk, return_inverse=True)
    tot = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(tot, inv, alln)
    nz = tot != 0
    return pa.table({"pk": pa.array(uniq[nz]), "pn": pa.array(tot[nz])})


def _merge_pair_counts(counts: dict, pk: np.ndarray,
                       pn: np.ndarray) -> None:
    """Fold (pk, ±n) partial rows into the driver count dict,
    dropping keys whose count falls to zero."""
    uniq, inv = np.unique(pk, return_inverse=True)
    tot = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(tot, inv, pn)
    for k, dn in zip(uniq.tolist(), tot.tolist()):
        c = counts.get(k, 0) + dn
        if c > 0:
            counts[k] = c
        else:
            counts.pop(k, None)


def bpe_train(ds, text_col: str = "text", n_merges: int = 24,
              mode: str = "delta") -> pd.DataFrame:
    """Train ``n_merges`` BPE merges over a document Dataset.

    Returns one row per learned merge: (rank, left, right, merged,
    cnt) — cnt is the corpus-wide weighted pair count at the time the
    merge was chosen.  Stops early when no adjacent pair remains with
    count >= 2 (a singleton pair can never compress).

    ``mode="delta"`` (default) counts the full pair table ONCE, then
    per round recounts ONLY the words touched by the chosen merge
    (those containing the new symbol — the merge is invertible, so
    the pre-merge pairs are recovered by expanding it back) and folds
    the small (pk, ±n) delta into a driver-held count dict.  Driver
    state is one int per DISTINCT adjacent symbol pair — bounded by
    vocab², independent of corpus size.  ``mode="full"`` recounts the
    whole word table every round (the reference formulation; kept for
    parity tests)."""
    from dedup_restore_ray.stages.groups import grouped_aggregate
    if mode not in ("delta", "full"):
        raise ValueError(f"mode must be 'delta' or 'full', got {mode!r}")

    def words(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if pa.types.is_null(t.type):      # all-None block
            t = pa.array([""] * len(t), pa.string())
        elif t.null_count:
            t = t.fill_null("")
        sp = pc.split_pattern_regex(pc.utf8_lower(t), r"\W+")
        flat = pc.list_flatten(sp)
        flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        d = flat.dictionary_encode()
        codes = np.asarray(d.indices, dtype=np.int64)
        tot = np.bincount(codes, minlength=len(d.dictionary))
        return pa.table({"word": d.dictionary,
                         "n": pa.array(tot.astype(np.int64))})

    wc = grouped_aggregate(
        ds.map_batches(words, batch_format="pyarrow"),
        ["word"], {"cnt": ("n", "sum")})

    def to_syms(b: pa.Table) -> pa.Table:
        w = b.column("word")
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        # ASCII-only words (RE2 \w): symbol ids = byte values
        joined = "".join(w.to_pylist())
        flat = np.frombuffer(joined.encode("ascii"), np.uint8
                             ).astype(np.int32)
        lens = np.asarray(pc.binary_length(w), dtype=np.int64)
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        syms = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                        pa.array(flat, pa.int32()))
        return pa.table({"syms": syms, "cnt": b.column("cnt")})

    table = wc.map_batches(to_syms, batch_format="pyarrow"
                           ).materialize()
    vocab = {i: chr(i) for i in range(128)}
    next_id = 128
    merges = []
    counts: dict[int, int] | None = None
    if mode == "delta":
        # size-gated block coalesce: the K-round loop re-scans this
        # table every round, so dozens of tiny blocks are pure
        # scheduling overhead (a real corpus keeps cpu-count blocks)
        from dedup_restore_ray.stages.groups import flatten_blocks
        table = flatten_blocks(table)
        # per-block partials merged on the DRIVER (np.unique), no
        # sort shuffle: the pair keyspace is bounded by vocab², so
        # driver-side merge is O(blocks x distinct pairs), tiny
        part = table.map_batches(_pair_partial,
                                 batch_format="pyarrow").to_pandas()
        counts = {}
        if "pk" in part.columns and len(part):
            _merge_pair_counts(counts,
                               part["pk"].to_numpy(np.int64),
                               part["pn"].to_numpy(np.int64))
    for rank in range(n_merges):
        if mode == "full":
            agg = grouped_aggregate(
                table.map_batches(_pair_partial, batch_format="pyarrow"),
                ["pk"], {"cnt": ("pn", "sum")}).to_pandas()
            if len(agg) == 0:
                break
            pk = agg["pk"].to_numpy(np.int64)
            cn = agg["cnt"].to_numpy(np.int64)
        else:
            if not counts:
                break
            pk = np.fromiter(counts.keys(), np.int64, len(counts))
            cn = np.fromiter(counts.values(), np.int64, len(counts))
        best = cn.max()
        if best < 2:
            break
        # tie-break on SYMBOL STRINGS: deterministic in the corpus
        tie = pk[cn == best]
        la = [vocab[int(p) >> _PACK_BITS] for p in tie]
        rb = [vocab[int(p) & (_PACK_MAX - 1)] for p in tie]
        j = min(range(len(tie)), key=lambda i: (la[i], rb[i]))
        a_id, b_id = int(tie[j]) >> _PACK_BITS, \
            int(tie[j]) & (_PACK_MAX - 1)
        left, right = la[j], rb[j]
        assert next_id < _PACK_MAX, "vocab exceeds pair-pack bound"
        vocab[next_id] = left + right
        merges.append({"rank": rank, "left": left, "right": right,
                       "merged": left + right, "cnt": int(best)})

        def apply(b: pa.Table, a=a_id, bb=b_id, nid=next_id
                  ) -> pa.Table:
            syms = b.column("syms")
            if isinstance(syms, pa.ChunkedArray):
                syms = syms.combine_chunks()
            offs = np.asarray(syms.offsets, dtype=np.int64)
            flat = np.asarray(syms.values, dtype=np.int32)
            nf, no = merge_pair_csr(flat, offs, a, bb, nid)
            out = pa.ListArray.from_arrays(
                pa.array(no, pa.int32()), pa.array(nf, pa.int32()))
            return pa.table({"syms": out, "cnt": b.column("cnt")})

        table = table.map_batches(apply, batch_format="pyarrow"
                                  ).materialize()
        if mode == "delta":
            def delta(b: pa.Table, a=a_id, bb=b_id, nid=next_id
                      ) -> pa.Table:
                return _delta_partial(b, a, bb, nid)

            dagg = table.map_batches(delta,
                                     batch_format="pyarrow").to_pandas()
            if "pk" in dagg.columns and len(dagg):
                _merge_pair_counts(counts,
                                   dagg["pk"].to_numpy(np.int64),
                                   dagg["pn"].to_numpy(np.int64))
        next_id += 1
    if not merges:
        return pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                             "left": pd.Series([], dtype=str),
                             "right": pd.Series([], dtype=str),
                             "merged": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype=np.int64)})
    out = pd.DataFrame(merges)
    out["rank"] = out["rank"].astype(np.int64)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def bpe_train_reference(texts: list[str], n_merges: int = 24
                        ) -> list[tuple[str, str, int]]:
    """Sequential dict-based reference trainer (tests only): same
    tokenization, same leftmost-nonoverlap merge, same tie-break."""
    import re
    from collections import Counter
    wc: Counter = Counter()
    for t in texts:
        wc.update(w for w in re.split(r"\W+", (t or "").lower()) if w)
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            c = wc[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.values())
        if best < 2:
            break
        a, b = min(p for p, c in pairs.items() if c == best)
        merges.append((a, b, best))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def bpe_encode_counts(ds, merges: pd.DataFrame, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Apply a TRAINED merge table to the corpus (the tokenizer
    APPLICATION step that follows bpe_train): per batch, words
    dictionary-encode so each distinct word is merged once (the CSR
    kernel replays the rules in rank order — each rule's operands
    only exist after earlier ranks, so sequential application equals
    the classic lowest-rank-first loop), then per-doc token counts
    fold back through the dictionary codes with one bincount.

    The merge table is tiny (one row per rule) and ships inside the
    task closure; no shuffle at all — the whole encode is one
    map_batches pass.  Returns (id, n_words, n_tokens)."""
    vocab = {chr(i): i for i in range(128)}
    rules: list[tuple[int, int, int]] = []
    nid = 128
    for r in merges.sort_values("rank").itertuples():
        a, b = vocab[r.left], vocab[r.right]
        vocab[r.merged] = nid
        rules.append((a, b, nid))
        nid += 1

    def encode(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if pa.types.is_null(t.type):
            t = pa.array([""] * len(t), pa.string())
        elif t.null_count:
            t = t.fill_null("")
        sp = pc.split_pattern_regex(pc.utf8_lower(t), r"\W+")
        if isinstance(sp, pa.ChunkedArray):
            sp = sp.combine_chunks()
        flat = pc.list_flatten(sp)
        lens = np.diff(np.asarray(sp.offsets, dtype=np.int64))
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        nonempty = np.asarray(pc.greater(pc.binary_length(flat), 0))
        flat = flat.filter(pa.array(nonempty))
        doc_idx = doc_idx[nonempty]
        n_words = np.bincount(doc_idx, minlength=len(t)) \
            if len(doc_idx) else np.zeros(len(t), np.int64)
        if len(flat) == 0:
            tok = np.zeros(len(t), np.int64)
        else:
            d = flat.dictionary_encode()
            codes = np.asarray(d.indices, dtype=np.int64)
            words = d.dictionary
            joined = "".join(words.to_pylist())
            wf = np.frombuffer(joined.encode("ascii"),
                               np.uint8).astype(np.int32)
            wl = np.asarray(pc.binary_length(words), dtype=np.int64)
            wo = np.zeros(len(wl) + 1, np.int64)
            np.cumsum(wl, out=wo[1:])
            for a, bb, n_id in rules:
                wf, wo = merge_pair_csr(wf, wo, a, bb, n_id)
            enc_len = np.diff(wo)
            tok = np.bincount(doc_idx, weights=enc_len[codes],
                              minlength=len(t)).astype(np.int64)
        return pa.table({id_col: b.column(id_col),
                         "n_words": pa.array(
                             n_words.astype(np.int64)),
                         "n_tokens": pa.array(tok)})

    return ds.map_batches(encode, batch_format="pyarrow")


def bpe_encode_reference(texts: list[str],
                         merges: pd.DataFrame) -> list[int]:
    """Sequential per-word encoder (tests): split like the trainer,
    apply each merge rule left-to-right per word, return token count
    per text."""
    import re
    rules = [(r.left, r.right, r.merged)
             for r in merges.sort_values("rank").itertuples()]
    out = []
    for t in texts:
        words = [w for w in re.split(r"\W+", (t or "").lower()) if w]
        total = 0
        for w in words:
            syms = list(w)
            for left, right, merged in rules:
                i = 0
                res = []
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            total += len(syms)
        out.append(total)
    return out
