"""Passage-level dedup: C4/RefinedWeb-shaped sub-document removal.

A *passage* is a consecutive non-overlapping window of ``window``
tokens (``\\w+`` over lowercased text — same tokenizer as every other
oracle-checked text operator, ``functions/shingle.tokenize``).  Two
removal rules, both corpus-global:

- ``mode="first_wins"``: a passage is dropped when the identical token
  window occurred earlier in corpus order (doc_id, then position) —
  the passage-granular form of the reference's fingerprint-index
  first-occurrence-wins dedup (reference: src/dedup.c:135-173), i.e.
  the "exact substring dedup" approximation used on web corpora.
- ``mode="frequent"``: a passage occurring in >= ``min_docs`` distinct
  docs is dropped from EVERY doc (RefinedWeb-style frequent-line /
  boilerplate rule; no canonical copy survives).

Scale shape: passage identities shuffle as 24 B/row (16-byte blake2b
key + packed int64 order), never text; the marking pass is ONE sort +
vectorized block kernels (stages/groups machinery).  Dropped-passage
indexes fold to one small list-row per affected doc and rendezvous
back onto the documents via the repo's sort-scatter (no Dataset.join);
cleaned text is then reassembled doc-locally, so the only corpus-text
shuffle is the single scatter sort carrying each doc once.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from dedup_restore_ray.functions.shingle import tokenize

# passage index packs into the low bits of the order key:
# order = (doc_id << _ORDER_BITS) | passage_idx.  2^20 passages/doc
# (~20M tokens at window=20) leaves 2^43 doc ids.
_ORDER_BITS = 20
_ORDER_MASK = (1 << _ORDER_BITS) - 1

_EMPTY_MD5 = hashlib.md5(b"").hexdigest()


def passage_split(tokens: list[str], window: int) -> list[str]:
    """Non-overlapping token windows; the last may be short."""
    return [" ".join(tokens[i:i + window])
            for i in range(0, len(tokens), window)]


def _passage_rows(b: pa.Table, id_col: str, text_col: str,
                  window: int) -> pa.Table:
    """(phash binary(16), order int64) — one row per passage."""
    ids = b.column(id_col).to_pylist()
    texts = b.column(text_col).to_pylist()
    hashes: list[bytes] = []
    orders: list[int] = []
    blake = hashlib.blake2b
    for d, t in zip(ids, texts):
        if int(d) >> (63 - _ORDER_BITS):
            raise ValueError(
                f"doc_id {d} >= 2^{63 - _ORDER_BITS}: passage-order "
                "packing would bleed into doc-id bits")
        base = int(d) << _ORDER_BITS
        j = -1
        for j, p in enumerate(passage_split(tokenize(t), window)):
            hashes.append(blake(p.encode("utf-8"), digest_size=16).digest())
            orders.append(base | j)
        if j > _ORDER_MASK:
            raise ValueError(
                f"doc {d} has {j + 1} passages > 2^{_ORDER_BITS}: "
                "order packing would overflow into doc-id bits")
    return pa.table({"phash": pa.array(hashes, pa.binary(16)),
                     "order": pa.array(orders, pa.int64())})


def passage_rows(ds: "ray.data.Dataset", id_col: str = "doc_id",
                 text_col: str = "text", window: int = 20
                 ) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: _passage_rows(b, id_col, text_col, window),
        batch_format="pyarrow")


def mark_frequent(rows: "ray.data.Dataset", key_col: str,
                  order_col: str, min_docs: int) -> "ray.data.Dataset":
    """Append ``is_dup``: True for EVERY row of a key group spanning
    >= min_docs distinct docs (doc = order >> _ORDER_BITS).  One sort;
    interior blocks hold whole groups, block-edge groups are re-marked
    whole by the residual pass (result independent of block layout)."""
    from dedup_restore_ray.stages.groups import group_bounds, sorted_split

    interior, edge = sorted_split(rows, [key_col, order_col], [key_col])

    def block_mark(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.append_column("is_dup", pa.array([], pa.bool_()))
        starts, ends = group_bounds(b, [key_col])
        docs = np.asarray(b.column(order_col)) >> _ORDER_BITS
        newdoc = np.ones(n, dtype=np.int64)
        newdoc[1:] = (docs[1:] != docs[:-1]).astype(np.int64)
        newdoc[starts] = 1
        ndocs = np.add.reduceat(newdoc, starts)
        drop = np.repeat(ndocs >= min_docs, ends - starts)
        return b.append_column("is_dup", pa.array(drop))

    def residual_mark(g: pa.Table) -> pa.Table:
        return block_mark(g.sort_by([(key_col, "ascending"),
                                     (order_col, "ascending")]))

    return (interior.map_batches(block_mark, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(
                residual_mark, batch_format="pyarrow")))


def _collect_dup_lists(flags: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, pidx) dup rows -> one (doc_id, dup_idxs list<int64>)
    row per affected doc, pidx ascending.  Sort + per-block ListArray
    assembly; block-split docs are rebuilt whole by the residual."""
    from dedup_restore_ray.stages.groups import group_bounds, sorted_split

    interior, edge = sorted_split(flags, ["doc_id", "pidx"], ["doc_id"])

    def block_collect(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dup_idxs": pa.array([], pa.list_(pa.int64()))})
        starts, ends = group_bounds(b, ["doc_id"])
        offsets = np.concatenate((starts, ends[-1:])).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            b.column("pidx").combine_chunks()).cast(pa.list_(pa.int64()))
        return pa.table({"doc_id": b.column("doc_id").take(pa.array(starts)),
                         "dup_idxs": lists})

    def residual_collect(g: pa.Table) -> pa.Table:
        return block_collect(g.sort_by([("doc_id", "ascending"),
                                        ("pidx", "ascending")]))

    return (interior.map_batches(block_collect, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby("doc_id").map_groups(
                residual_collect, batch_format="pyarrow")))


def _clean_kernel(window: int, with_payload: bool,
                  emit_text: bool = False):
    def clean(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        dup_lists = (b.column("dup_idxs").to_pylist() if with_payload
                     else [None] * len(ids))
        md5 = hashlib.md5
        n_pass, n_dup, clean_md5 = [], [], []
        clean_text: list[str] = []
        for t, dups in zip(texts, dup_lists):
            passages = passage_split(tokenize(t), window)
            drop = set(dups) if dups else ()
            kept = " ".join(p for j, p in enumerate(passages)
                            if j not in drop)
            n_pass.append(len(passages))
            n_dup.append(len(drop))
            clean_md5.append(md5(kept.encode("utf-8")).hexdigest()
                             if kept else _EMPTY_MD5)
            if emit_text:
                clean_text.append(kept)
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "n_passages": pa.array(n_pass, pa.int64()),
                "n_dup_passages": pa.array(n_dup, pa.int64()),
                "clean_md5": pa.array(clean_md5, pa.string())}
        if emit_text:
            cols["clean_text"] = pa.array(clean_text, pa.string())
        return pa.table(cols)
    return clean


def passage_dedup(ds: "ray.data.Dataset", window: int = 20,
                  mode: str = "first_wins", min_docs: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  emit_text: bool = False) -> "ray.data.Dataset":
    """Corpus-global passage removal; returns one row per input doc:
    (doc_id, n_passages, n_dup_passages, clean_md5) where clean_md5 is
    the md5 of the kept passages re-joined with single spaces (md5 of
    '' for token-less or fully-dropped docs)."""
    from dedup_restore_ray.stages.cluster import scatter_lookup_split
    from dedup_restore_ray.stages.groups import mark_canonical

    docs = ds.select_columns([id_col, text_col])
    if id_col != "doc_id":
        docs = docs.rename_columns({id_col: "doc_id"})
    if text_col != "text":
        docs = docs.rename_columns({text_col: "text"})

    rows = passage_rows(docs, "doc_id", "text", window)
    if mode == "first_wins":
        marked = mark_canonical(rows, "phash", id_col="order")
    elif mode == "frequent":
        marked = mark_frequent(rows, "phash", "order", min_docs)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    def dup_flags(b: pa.Table) -> pa.Table:
        sel = b.filter(b.column("is_dup").combine_chunks())
        order = np.asarray(sel.column("order"), dtype=np.int64)
        return pa.table({"doc_id": pa.array(order >> _ORDER_BITS),
                         "pidx": pa.array(order & _ORDER_MASK)})

    flags = marked.map_batches(dup_flags, batch_format="pyarrow")
    collected = _collect_dup_lists(flags).materialize()
    if collected.count() == 0:
        # no duplicated passages anywhere: every doc is a miss (an
        # empty store has no schema and would trip the scatter)
        return docs.map_batches(_clean_kernel(window, False, emit_text),
                                batch_format="pyarrow")
    hits, misses = scatter_lookup_split(
        docs, collected, "doc_id", "dup_idxs", ["doc_id", "text"])
    return (hits.map_batches(_clean_kernel(window, True, emit_text),
                             batch_format="pyarrow")
            .union(misses.map_batches(
                _clean_kernel(window, False, emit_text),
                batch_format="pyarrow")))


def passage_text_rows(ds: "ray.data.Dataset", id_col: str = "doc_id",
                      text_col: str = "text", window: int = 20
                      ) -> "ray.data.Dataset":
    """(pid int64, ptext) — one row per passage, pid packed as
    ``doc_id << _ORDER_BITS | passage_idx`` (same packing and guards
    as the identity-hash path, so doc ids recover as
    ``pid >> _ORDER_BITS``).  Feeds passage-granular operators that
    need the text itself (e.g. the exact set-similarity join)."""

    def rows(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        pids: list[int] = []
        ptexts: list[str] = []
        for d, t in zip(ids, texts):
            if int(d) >> (63 - _ORDER_BITS):
                raise ValueError(
                    f"doc_id {d} >= 2^{63 - _ORDER_BITS}: pid packing "
                    "would bleed into doc-id bits")
            base = int(d) << _ORDER_BITS
            j = -1
            for j, p in enumerate(passage_split(tokenize(t), window)):
                pids.append(base | j)
                ptexts.append(p)
            if j > _ORDER_MASK:
                raise ValueError(
                    f"doc {d} has {j + 1} passages > 2^{_ORDER_BITS}")
        return pa.table({"pid": pa.array(pids, pa.int64()),
                         "ptext": pa.array(ptexts, pa.string())})

    return ds.map_batches(rows, batch_format="pyarrow")
