"""Distributed heavy hitters — frequent values without a vocab shuffle.

Finds every value whose global count exceeds N/m with TWO streaming
passes and bounded state, instead of shuffling the full distinct-value
table (the ngram_topk path) — at web scale the vocabulary is billions
of rows while the heavy-hitter candidate set is tiny:

pass 1 (candidates): each block emits the values that are locally
  frequent — ``count_b * m > n_b``.  Pigeonhole guarantees this union
  is a SUPERSET of the true heavy hitters: if ``count(v) * m > N``
  then some block has ``count_b(v) * m > n_b`` (otherwise summing the
  per-block inequalities contradicts the global one).  Output is < m
  rows per block, so the driver's candidate set is bounded by
  m x blocks, deduplicated — never the vocabulary.
pass 2 (exact confirm): the candidate set broadcasts as a packed
  sorted uint64 hash array (CLAUDE.md broadcast rule); each block
  counts ONLY candidate occurrences, a grouped sum produces exact
  global counts, and the integer threshold ``count * m > N`` filters
  false candidates.  No approximation survives to the output.

Thresholding is pure integer arithmetic (``count * m > N``, never a
division), so the result is bit-reproducible and SQL-checkable
(HAVING count(*) * m > total).

Reference analogue: none (the reference's counters are global sums,
src/optsmr.c:319-324); this is the Misra-Gries/SpaceSaving family
re-expressed as a deterministic two-pass Ray Data plan.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray

from dedup_restore_ray.functions.hashing import WordHasher
from dedup_restore_ray.stages.groups import grouped_aggregate


def heavy_hitters(ds: "ray.data.Dataset", m: int,
                  tokens_of=None, col: str = "text"
                  ) -> "ray.data.Dataset":
    """Values occurring more than N/m times across the token stream.

    ``tokens_of(batch) -> list[str]`` extracts the token stream from a
    batch (defaults to whitespace-free ``\\w+`` tokens of ``col`` via
    functions.shingle.tokenize).  Returns a Dataset of
    (value, n_occurrences) — exact counts, guaranteed complete."""
    if tokens_of is None:
        from dedup_restore_ray.functions.shingle import tokenize

        def tokens_of(batch: pa.Table) -> list[str]:
            out: list[str] = []
            for t in batch.column(col).to_pylist():
                out.extend(tokenize(t))
            return out

    def candidates(b: pa.Table) -> pa.Table:
        toks = tokens_of(b)
        n_b = len(toks)
        c = Counter(toks)
        cand = [v for v, k in c.items() if k * m > n_b]
        if cand:
            vals = pa.array(cand, pa.string())
            nbs = np.zeros(len(cand), np.int64)
            nbs[0] = n_b                 # block total rides row 0
        else:
            vals = pa.array([None], pa.string())
            nbs = np.array([n_b], np.int64)
        return pa.table({"value": vals, "n_b": pa.array(nbs)})

    p1 = ds.map_batches(candidates, batch_format="pyarrow").to_pandas()
    total = int(p1["n_b"].sum())
    cand_vals = p1["value"].dropna().unique().tolist()
    if not cand_vals:
        return ray.data.from_arrow(pa.table({
            "value": pa.array([], pa.string()),
            "n_occurrences": pa.array([], pa.int64())}))
    wh = WordHasher()
    ch = wh.hash_words(cand_vals)
    order = np.argsort(ch)
    pack = ray.put((ch[order], np.array(cand_vals, dtype=object)[order]))

    def count_candidates(b: pa.Table) -> pa.Table:
        keys, _ = ray.get(pack)
        c = Counter(tokens_of(b))
        if not c:
            return pa.table({"value": pa.array([], pa.string()),
                             "pc": pa.array([], pa.int64())})
        vals = list(c.keys())
        hs = WordHasher().hash_words(vals)
        pos = np.searchsorted(keys, hs)
        pos[pos >= len(keys)] = 0
        hit = keys[pos] == hs
        return pa.table({
            "value": pa.array([v for v, h in zip(vals, hit) if h],
                              pa.string()),
            "pc": pa.array(np.array([c[v] for v, h in zip(vals, hit)
                                     if h], dtype=np.int64))})

    counts = grouped_aggregate(
        ds.map_batches(count_candidates, batch_format="pyarrow"),
        ["value"], {"n_occurrences": ("pc", "sum")})
    return counts.map_batches(
        lambda b: b.filter(pa.array(
            np.asarray(b.column("n_occurrences"), dtype=np.int64)
            * m > total)),
        batch_format="pyarrow")
