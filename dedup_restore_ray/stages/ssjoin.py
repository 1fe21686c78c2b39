"""Exact set-similarity self-join via prefix filtering (AllPairs /
PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08).

The EXACT counterpart of the MinHash+LSH rail: find every pair of
documents whose set Jaccard (k-gram shingle sets by default — any
set-of-uint64 representation works) meets a rational threshold
p/q, with zero recall loss and no signature approximation.  The
pruning lever is the *prefix filter*: order every token stream by
global document frequency (rarest first); a pair can reach Jaccard
tau only if the two sets share a token inside their first
``|x| - ceil(tau*|x|) + 1`` tokens of that order.  Proof sketch for
the symmetric (probe-prefix on both sides) variant used here: if the
order-smallest shared token w is outside a's prefix then all shared
tokens live in a's last ``ceil(tau*|a|) - 1`` positions, so
``inter <= ceil(tau*|a|) - 1``; but J >= tau forces
``|b| >= tau*|a|`` and hence
``inter >= tau/(1+tau)*(|a|+|b|) >= tau*|a|`` — contradiction, so
the prefixes of BOTH members contain a shared token and bucketing
prefix rows by token finds every qualifying pair.

Because rare tokens form the prefixes, bucket sizes track the df
ordering (a token of global frequency f can appear in at most f
prefixes) — the hot-token buckets the plain token-join would create
are exactly the ones the prefix filter prunes away.

The threshold is held RATIONAL end-to-end: J >= p/q is evaluated as
``(p + q) * inter >= p * (n_u + n_v)`` in int64 — no float compare,
so the operator is bit-exact against its SQL oracle.

Pipeline (one token-df scatter + one prefix sort + the shared
bucket-pair machinery + one packed verify):

  token sets -> df lookup -> per-doc prefix rows -> bucket_pairs
  (exact: no hot-bucket cap) -> intersection verify vs the broadcast
  token pack (gate to the sharded pack at corpus scale, as the
  flagship's jaccard verify does).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dedup_restore_ray.stages.cluster import _scatter_lookup
from dedup_restore_ray.stages.groups import (_ramp, bucket_pairs,
                                             group_bounds, grouped_aggregate,
                                             sorted_split)


class ShingleSetStage:
    """(id, text) batches -> (id, shingles=list<uint64>, n_set):
    per-doc sorted-unique k-gram word-shingle hashes via the shared
    ShingleEncoder (functions/shingle.py) — the same \\w+-lowercase
    token model and short-doc convention (0 < n < k tokens -> one
    whole-doc gram) every shingle oracle uses.  Encoder built once
    per actor."""

    def __init__(self, k: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
        from dedup_restore_ray.functions.shingle import ShingleEncoder
        self.id_col = id_col
        self.text_col = text_col
        self.encoder = ShingleEncoder(k=k)

    def __call__(self, b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({self.id_col: b.column(self.id_col),
                             "shingles": pa.array([], pa.list_(pa.uint64())),
                             "n_set": pa.array([], pa.int64())})
        flat, offs = self.encoder.encode(
            b.column(self.text_col).to_pylist())
        shingles = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(np.ascontiguousarray(flat), pa.uint64()))
        return pa.table({self.id_col: b.column(self.id_col),
                         "shingles": shingles,
                         "n_set": pa.array(np.diff(offs))})


class _IntersectVerify:
    """Exact |A ∩ B| per candidate pair against the broadcast token
    pack (ids sorted by id-hash, CSR offsets, flat sorted sets) —
    same per-pair sorted-merge kernel functions/jaccard.py measured
    fastest on this host, emitting integer counts instead of the
    float ratio."""

    def __init__(self, pack_ref, tau_num: int, tau_den: int):
        self.ref = pack_ref
        self.tau_num = tau_num
        self.tau_den = tau_den
        self._pack = None

    def __call__(self, b: pa.Table) -> pa.Table:
        from dedup_restore_ray.stages.verify import _VerifyPacked, _id_hashes
        if self._pack is None:
            self._pack = ray.get(self.ref)
        ids, offsets, flat = self._pack
        n = b.num_rows
        out_schema = pa.schema([
            ("u", b.schema.field("u").type), ("v", b.schema.field("v").type),
            ("n_inter", pa.int64()), ("n_u", pa.int64()),
            ("n_v", pa.int64())])
        if n == 0 or len(ids) == 0:
            return out_schema.empty_table()
        uh = _id_hashes(b.column("u"))
        vh = _id_hashes(b.column("v"))
        a_starts, a_lens = _VerifyPacked._lookup(self._pack, uh)
        b_starts, b_lens = _VerifyPacked._lookup(self._pack, vh)
        inter = np.zeros(n, dtype=np.int64)
        searchsorted = np.searchsorted
        count_nonzero = np.count_nonzero
        for i in range(n):
            la, lb = a_lens[i], b_lens[i]
            if la == 0 or lb == 0:
                continue
            x = flat[a_starts[i]:a_starts[i] + la]
            y = flat[b_starts[i]:b_starts[i] + lb]
            if la > lb:
                x, y = y, x
            idx = searchsorted(y, x)
            idx[idx == len(y)] = len(y) - 1
            inter[i] = count_nonzero(y[idx] == x)
        keep = ((self.tau_num + self.tau_den) * inter
                >= self.tau_num * (a_lens + b_lens))
        t = b.filter(pa.array(keep))
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "n_inter": pa.array(inter[keep]),
                         "n_u": pa.array(a_lens[keep]),
                         "n_v": pa.array(b_lens[keep])})


def ssjoin_pairs(docs: "ray.data.Dataset", tau_num: int = 1,
                 tau_den: int = 2, k: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> "ray.data.Dataset":
    """All pairs (u < v) of docs whose k-gram-shingle-set Jaccard is
    >= tau_num/tau_den, EXACT: (u, v, n_inter, n_u, n_v) int64 rows.
    Empty shingle sets never pair (matching SQL's length(s) > 0
    guards)."""
    if not (0 < tau_num <= tau_den):
        raise ValueError("tau must be a rational in (0, 1]")
    sigs = docs.map_batches(ShingleSetStage(k, id_col, text_col),
                            batch_format="pyarrow").materialize()

    def tok_rows(b: pa.Table) -> pa.Table:
        sh = b.column("shingles").combine_chunks()
        counts = np.diff(np.asarray(sh.offsets, dtype=np.int64))
        ids = b.column(id_col).take(
            pa.array(np.repeat(np.arange(len(counts)), counts)))
        return pa.table({"doc": ids,
                         "th": pa.array(np.asarray(sh.flatten(),
                                                   dtype=np.uint64)),
                         "n": pa.array(np.repeat(
                             counts.astype(np.int64), counts))})

    rows = sigs.map_batches(tok_rows, batch_format="pyarrow")
    df = grouped_aggregate(rows.select_columns(["th"]), ["th"], {},
                           count_alias="df")
    withdf = _scatter_lookup(rows, df, key_col="th", payload_col="df",
                             out_cols=["th", "doc", "n"])

    # prefix rows: per doc, the first (n - ceil(tau*n) + 1) tokens in
    # (df, th) order
    interior, edge = sorted_split(withdf, ["doc", "df", "th"], ["doc"])

    def prefix_rows(b: pa.Table) -> pa.Table:
        m = b.num_rows
        if m == 0:
            return pa.table({"bucket_key": pa.array([], pa.uint64()),
                             "doc": b.column("doc")})
        starts, ends = group_bounds(b, ["doc"])
        pos = _ramp(ends - starts)
        nn = np.asarray(b.column("n"), dtype=np.int64)
        pfx = nn - (tau_num * nn + tau_den - 1) // tau_den + 1
        keep = pa.array(pos < pfx)
        return pa.table({"bucket_key": b.column("th").filter(keep),
                         "doc": b.column("doc").filter(keep)})

    def prefix_residual(g: pa.Table) -> pa.Table:
        return prefix_rows(g.sort_by([("doc", "ascending"),
                                      ("df", "ascending"),
                                      ("th", "ascending")]))

    prows = (interior.map_batches(prefix_rows, batch_format="pyarrow",
                                  batch_size=None)
             .union(edge.groupby("doc").map_groups(
                 prefix_residual, batch_format="pyarrow")))

    # exact join: no hot-bucket cap (the df ordering already bounds
    # prefix-bucket sizes); distinct (u, v) candidates
    pairs = bucket_pairs(prows, max_all=1 << 62, num_salts=1,
                         key_col="bucket_key", id_col="doc")

    from dedup_restore_ray.stages.verify import build_shingle_pack
    packable = sigs.map_batches(
        lambda b: pa.table({"doc_id": b.column(id_col),
                            "shingles": b.column("shingles")}),
        batch_format="pyarrow")
    pack = build_shingle_pack(packable)
    pack_ref = ray.put(pack)
    return pairs.map_batches(
        _IntersectVerify(pack_ref, tau_num, tau_den),
        batch_format="pyarrow")
