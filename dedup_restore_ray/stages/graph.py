"""Distributed graph analytics over edge Datasets.

Two classic operators a dedup engine's pair stream feeds directly:

- ``triangle_stats``: exact triangle / wedge counting via the
  degree-orientation wedge join (Cohen's MapReduce formulation;
  Suri & Vassilvitskii, WWW'11).  Orienting every edge from its
  lower-(degree, id) endpoint to the higher one turns the graph into
  a DAG whose max out-degree is O(sqrt(m)), so per-node wedge
  emission is bounded even on power-law degree distributions — the
  skew story the plain "emit all neighbor pairs" formulation lacks.
  Each triangle is counted exactly once (at its unique
  orientation-minimal vertex).

- ``pagerank_fixed_point``: PageRank power iteration in pure int64
  fixed-point arithmetic (micro-ranks).  Every step is
  order-independent integer math — ``r' = base + damp * sum(r // deg)
  // 1000`` — so the result is bit-identical regardless of block
  layout or summation order, which makes the operator
  SQL-oracle-checkable (the DuckDB oracle unrolls the same
  iterations); float PageRank sums are addition-order-dependent and
  can't be hash-compared (CLAUDE.md's oracle-float-trap rule).

Both ride the engine's sort-scatter machinery: one sort per shuffle,
no ``groupby().map_groups`` on many-group paths, no driver-side state
proportional to the graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedup_restore_ray.functions.hashing import arrow_row_hashes, mix64
from dedup_restore_ray.stages.cluster import _scatter_lookup
from dedup_restore_ray.stages.groups import (flatten_blocks, group_bounds,
                                             group_pair_indices,
                                             grouped_aggregate, sorted_split)


def degree_table(edges: "ray.data.Dataset", u_col: str = "u",
                 v_col: str = "v") -> "ray.data.Dataset":
    """(node, deg) from distinct undirected (u, v) edges (u != v)."""

    def endpoints(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column(u_col), dtype=np.int64)
        v = np.asarray(b.column(v_col), dtype=np.int64)
        return pa.table({"node": pa.array(np.concatenate([u, v]))})

    both = edges.map_batches(endpoints, batch_format="pyarrow")
    return grouped_aggregate(both, ["node"], {}, count_alias="deg")


def _oriented_edges(edges: "ray.data.Dataset",
                    deg: "ray.data.Dataset") -> "ray.data.Dataset":
    """Attach both endpoint degrees (two sort-scatters), then orient
    each edge from the lower-(deg, id) endpoint to the higher."""
    du = deg.map_batches(
        lambda b: pa.table({"u": b.column("node"), "du": b.column("deg")}),
        batch_format="pyarrow")
    dv = deg.map_batches(
        lambda b: pa.table({"v": b.column("node"), "dv": b.column("deg")}),
        batch_format="pyarrow")
    withu = _scatter_lookup(edges, du, key_col="u", payload_col="du",
                            out_cols=["u", "v"])
    withb = _scatter_lookup(withu, dv, key_col="v", payload_col="dv",
                            out_cols=["u", "v", "du"])

    def orient(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("u"), dtype=np.int64)
        v = np.asarray(b.column("v"), dtype=np.int64)
        du = np.asarray(b.column("du"), dtype=np.int64)
        dv = np.asarray(b.column("dv"), dtype=np.int64)
        # src = endpoint with smaller (deg, id); edges are u != v so
        # the tuple comparison is always strict one way
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table({"src": pa.array(np.where(u_first, u, v)),
                         "dst": pa.array(np.where(u_first, v, u))})

    return withb.map_batches(orient, batch_format="pyarrow")


_GVP_COUNTER_PREFIX = "dedup_restore_gvp_overflow"


def _gvp_counter_name(scope: str | None = None) -> str:
    """Per-JOB counter name: two jobs sharing a long-lived cluster must
    not share (or reset) each other's tally, and the readout path must
    be able to kill exactly its own actor.  The Ray job id is identical
    on the driver and in every worker task the driver spawned, so the
    emitting kernels and ``pair_overflow_stats`` agree on the name
    without any plumbing.  ``scope`` overrides for tests."""
    if scope is None:
        scope = ray.get_runtime_context().get_job_id()
    return f"{_GVP_COUNTER_PREFIX}_{scope}"


@ray.remote(num_cpus=0)
class _PairOverflowCounter:
    """Cluster-wide tally of hot groups capped by group_value_pairs.
    Fire-and-forget increments from the pair kernels (no barrier on
    the data path); read it AFTER consuming the pair Dataset."""

    def __init__(self):
        self.capped_groups = 0
        self.skipped_pairs = 0

    def add(self, groups: int, skipped: int) -> None:
        self.capped_groups += groups
        self.skipped_pairs += skipped

    def get(self) -> dict:
        return {"capped_groups": self.capped_groups,
                "skipped_pairs": self.skipped_pairs}

    def reset(self) -> None:
        self.capped_groups = 0
        self.skipped_pairs = 0


def _gvp_counter(scope: str | None = None):
    """Get-or-create the job-scoped overflow counter actor (race-safe).
    Detached: a refcounted named actor would be GC'd the moment the
    emitting worker task drops its handle, zeroing the tally before
    the driver can read it.  Detached actors outlive the job, so the
    name is job-scoped (no cross-job tally sharing) and the
    ``pair_overflow_stats(reset=True)`` readout KILLS the actor —
    nothing leaks past the job's final stats read."""
    return _PairOverflowCounter.options(
        name=_gvp_counter_name(scope), get_if_exists=True,
        lifetime="detached").remote()


def pair_overflow_stats(reset: bool = False,
                        scope: str | None = None) -> dict:
    """Read (and optionally reset) the group_value_pairs overflow
    counters.  Only meaningful after the pair Dataset was consumed.
    ``reset=True`` tears the detached actor down entirely (the next
    capped batch recreates it at zero) — the job's closing readout
    must not leak a detached actor into a shared cluster."""
    c = _gvp_counter(scope)
    import ray as _ray
    stats = _ray.get(c.get.remote())
    if reset:
        _ray.kill(c, no_restart=True)
    return stats


def reset_pair_overflow_stats() -> None:
    pair_overflow_stats(reset=True)


def group_value_pairs(ds: "ray.data.Dataset", key_col: str,
                      val_col: str, max_group: int = 1024,
                      num_salts: int = 16,
                      on_overflow: str = "cap") -> "ray.data.Dataset":
    """All within-group value pairs (a < b) per key group, WITHOUT a
    global distinct — a pair emitted by k distinct groups appears k
    times, which is exactly what co-occurrence counting and wedge
    joins need.  Same sort + per-block-triu + residual pattern as
    groups._batch_bucket_pairs, INCLUDING its hot-group skew guard:
    a group larger than ``max_group`` emits the salted star+chain
    edge set (O(n), connectivity-preserving — groups.group_pair_indices)
    instead of the full O(C(n, 2)) triu, and increments the shared
    ``_PairOverflowCounter`` (read via ``pair_overflow_stats()``).
    ``on_overflow="raise"`` turns the cap into a hard error for
    callers whose downstream counts must be exact."""
    if on_overflow not in ("cap", "raise"):
        raise ValueError(f"on_overflow must be 'cap' or 'raise', "
                         f"got {on_overflow!r}")
    interior, edge = sorted_split(ds, [key_col, val_col], [key_col])

    def emit(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        starts, ends = group_bounds(b, [key_col])
        sizes = ends - starts
        us, vs = [], []
        capped = skipped = 0
        for s in np.unique(sizes):
            s = int(s)
            if s < 2:
                continue
            class_starts = starts[sizes == s]
            if s <= max_group:
                iu, iv = np.triu_indices(s, k=1)
                us.append((class_starts[:, None] + iu[None, :]).reshape(-1))
                vs.append((class_starts[:, None] + iv[None, :]).reshape(-1))
            else:
                if on_overflow == "raise":
                    raise ValueError(
                        f"group_value_pairs: group of size {s} exceeds "
                        f"max_group={max_group} on key column "
                        f"{key_col!r} (on_overflow='raise')")
                # hot groups are rare — per-group salted star+chain
                for st in class_starts:
                    iu, iv = group_pair_indices(int(st), int(st) + s,
                                                max_group, num_salts)
                    us.append(iu)
                    vs.append(iv)
                    capped += 1
                    skipped += s * (s - 1) // 2 - len(iu)
        if capped:
            # synchronous on purpose: guarantees the tally landed
            # before the emitting batch completes (so a consumer can
            # read pair_overflow_stats right after materialize);
            # capped groups are rare, the actor call is tiny.  Retry
            # across the (tiny) window where a concurrent
            # reset-by-kill has freed the name but the dying handle
            # is still resolvable via get_if_exists.
            import time

            import ray as _ray
            for attempt in range(5):
                try:
                    _ray.get(_gvp_counter().add.remote(capped, skipped))
                    break
                except _ray.exceptions.RayActorError:
                    if attempt == 4:
                        raise
                    time.sleep(0.2)
        if not us:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        dst = b.column(val_col)
        # values ascend within each group -> a < b by construction
        return pa.table({"a": dst.take(pa.array(np.concatenate(us))),
                         "b": dst.take(pa.array(np.concatenate(vs)))})

    def residual(g: pa.Table) -> pa.Table:
        return emit(g.sort_by([(key_col, "ascending"),
                               (val_col, "ascending")]))

    return (interior.map_batches(emit, batch_format="pyarrow",
                                 batch_size=None)
            .union(edge.groupby(key_col).map_groups(residual,
                                                    batch_format="pyarrow")))


def _wedges(oriented: "ray.data.Dataset") -> "ray.data.Dataset":
    """All out-neighbor pairs (a < b) per source node — per-source
    fan-out bounded O(sqrt(m)) by the degree orientation."""
    return group_value_pairs(oriented, "src", "dst")


def _pair_sig(b: pa.Table, ucol: str, vcol: str, tag: int) -> pa.Table:
    """(ph, ph2, tag) rows — the engine's 128-bit pair-hash identity
    convention (groups.distinct_pairs): equality of (ph, ph2) IS pair
    identity."""
    n = b.num_rows
    if n == 0:
        return pa.table({"ph": pa.array([], pa.uint64()),
                         "ph2": pa.array([], pa.uint64()),
                         "tag": pa.array([], pa.int8())})
    with np.errstate(over="ignore"):
        hu = arrow_row_hashes(b.column(ucol))
        hv = arrow_row_hashes(b.column(vcol))
        ph = hu * np.uint64(0xBF58476D1CE4E5B9) + hv
        ph2 = mix64(hv * np.uint64(0x94D049BB133111EB) + hu)
    return pa.table({"ph": pa.array(ph, pa.uint64()),
                     "ph2": pa.array(ph2, pa.uint64()),
                     "tag": pa.array(np.full(n, tag, np.int8))})


def triangle_stats(edges: "ray.data.Dataset", u_col: str = "u",
                   v_col: str = "v") -> dict:
    """Exact global triangle census of a distinct undirected edge set:
    {n_nodes, n_edges, n_wedges, n_triangles} (all exact int64).
    n_wedges counts unordered length-2 paths = sum_v C(deg(v), 2),
    the denominator of the global clustering coefficient
    (3 * n_triangles / n_wedges)."""
    edges = edges.select_columns([u_col, v_col]).materialize()
    deg = degree_table(edges, u_col, v_col).materialize()

    def deg_moments(b: pa.Table) -> pa.Table:
        d = np.asarray(b.column("deg"), dtype=np.int64)
        return pa.table({"n": pa.array([len(d)]),
                         "w": pa.array([int((d * (d - 1) // 2).sum())])})

    m = deg.map_batches(deg_moments, batch_format="pyarrow").to_pandas()
    n_nodes, n_wedges = int(m["n"].sum()), int(m["w"].sum())
    n_edges = edges.count()

    oriented = _oriented_edges(edges, deg)
    wedges = _wedges(oriented)

    # membership: a wedge (a, b) closes a triangle iff canonical edge
    # (a, b) exists.  One tagged co-sort over (pair-hash, tag); per
    # block, groups holding an edge row contribute their wedge count.
    def canon(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column(u_col), dtype=np.int64)
        v = np.asarray(b.column(v_col), dtype=np.int64)
        return pa.table({"a": pa.array(np.minimum(u, v)),
                         "b": pa.array(np.maximum(u, v))})

    rows = (edges.map_batches(canon, batch_format="pyarrow")
            .map_batches(lambda b: _pair_sig(b, "a", "b", 0),
                         batch_format="pyarrow")
            .union(wedges.map_batches(lambda b: _pair_sig(b, "a", "b", 1),
                                      batch_format="pyarrow")))
    interior, edge_rows = sorted_split(flatten_blocks(rows),
                                       ["ph", "ph2", "tag"], ["ph", "ph2"])

    def tri_count(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"t": pa.array([], pa.int64())})
        starts, _ends = group_bounds(b, ["ph", "ph2"])
        tag = np.asarray(b.column("tag"), dtype=np.int64)
        has_edge = np.minimum.reduceat(tag, starts) == 0
        n_wedge_rows = np.add.reduceat(tag, starts)  # edges add 0
        return pa.table(
            {"t": pa.array([int(n_wedge_rows[has_edge].sum())])})

    def tri_residual(g: pa.Table) -> pa.Table:
        return tri_count(g.sort_by([("ph", "ascending"),
                                    ("ph2", "ascending"),
                                    ("tag", "ascending")]))

    parts = (interior.map_batches(tri_count, batch_format="pyarrow",
                                  batch_size=None)
             .union(edge_rows.groupby(["ph", "ph2"]).map_groups(
                 tri_residual, batch_format="pyarrow"))).to_pandas()
    n_triangles = int(parts["t"].sum()) if len(parts) else 0
    return {"n_nodes": n_nodes, "n_edges": n_edges,
            "n_wedges": n_wedges, "n_triangles": n_triangles}


def pagerank_fixed_point(directed: "ray.data.Dataset", iters: int = 4,
                         base: int = 150_000, damp_num: int = 850,
                         damp_den: int = 1_000,
                         init: int = 1_000_000,
                         broadcast_limit: int | None = None
                         ) -> "ray.data.Dataset":
    """Integer fixed-point PageRank over a DIRECTED edge Dataset
    (src, dst) — for an undirected graph pass both directions.

    r_0(v) = init; r_{k+1}(v) = base + damp_num * S_v // damp_den,
    S_v = sum over in-edges (u, v) of (r_k(u) // out_deg(u)).
    All int64; every node must have out_deg >= 1 (true for
    symmetrized undirected graphs — callers with dangling nodes must
    add self-loops or drop them).

    Auto scale gate (the engine's standard two-tier pattern): up to
    ``broadcast_limit`` nodes (cfg default 2M) the rank vector lives
    on the driver and each iteration is ONE task wave over the
    pre-indexed edge blocks (zero sorts in the loop — Ray sort fixed
    cost otherwise dominates small graphs); beyond the gate, the
    fully distributed formulation runs: per iteration one
    contribution scatter onto the edge stream + one grouped sum
    (destination degree carried on the edges) = two sorts, zero
    driver state.  Both paths are bit-identical, including the
    die-off semantics (a node whose in-flow sources have all dropped
    out stops contributing from the next iteration) and the handling
    of contract-violating edges into zero-out-degree nodes (dropped
    by the degree attach in both tiers).

    Returns (node, rank_fp) — micro-rank units; sum over nodes is
    conserved up to the integer-floor remainders, exactly as the
    unrolled SQL oracle computes it.
    """
    deg = grouped_aggregate(directed.select_columns(["src"]), ["src"],
                            {}, count_alias="deg").materialize()

    if broadcast_limit is None:
        from dedup_restore_ray.config import PipelineConfig
        broadcast_limit = PipelineConfig().broadcast_limit
    if deg.count() <= broadcast_limit:
        return _pagerank_broadcast(directed, deg, iters, base,
                                   damp_num, damp_den, init)

    # Attach the DESTINATION's degree to every edge ONCE: the grouped
    # sum can then carry it as a min-aggregate (constant per group), so
    # each iteration costs TWO sorts (contribution scatter + grouped
    # sum) instead of three (no per-iteration degree re-attach) — 8
    # extra bytes/edge buys a third of the iteration shuffles.
    ddeg = deg.map_batches(
        lambda b: pa.table({"dst": b.column("src"),
                            "ddeg": b.column("deg")}),
        batch_format="pyarrow")
    edges = _scatter_lookup(directed, ddeg, key_col="dst",
                            payload_col="ddeg",
                            out_cols=["src", "dst"]).materialize()

    # state: (node, deg, r)
    state = deg.map_batches(
        lambda b: pa.table({"node": b.column("src"),
                            "deg": b.column("deg"),
                            "r": pa.array(np.full(b.num_rows, init,
                                                  np.int64))}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        contrib = state.map_batches(
            lambda b: pa.table(
                {"src": b.column("node"),
                 "c": pa.array(np.asarray(b.column("r"), dtype=np.int64)
                               // np.asarray(b.column("deg"),
                                             dtype=np.int64))}),
            batch_format="pyarrow")
        flows = _scatter_lookup(edges, contrib, key_col="src",
                                payload_col="c", out_cols=["dst", "ddeg"])
        sums = grouped_aggregate(
            flows.map_batches(
                lambda b: pa.table({"node": b.column("dst"),
                                    "ddeg": b.column("ddeg"),
                                    "c": b.column("c")}),
                batch_format="pyarrow"),
            ["node"], {"s": ("c", "sum"), "deg": ("ddeg", "min")})
        state = flatten_blocks(sums.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"),
                 "deg": b.column("deg"),
                 "r": pa.array(base + damp_num * np.asarray(
                     b.column("s"), dtype=np.int64) // damp_den)}),
            batch_format="pyarrow"))

    return state.select_columns(["node", "r"])


@ray.remote
def _pr_part_task(state, *blocks):
    """One task wave member of the gated PageRank: per-edge-block
    partial in-flow sums over pre-indexed (si, di) edges.  ``state``
    is (c, alive): c[i] = r_i // deg_i for alive node i, alive is the
    die-off mask (see pagerank_fixed_point).  Returns (partial S,
    received-from-alive-src mask)."""
    c, alive = state
    n = len(c)
    s = np.zeros(n, np.int64)
    got = np.zeros(n, bool)
    for b in blocks:
        si = np.asarray(b.column("si"), dtype=np.int64)
        di = np.asarray(b.column("di"), dtype=np.int64)
        m = alive[si]
        if not m.all():
            si, di = si[m], di[m]
        got[di] = True
        # bincount sums in float64; exact here because every partial
        # sum is bounded by the conserved total rank mass
        # (~ n_nodes * init <= 2M * 1e6 = 2e12 << 2^53).
        s += np.bincount(di, weights=c[si].astype(np.float64),
                         minlength=n).astype(np.int64)
    return s, got


@ray.remote
def _pr_reduce_task(*parts):
    """Sum the per-task partials so the driver pulls ONE (S, got)
    pair per iteration instead of one per edge-block group."""
    s = parts[0][0].copy()
    got = parts[0][1].copy()
    for p in parts[1:]:
        s += p[0]
        got |= p[1]
    return s, got


def _pagerank_broadcast(directed: "ray.data.Dataset",
                        deg: "ray.data.Dataset", iters: int, base: int,
                        damp_num: int, damp_den: int,
                        init: int) -> "ray.data.Dataset":
    """Gated small-graph PageRank: driver-resident rank vector (the
    gate bounds it), edges pre-indexed ONCE into (si, di) positions
    against the sorted node vector, then each iteration is a single
    task wave over the materialized edge blocks + one remote reduce —
    no Dataset sort/shuffle in the loop.  Raw Ray tasks are justified
    here (iterative algorithm with a shared dense accumulator); the
    >gate tier keeps everything in Dataset ops."""
    dpdf = deg.to_pandas()
    if len(dpdf) == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "r": pa.array([], pa.int64())}))
    order = np.argsort(dpdf["src"].to_numpy())
    nodes = dpdf["src"].to_numpy()[order].astype(np.int64)
    degv = dpdf["deg"].to_numpy()[order].astype(np.int64)
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def index_edges(b: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        src = np.asarray(b.column("src"), dtype=np.int64)
        dst = np.asarray(b.column("dst"), dtype=np.int64)
        di = np.searchsorted(nd, dst)
        # an edge into a node with no out-edges (out_deg >= 1 contract
        # violation) is DROPPED — exactly what the distributed tier's
        # degree attach (_scatter_lookup keyed by dst) does, so both
        # tiers stay bit-identical even on contract-violating input
        ok = (np.minimum(di, len(nd) - 1) == di) & (nd[np.minimum(
            di, len(nd) - 1)] == dst)
        if not ok.all():
            src, di = src[ok], di[ok]
        si = np.minimum(np.searchsorted(nd, src), len(nd) - 1)
        if len(si) and (nd[si] != src).any():
            raise ValueError("pagerank: src missing from degree table")
        return pa.table({"si": pa.array(si), "di": pa.array(di)})

    indexed = directed.map_batches(index_edges,
                                   batch_format="pyarrow").materialize()
    block_refs = []
    for bundle in indexed.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    per_task = max(1, len(block_refs) // (2 * cpus))

    r = np.full(n, init, np.int64)
    alive = np.ones(n, bool)
    for _ in range(iters):
        state_ref = ray.put((np.where(alive, r // degv, 0), alive))
        futs = [_pr_part_task.remote(state_ref,
                                     *block_refs[g:g + per_task])
                for g in range(0, len(block_refs), per_task)]
        s, got = ray.get(_pr_reduce_task.remote(*futs)) if futs else (
            np.zeros(n, np.int64), np.zeros(n, bool))
        alive = got
        r = base + damp_num * s // damp_den

    return ray.data.from_arrow(pa.table(
        {"node": pa.array(nodes[alive]),
         "r": pa.array(r[alive])}))


def kcore_subgraph(edges: "ray.data.Dataset", k: int,
                   src_col: str = "src", dst_col: str = "dst",
                   max_rounds: int | None = None,
                   broadcast_limit: int = 2_000_000) -> tuple:
    """k-core of an undirected graph (iterative peeling — the
    fixpoint shape recursive SQL cannot express because each round
    REMOVES rows): repeatedly delete nodes whose degree has fallen
    below ``k`` until none remain.  ``edges`` must carry BOTH
    directions of every undirected edge (the symmetric layout the
    co-purchase builders emit), so out-degree on ``src_col`` IS the
    node degree.

    Fully distributed: each round is one grouped degree count plus two
    anti-joins (endpoint filtering) over the shrinking edge table — no
    driver-side adjacency, degree map, or deletion queue; only the
    per-round survivor count reaches the driver.  Every non-final
    round removes >= 1 node, so the loop terminates in <= n rounds
    unaided (a path graph legitimately needs ~n/2 peels);
    ``max_rounds`` is an OPT-IN runaway guard — None (default) peels
    to the fixpoint, an explicit bound raises when exceeded.

    Returns ``(core_edges, core_degrees, n_rounds)``: the surviving
    symmetric edge Dataset, a (node, deg) Dataset over the survivors
    (every deg >= k by construction), and the rounds used."""
    from dedup_restore_ray.stages.joins import anti_join

    alive = edges.materialize()
    rounds = 0
    while True:
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError(f"k-core did not reach a fixpoint in "
                               f"{max_rounds} rounds")
        deg = grouped_aggregate(alive.select_columns([src_col]),
                                [src_col], {}, count_alias="deg"
                                ).materialize()

        def low_rows(b: pa.Table) -> pa.Table:
            t = b.filter(pc.less(b.column("deg"), pa.scalar(k)))
            return pa.table({src_col: t.column(src_col)})

        low = deg.map_batches(low_rows,
                              batch_format="pyarrow").materialize()
        n_low = low.count()
        if n_low == 0:
            return (alive, deg.rename_columns({src_col: "node"}),
                    rounds)
        if n_low <= broadcast_limit:
            # the usual case after round 1: the peel set is tiny —
            # broadcast it sorted and drop both endpoints in ONE
            # vectorized pass (vs two anti-join sorts per round, the
            # fixed cost that dominates deep peels on chain graphs)
            low_ids = np.sort(np.asarray(
                low.to_pandas()[src_col], dtype=np.int64))
            low_ref = ray.put(low_ids)

            def drop_endpoints(b: pa.Table) -> pa.Table:
                ids = ray.get(low_ref)
                s = np.asarray(b.column(src_col), dtype=np.int64)
                d = np.asarray(b.column(dst_col), dtype=np.int64)
                keep = ~(_member(s, ids) | _member(d, ids))
                return b.filter(pa.array(keep))

            alive = alive.map_batches(
                drop_endpoints, batch_format="pyarrow").materialize()
        else:
            pruned = anti_join(alive, low, src_col)
            pruned = anti_join(
                pruned.rename_columns({src_col: "__s",
                                       dst_col: src_col}),
                low, src_col).rename_columns({src_col: dst_col,
                                              "__s": src_col})
            alive = flatten_blocks(pruned).materialize()
        if alive.count() == 0:
            return (alive,
                    ray.data.from_arrow(pa.table(
                        {"node": pa.array([], pa.int64()),
                         "deg": pa.array([], pa.int64())})),
                    rounds)


def bfs_levels(edges: "ray.data.Dataset", seeds: "ray.data.Dataset",
               max_level: int, src_col: str = "src",
               dst_col: str = "dst", node_col: str = "node",
               broadcast_limit: int = 2_000_000) -> "ray.data.Dataset":
    """Multi-source BFS minimum-hop levels over a SYMMETRIC edge
    Dataset: every node reachable from ``seeds`` in <= max_level hops
    reports its min hop count (seeds report 0).

    Two tiers, same results (the engine's standard scale-gate
    discipline): when the edge table fits ``broadcast_limit``, each
    round is ONE shuffle-free map over the materialized edges with
    the sorted frontier/visited id arrays broadcast via ray.put —
    per-round cost is a scan, not 3-4 sort barriers; above the gate
    it falls back to the fully distributed semi-join + distinct +
    anti-join frontier expansion (no driver node state)."""
    from dedup_restore_ray.stages.joins import anti_join, semi_join
    from dedup_restore_ray.stages.groups import (distinct_rows,
                                                 flatten_blocks)

    edges = edges.materialize()
    seeds = seeds.materialize()
    sch = edges.schema()
    int_ids = (sch is not None and src_col in sch.names
               and pa.types.is_integer(
                   sch.types[sch.names.index(src_col)]))
    if (int_ids and edges.count() <= broadcast_limit
            and seeds.count() <= broadcast_limit):
        sp = seeds.to_pandas()
        seed_ids = (np.unique(np.asarray(sp[node_col], dtype=np.int64))
                    if node_col in sp.columns
                    else np.empty(0, np.int64))
        level_sets = [seed_ids]
        visited = seed_ids
        fr = seed_ids
        for _ in range(max_level):
            if len(fr) == 0:
                break
            fr_ref = ray.put(np.sort(fr))
            vis_ref = ray.put(visited)   # kept sorted below

            def step(b: pa.Table) -> pa.Table:
                s = np.asarray(b.column(src_col), dtype=np.int64)
                d = np.asarray(b.column(dst_col), dtype=np.int64)
                f = ray.get(fr_ref)
                v = ray.get(vis_ref)
                cand = d[_member(s, f)]
                cand = cand[~_member(cand, v)]
                return pa.table({"node": pa.array(np.unique(cand))})

            parts = edges.map_batches(step,
                                      batch_format="pyarrow").to_pandas()
            nxt = (np.unique(np.asarray(parts["node"], dtype=np.int64))
                   if "node" in parts.columns and len(parts)
                   else np.empty(0, np.int64))
            nxt = nxt[~_member(nxt, visited)]
            level_sets.append(nxt)
            visited = np.sort(np.concatenate([visited, nxt]))
            fr = nxt
        nodes = np.concatenate(level_sets) if level_sets \
            else np.empty(0, np.int64)
        lvls = np.concatenate(
            [np.full(len(ls), i, np.int64)
             for i, ls in enumerate(level_sets)]) if level_sets \
            else np.empty(0, np.int64)
        return ray.data.from_arrow(pa.table(
            {"node": pa.array(nodes), "level": pa.array(lvls)}))

    # distributed tier: per-level semi-join frontier expansion
    frontier = distinct_rows(seeds.select_columns([node_col]),
                             [node_col]).materialize()
    levels = [frontier.map_batches(
        lambda b: b.append_column("level", pa.array(
            np.zeros(b.num_rows, np.int64))), batch_format="pyarrow")]
    visited = frontier
    for lvl in range(1, max_level + 1):
        hits = semi_join(edges.rename_columns({src_col: node_col,
                                               dst_col: "__d"}),
                         frontier, node_col)
        nxt = distinct_rows(
            hits.select_columns(["__d"]).rename_columns(
                {"__d": node_col}), [node_col])
        frontier = flatten_blocks(
            anti_join(nxt, visited, node_col)).materialize()
        if frontier.count() == 0:
            break
        lv = np.int64(lvl)
        levels.append(frontier.map_batches(
            lambda b, lv=lv: b.append_column("level", pa.array(
                np.full(b.num_rows, lv))), batch_format="pyarrow"))
        visited = flatten_blocks(visited.union(frontier)).materialize()
    out = levels[0]
    for extra in levels[1:]:
        out = out.union(extra)
    return out


def _member(vals: np.ndarray, sorted_ids: np.ndarray) -> np.ndarray:
    """Vectorized membership of int64 vals in a sorted id array."""
    if len(sorted_ids) == 0:
        return np.zeros(len(vals), bool)
    pos = np.searchsorted(sorted_ids, vals)
    pos[pos == len(sorted_ids)] = len(sorted_ids) - 1
    return sorted_ids[pos] == vals
