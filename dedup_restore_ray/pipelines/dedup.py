"""Flagship pipeline: near-duplicate detection + clustering
(SURVEY §7.0).

    read_parquet(pages)                                    # stream
    → map_batches(ExtractText)       actor pool            # html→text
    → map_batches(SignatureStage)    actor pool            # hash+minhash+simhash+fingerprints
    → exact dedup                    groupby(content_hash) # first-wins
    → candidate pairs                LSH groupby + salted skew split
      ∪ substring pairs              winnowed-fingerprint groupby
    → verify                         exact Jaccard
    → cluster                        union-find / min-label rounds
    → assignments                    (doc_id, cluster_id, …) + manifests

Exact duplicates are collapsed *before* LSH (SURVEY §7.4: 'route
through exact-hash dedup first so LSH never sees exact dups') — the
near-dup stages run over canonical representatives only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.stages.cluster import (attach_cluster_ids,
                                              cluster_label_propagation,
                                              cluster_union_find,
                                              edges_to_driver)
from dedup_restore_ray.stages.pairs import candidate_pairs
from dedup_restore_ray.stages.signatures import SignatureStage
from dedup_restore_ray.stages.verify import verify_pairs

_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")


class ExtractText:
    """html (binary) -> text when the text column is null.

    Deterministic, versioned extraction (the per-url byte-identity
    invariant of BASELINE.json input_hint depends on it): strip tags,
    collapse whitespace.  Stateful stage: regexes compiled once per
    actor."""

    VERSION = "extract-v1"

    def __init__(self, html_col: str = "html", text_col: str = "text"):
        self.html_col = html_col
        self.text_col = text_col

    def extract_one(self, html_bytes: bytes | None) -> str:
        if not html_bytes:
            return ""
        no_tags = _TAG_RE.sub(b" ", html_bytes)
        return _WS_RE.sub(" ", no_tags.decode("utf-8", "replace")).strip()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tcol = batch.column(self.text_col)
        if tcol.null_count == 0:
            # common case: nothing to extract — no Python per row
            if pa.types.is_string(tcol.type):
                return batch
            out = batch.drop_columns([self.text_col])
            return out.append_column(self.text_col,
                                     tcol.cast(pa.string()))
        # only the NULL rows take the per-doc Python extractor; the
        # non-null majority stays in its Arrow buffer and is stitched
        # back with one take (a batch with a few html-only rows must
        # not round-trip the whole text column through the Python heap)
        import numpy as np
        import pyarrow.compute as pc
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        vm = np.asarray(pc.is_valid(tcol))
        null_rows = np.flatnonzero(~vm)
        htmls = batch.column(self.html_col).take(pa.array(null_rows))
        extracted = pa.array([self.extract_one(h)
                              for h in htmls.to_pylist()], pa.string())
        keep = tcol.filter(pa.array(vm, pa.bool_())).cast(pa.string())
        if isinstance(keep, pa.ChunkedArray):
            keep = keep.combine_chunks()
        n_valid = len(keep)
        perm = np.empty(len(tcol), dtype=np.int64)
        perm[vm] = np.arange(n_valid, dtype=np.int64)
        perm[null_rows] = n_valid + np.arange(len(null_rows),
                                              dtype=np.int64)
        stitched = pa.concat_arrays([keep, extracted]).take(pa.array(perm))
        out = batch.drop_columns([self.text_col])
        return out.append_column(self.text_col, stitched)


@dataclass
class DedupResult:
    assignments: "ray.data.Dataset"   # doc_id, canonical_id, is_dup, cluster_id
    signatures: "ray.data.Dataset"    # per-canonical signature table
    verified_pairs: "ray.data.Dataset"
    metrics: dict = field(default_factory=dict)


def dedup_pipeline(docs: "ray.data.Dataset",
                   cfg: PipelineConfig | None = None,
                   id_col: str = "doc_id", text_col: str = "text",
                   html_col: str | None = None,
                   use_simhash: bool = True,
                   use_substring: bool = True,
                   verify_strategy: str = "broadcast",
                   cluster_strategy: str = "auto",
                   num_blocks: int | None = None) -> DedupResult:
    """Run the flagship near-dup pipeline over a docs Dataset.

    num_blocks: input repartition width.  A single Parquet file reads
    as one block, serializing every stage; default 2 blocks per CPU so
    the signature stage saturates the pool.  (At production scale the
    read produces many blocks naturally and this is a no-op.)
    """
    import time as _time
    cfg = cfg or PipelineConfig()
    metrics: dict = {"config_hash": cfg.config_hash()}
    stage_t: dict = {}
    metrics["stage_sec"] = stage_t
    _t0 = _time.time()

    def _lap(name: str):
        nonlocal _t0
        now = _time.time()
        stage_t[name] = round(now - _t0, 2)
        _t0 = now

    if num_blocks is None:
        try:
            num_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_blocks = 16
    # scale gate: broadcast formulations (packed id-hash filters,
    # driver union-find, in-memory shingle pack) hold per-doc state on
    # one machine; beyond cfg.broadcast_limit docs the pipeline
    # auto-switches to the all-shuffle formulations (exact_dedup_mark,
    # sort-scatter verify, distributed label propagation).
    # (count BEFORE adding any map so a bare parquet read keeps its
    # metadata-only count fast path)
    n_docs_in = docs.count()
    if n_docs_in == 0:
        # EMPTY input early-exit: the broadcast canonical-pack collect
        # and the pair chain both trip on schema-less empty Datasets
        # (CLAUDE.md empty-Dataset traps); callers like prep_corpus
        # legitimately reach here when upstream filters drop every doc
        sch = docs.schema()
        idt = pa.string()
        if sch is not None and id_col in sch.names:
            idt = sch.types[sch.names.index(id_col)]
        e_assign = pa.table({"doc_id": pa.array([], idt),
                             "canonical_id": pa.array([], idt),
                             "is_dup": pa.array([], pa.bool_()),
                             "cluster_id": pa.array([], idt)})
        e_pairs = pa.table({"u": pa.array([], idt),
                            "v": pa.array([], idt),
                            "jaccard": pa.array([], pa.float64())})
        metrics.update(scale_mode=False, candidate_pairs=0,
                       verified_pairs=0, cluster_edges=0,
                       cluster_strategy="union_find", total=0, dup=0,
                       unique=0, dedup_ratio=float("nan"))
        return DedupResult(
            assignments=ray.data.from_arrow(e_assign),
            signatures=ray.data.from_arrow(
                pa.table({"doc_id": pa.array([], idt)})),
            verified_pairs=ray.data.from_arrow(e_pairs),
            metrics=metrics)
    # schemas carrying (pandas) metadata are unhashable in pyarrow 16,
    # which defeats Ray's schema-dedup fast path in every downstream
    # sort/union; strip at the boundary (zero-copy) so inputs from a
    # plain rd.read_parquet behave like sources/io.read_parquet_clean
    docs = docs.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
    scale_mode = n_docs_in > cfg.broadcast_limit
    metrics["scale_mode"] = scale_mode
    if scale_mode and verify_strategy == "broadcast":
        verify_strategy = "scatter"
    if num_blocks > 0:        # num_blocks=0: trust the read's splitting
        docs = docs.repartition(num_blocks)

    if html_col is not None:
        docs = docs.map_batches(
            ExtractText(html_col=html_col, text_col=text_col),
            batch_format="pyarrow", batch_size=cfg.batch_size)

    sig_kwargs = dict(batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.signature_concurrency:
        sig_kwargs["concurrency"] = cfg.signature_concurrency
    # stage checkpoint (SURVEY §4): the signature table feeds several
    # consumers (exact dedup, LSH, verify) and must not recompute per
    # consumer.  At 100 TB this boundary is a partitioned-Parquet
    # checkpoint (state/manifest.py); in-object-store materialization
    # is the single-job form, spilling as needed.
    signatures = docs.map_batches(
        SignatureStage(cfg, id_col=id_col, text_col=text_col,
                       emit_minhash=False, emit_bucket_keys=True,
                       bucket_simhash=use_simhash,
                       bucket_fingerprints=use_substring,
                       bucket_norm=True),
        **sig_kwargs).materialize()
    _lap("signatures")

    # ---- exact dedup (first-wins by min doc_id) ------------------------
    # Sort ONLY the 28-byte (content_hash, doc_id) projection — the
    # heavy signature payload (shingles, minhash, fingerprints) never
    # moves.  Canonical representatives are then selected with a
    # broadcast membership filter (packed uint64 id-hash array,
    # zero-copy from the object store).  When the canonical set
    # outgrows one machine (~10^9+), exact_dedup_mark provides the
    # full-shuffle formulation instead.
    from dedup_restore_ray.stages.groups import mark_canonical
    if scale_mode:
        # all-shuffle form: the full signature payload rides the
        # content-hash sort once; canonical set = filtered marked rows
        from dedup_restore_ray.stages.exact import exact_dedup_mark
        marked = exact_dedup_mark(signatures).materialize()
        assignments = marked.select_columns(
            ["doc_id", "canonical_id", "is_dup"])
        _lap("exact_mark")

        def only_canonical_marked(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(batch.column("is_dup").combine_chunks()))

        canon_sigs = marked.map_batches(only_canonical_marked,
                                        batch_format="pyarrow")
        _lap("canonical_filter")
    else:
        assignments = mark_canonical(
            signatures.select_columns(["content_hash", "doc_id"]),
            "content_hash").select_columns(
            ["doc_id", "canonical_id", "is_dup"]).materialize()
        _lap("exact_mark")

        from dedup_restore_ray.stages.verify import _id_hashes

        # the canonical-membership pack: filter+hash run DISTRIBUTED
        # over the assignment blocks (they were a measured ~0.9 s
        # serial driver loop at 1M docs — an equal-absolute-cost
        # serial term on both scaling legs); the driver only concats
        # and sorts the 8 B/canonical hash column
        def canon_hash_rows(b: pa.Table) -> pa.Table:
            keep = pc.invert(b.column("is_dup").combine_chunks())
            ih = _id_hashes(b.filter(keep).column("doc_id"))
            return pa.table({"h": pa.array(ih, pa.uint64())})

        hcol = (assignments.map_batches(canon_hash_rows,
                                        batch_format="pyarrow")
                .to_pandas()["h"].to_numpy())
        canon_hashes = np.sort(hcol) if len(hcol) \
            else np.empty(0, np.uint64)
        canon_ref = ray.put(canon_hashes)
        # the reference's final counter report falls out of driver
        # state already in hand — no stats pass over the assignments
        # is ever needed (fused-counter discipline, CLAUDE.md):
        # unique == |canonical set|, dup == total - unique
        metrics["total"] = n_docs_in
        metrics["unique"] = int(len(canon_hashes))
        metrics["dup"] = n_docs_in - metrics["unique"]
        metrics["dedup_ratio"] = (n_docs_in / metrics["unique"]
                                  if metrics["unique"] else float("nan"))

        def only_canonical(batch: pa.Table) -> pa.Table:
            ch = ray.get(canon_ref)
            ih = _id_hashes(batch.column("doc_id"))
            pos = np.searchsorted(ch, ih)
            pos[pos == len(ch)] = max(len(ch) - 1, 0)
            mask = (ch[pos] == ih) if len(ch) else np.zeros(len(ih), bool)
            return batch.filter(pa.array(mask))

        canon_sigs = signatures.map_batches(only_canonical,
                                            batch_format="pyarrow")
        _lap("canonical_filter")

    # ---- candidate generation (LSH [+ simhash] ∪ substring) ------------
    # all candidate sources (LSH bands, simhash bands, substring
    # fingerprints, norm-hash rail) ride ONE bucket-row stream -> one
    # sort + pair + distinct chain
    # hashed ids end-to-end: the bucket sort, pair kernels, distinct
    # and packed verify all move 16-byte uint64 rows; original ids are
    # resolved only for the (small) verified subset below
    cands = candidate_pairs(canon_sigs, cfg, use_simhash=use_simhash,
                            use_fingerprints=use_substring, use_norm=True,
                            ids="hashed")

    # For the broadcast verify, the shingle pack over all canonicals is
    # independent of the pair set — build it with Ray tasks over the
    # MATERIALIZED signature blocks (hash-range-sharded two-phase
    # sort/merge) WHILE the candidate sort executes; the verify workers
    # block in ray.get only until the shards land.  The round-2
    # driver-thread build was an ~11 s SERIAL tail at 1M docs / 4 CPUs
    # — the binding Amdahl floor of the candidate+verify stage.
    pack = None
    idtab_ref = None
    if verify_strategy == "broadcast":
        from dedup_restore_ray.stages.verify import (
            build_shingle_pack_sharded)
        _tp = _time.time()
        pack, idtab_ref = build_shingle_pack_sharded(
            signatures, member_ref=canon_ref, return_ids=True)
        stage_t["pack_submit"] = round(_time.time() - _tp, 2)

    # ---- verification --------------------------------------------------
    if pack is not None:
        # FUSED candidate counter (round-2 verdict #7): the candidate
        # sort chain streams straight into the packed verify in ONE
        # execution; the verify emits ALL candidates with their jaccard
        # so the materialized metadata count IS candidate_pairs, and
        # the verified subset is one cheap filter over the (small)
        # pair table — two barriers replaced by one.
        from dedup_restore_ray.stages.pairs import resolve_pair_ids
        from dedup_restore_ray.stages.verify import _VerifyPacked
        # let the pack shards FINISH before the candidate execution
        # starts: eager verify tasks used to grab worker slots and
        # dead-wait in ray.get on unfinished shards — measured 6.0
        # CPU-s of verify remote-wall at 4 CPUs vs 1.7 at 1 CPU for
        # the same rows (1M docs).  The shard build is distributed
        # (~1s at 1M/4 CPUs) and total work is conserved on a single
        # slot, so the explicit barrier costs the 1-CPU leg nothing
        # and removes the high-leg stall.
        if hasattr(pack, "shard_refs"):
            ray.wait(pack.shard_refs,
                     num_returns=len(pack.shard_refs))
        checked = cands.map_batches(
            _VerifyPacked(pack, cfg.jaccard_threshold,
                          emit_all=True, hashed_ids=True),
            batch_format="pyarrow").materialize()
        metrics["candidate_pairs"] = checked.count()
        _lap("candidate_pairs_and_verify")
        thr = cfg.jaccard_threshold

        def passed(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(b.column("jaccard"),
                                             pa.scalar(thr)))

        # resolve original ids for the verified subset only — the raw
        # candidate stream stays uint64 end-to-end; the resolution
        # table was built by the same task fan-out as the verify pack
        verified = resolve_pair_ids(
            checked.map_batches(passed, batch_format="pyarrow"),
            canon_sigs, cfg, id_col="doc_id", extra_cols=("jaccard",),
            table_ref=idtab_ref).materialize()
    else:
        from dedup_restore_ray.stages.pairs import resolve_pair_ids
        cands = cands.materialize()
        metrics["candidate_pairs"] = cands.count()
        _lap("candidate_pairs")
        if verify_strategy == "scatter":
            # verify on the hashed pairs (numeric rendezvous keys);
            # resolve raw ids over the verified subset only, via the
            # member-filtered broadcast (one shuffle-free corpus pass)
            from dedup_restore_ray.stages.pairs import (
                resolve_pair_ids_member)
            verified_h = verify_pairs(cands, canon_sigs, cfg,
                                      strategy="scatter",
                                      hashed_ids=True)
            verified = resolve_pair_ids_member(
                verified_h, canon_sigs, cfg, id_col="doc_id",
                extra_cols=("jaccard",)).materialize()
        else:
            cands = resolve_pair_ids(cands, canon_sigs, cfg,
                                     n_ids_hint=n_docs_in).materialize()
            verified = verify_pairs(cands, canon_sigs, cfg,
                                    strategy=verify_strategy).materialize()
    metrics["verified_pairs"] = verified.count()
    _lap("verify")

    # ---- clustering ----------------------------------------------------
    # (norm-hash pairs arrive through the bucket stream and verify at
    # Jaccard exactly 1 — incl. the zero-shingle group, since
    # jaccard(∅, ∅) = 1 — so no separate edge rail is needed.)
    # verified is already materialized and every verified pair IS an
    # edge — re-materializing the (u, v) projection was a pure extra
    # barrier (round-2 verdict #7)
    near_edges = verified.select_columns(["u", "v"])
    n_edges = metrics["verified_pairs"]
    metrics["cluster_edges"] = n_edges
    if cluster_strategy == "auto":
        cluster_strategy = ("union_find"
                            if n_edges <= cfg.broadcast_limit
                            else "distributed")
    if cluster_strategy == "union_find":
        # vectorized driver tier: dictionary-encoded endpoints +
        # min-label propagation with pointer doubling — the dict
        # union-find's Python edge walk was a fixed 7-8s serial term
        # on both scaling legs at 8M docs (cluster_union_find remains
        # the parity reference)
        from dedup_restore_ray.stages.cluster import \
            cluster_union_find_arrays
        labels = cluster_union_find_arrays(near_edges)
        final = attach_cluster_ids(assignments, labels)
    elif cluster_strategy == "label_prop":
        labels = cluster_label_propagation(near_edges, cfg)
        final = attach_cluster_ids(assignments, labels)
    else:  # fully distributed: no driver-side label state
        from dedup_restore_ray.stages.cluster import (
            attach_cluster_ids_distributed,
            cluster_label_propagation_distributed)
        labels_ds = cluster_label_propagation_distributed(near_edges, cfg)
        final = attach_cluster_ids_distributed(assignments, labels_ds)
    metrics["cluster_strategy"] = cluster_strategy
    _lap("cluster")
    return DedupResult(assignments=final, signatures=signatures,
                       verified_pairs=verified, metrics=metrics)


def assign_streams(ds: "ray.data.Dataset", policy: str = "hash",
                   num_streams: int = 16, id_col: str = "doc_id"
                   ) -> "ray.data.Dataset":
    """Multi-stream placement (reference D6 ``set_stream_id``,
    src/container.c:249-263, modes include/config.h:136-140): append a
    ``stream_id`` column choosing which output stream/partition each
    row lands in.

      hash    id-hash modulo (the round-1 default — co-locates reruns
              of the same id deterministically);
      near    everything to stream 0 (the reference's NEAR returns 0 —
              maximal locality, single-stream);
      random  uniform pseudo-random — DETERMINISTIC here (salted
              id-hash), unlike the reference's srand(time), because
              resume-skip needs stable partition membership;
      cycle   round-robin by position within each block (the
              reference's incrementing counter, per-writer).
    """
    from dedup_restore_ray.functions.hashing import mix64
    from dedup_restore_ray.stages.verify import _id_hashes

    def stamp(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if policy == "near":
            sid = np.zeros(n, dtype=np.int64)
        elif policy == "cycle":
            sid = np.arange(n, dtype=np.int64) % num_streams
        elif policy == "random":
            sid = (mix64(_id_hashes(batch.column(id_col))
                         ^ np.uint64(0x5EED))
                   % np.uint64(num_streams)).astype(np.int64)
        elif policy == "hash":
            sid = (_id_hashes(batch.column(id_col))
                   % np.uint64(num_streams)).astype(np.int64)
        else:
            raise ValueError(f"unknown placement policy {policy!r}")
        return batch.append_column("stream_id", pa.array(sid))

    return ds.map_batches(stamp, batch_format="pyarrow")


def write_assignments(result: DedupResult, out_dir: str,
                      cfg: PipelineConfig | None = None,
                      num_partitions: int = 16,
                      placement: str = "hash") -> dict:
    """Resumable partitioned output: assignments hashed into
    ``num_partitions`` directories, each written atomically with a
    lineage manifest (config hash, row count, per-partition metrics).
    A rerun skips partitions whose manifest is complete — the
    'resume from last completed checkpoint' contract (north_rule;
    reference analogue: append-only recipes, SURVEY §4).

    placement: stream policy (see ``assign_streams``).  hash / random /
    near give id-stable membership (resume-safe); cycle balances
    perfectly but is stable only for identical input block layouts."""
    from dedup_restore_ray.state.manifest import (completed_partitions,
                                                  write_partition)
    cfg = cfg or PipelineConfig()
    chash = cfg.config_hash()
    done = completed_partitions(out_dir)

    def rename_part(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("stream_id")
        return batch.set_column(idx, "part", batch.column("stream_id"))

    def write_group(g: pa.Table) -> pa.Table:
        # one writer per deterministic hash partition (same membership
        # on every rerun -> resume-skip is sound)
        p = g.column("part")[0].as_py()
        written = 0
        if str(p) not in done:
            sub = g.drop_columns(["part"])
            write_partition(out_dir, str(p), sub, chash,
                            metrics={"dup": int(pa.compute.sum(
                                pa.compute.cast(sub.column("is_dup"),
                                                pa.int64())).as_py() or 0)})
            written = g.num_rows
        return pa.table({"written": pa.array([written], pa.int64())})

    parts = assign_streams(result.assignments, policy=placement,
                           num_streams=num_partitions).map_batches(
        rename_part, batch_format="pyarrow")
    total = sum(r["written"] for r in
                parts.groupby("part").map_groups(
                    write_group, batch_format="pyarrow").take_all())
    from dedup_restore_ray.state.manifest import aggregate_metrics
    return aggregate_metrics(out_dir) | {"written_rows": total}


def dedup_stats(assignments: "ray.data.Dataset") -> dict:
    """The reference's final counter report (src/optsmr.c:316-332):
    dup/unique counts + dedup ratio."""
    def partial(b: pa.Table) -> pa.Table:
        d = pc.sum(pc.cast(b.column("is_dup"), pa.int64())).as_py() or 0
        return pa.table({"dup": pa.array([d], pa.int64()),
                         "n": pa.array([len(b)], pa.int64())})

    parts = assignments.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(r["n"] for r in parts)
    dups = sum(r["dup"] for r in parts)
    unique = total - dups
    return {
        "total": total,
        "dup": dups,
        "unique": unique,
        "dedup_ratio": (total / unique) if unique else float("nan"),
    }
