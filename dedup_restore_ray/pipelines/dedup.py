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

import html.parser
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
from dedup_restore_ray.stages.exact import exact_dedup_mark, keyed_dup_edges
from dedup_restore_ray.stages.pairs import candidate_pairs
from dedup_restore_ray.stages.signatures import SignatureStage
from dedup_restore_ray.stages.substring import fingerprint_pairs
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
        texts = batch.column(self.text_col).to_pylist()
        if any(t is None for t in texts):
            htmls = batch.column(self.html_col).to_pylist()
            texts = [t if t is not None else self.extract_one(h)
                     for t, h in zip(texts, htmls)]
        out = batch.drop_columns([self.text_col])
        return out.append_column(self.text_col, pa.array(texts, pa.string()))


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
    cfg = cfg or PipelineConfig()
    metrics: dict = {"config_hash": cfg.config_hash()}

    if num_blocks is None:
        try:
            num_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_blocks = 16
    docs = docs.repartition(num_blocks)

    if html_col is not None:
        docs = docs.map_batches(
            ExtractText(html_col=html_col, text_col=text_col),
            batch_format="pyarrow", batch_size=cfg.batch_size)

    sig_kwargs = dict(batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.signature_concurrency:
        sig_kwargs["concurrency"] = cfg.signature_concurrency
    signatures = docs.map_batches(
        SignatureStage(cfg, id_col=id_col, text_col=text_col), **sig_kwargs)

    # ---- exact dedup (first-wins by min doc_id) ------------------------
    # ONE shuffle produces both the assignment table and the canonical
    # set.  The materialize() is the stage checkpoint (SURVEY §4): the
    # marked table feeds three consumers (assignments, LSH, verify) and
    # must not re-execute the signature stage per consumer.  At 100 TB
    # this boundary is a partitioned-Parquet checkpoint instead
    # (state/manifest.py); in-object-store materialization is the
    # single-job form, spilling as needed.
    marked = exact_dedup_mark(signatures).materialize()
    assignments = marked.select_columns(["doc_id", "canonical_id", "is_dup"])

    def only_canonical(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(batch.column("is_dup").combine_chunks()))

    canon_sigs = marked.map_batches(only_canonical, batch_format="pyarrow")

    # ---- candidate generation (LSH [+ simhash] ∪ substring) ------------
    cands = candidate_pairs(canon_sigs, cfg, use_simhash=use_simhash)
    if use_substring:
        from dedup_restore_ray.stages.groups import distinct_rows
        cands = distinct_rows(
            cands.union(fingerprint_pairs(canon_sigs, cfg)), ["u", "v"])
    # verify consumes the pair set twice (member gather + check):
    # materialize so candidate generation doesn't re-execute
    cands = cands.materialize()
    metrics["candidate_pairs"] = cands.count()

    # ---- verification --------------------------------------------------
    verified = verify_pairs(cands, canon_sigs, cfg,
                            strategy=verify_strategy).materialize()
    metrics["verified_pairs"] = verified.count()

    # ---- clustering ----------------------------------------------------
    # norm-hash rail: identical normalized token streams => Jaccard 1,
    # merged without verification (covers whitespace/case variants and
    # the degenerate zero-shingle group LSH sentinels keep apart).
    norm_edges = keyed_dup_edges(canon_sigs, "norm_hash")
    near_edges = (verified.select_columns(["u", "v"])
                  .union(norm_edges).materialize())
    n_edges = near_edges.count()
    metrics["cluster_edges"] = n_edges
    if cluster_strategy == "auto":
        cluster_strategy = ("union_find"
                            if n_edges <= cfg.broadcast_limit else "label_prop")
    if cluster_strategy == "union_find":
        labels = cluster_union_find(edges_to_driver(near_edges))
    else:
        labels = cluster_label_propagation(near_edges, cfg)
    metrics["cluster_strategy"] = cluster_strategy

    final = attach_cluster_ids(assignments, labels)
    return DedupResult(assignments=final, signatures=marked,
                       verified_pairs=verified, metrics=metrics)


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
