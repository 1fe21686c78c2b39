"""Signature stage: text -> content hash + MinHash-128 + SimHash-64
+ shingle set + token stats, per Arrow batch.

This is the fused map of SURVEY §7.0 step 2 (reference heritage:
chunker src/chunk.c + SHA-1 fingerprint src/dedup.c:80-88, fused like
``newly_dedup`` src/dedup.c:253-262).  Deployed as an actor pool via
``map_batches(SignatureStage, batch_format="pyarrow", concurrency=N)``
— the permutation table, word-hash cache and compiled regexes are built
once per actor in ``__init__`` (the reference's 'index loaded once'
pattern, SURVEY §2.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.fingerprint import batch_winnowed_fingerprints_csr
from dedup_restore_ray.functions.hashing import content_hashes_arrow
from dedup_restore_ray.functions.minhash import make_permutations, minhash_signatures
from dedup_restore_ray.functions.shingle import ShingleEncoder, normalize_text, token_counts
from dedup_restore_ray.functions.simhash import simhash_signatures


class SignatureStage:
    """Batch fn: (doc_id, text) -> signatures table.

    Output columns:
      doc_id         passthrough (string or int64)
      content_hash   binary(20) SHA-1 of raw text bytes (exact-dup key)
      norm_hash      binary(20) SHA-1 of normalized text (the per-url
                     byte-identity invariant of BASELINE.json input_hint)
      n_tokens       int64
      n_shingles     int64
      shingles       list<uint64>  sorted-unique 5-gram shingle hashes
      minhash        list<uint64>  128 slots
      simhash        uint64
      fingerprints   list<uint64>  winnowed substring fingerprints
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 keep_cols: tuple = (),
                 emit_minhash: bool = True,
                 emit_bucket_keys: bool = False,
                 emit_lgrams: bool = False,
                 emit_fingerprints: bool | None = None,
                 bucket_simhash: bool = True,
                 bucket_fingerprints: bool = True,
                 bucket_norm: bool = True):
        self.cfg = cfg or PipelineConfig()
        self.id_col = id_col
        self.text_col = text_col
        self.keep_cols = keep_cols
        self.emit_minhash = emit_minhash
        self.emit_bucket_keys = emit_bucket_keys
        self.emit_lgrams = emit_lgrams
        # standalone fingerprints column: redundant once the values are
        # folded into bucket_keys — on the flagship path it was ~20% of
        # the materialized signature mass with zero consumers
        self.emit_fingerprints = (not emit_bucket_keys
                                  if emit_fingerprints is None
                                  else emit_fingerprints)
        self.bucket_simhash = bucket_simhash
        self.bucket_fingerprints = bucket_fingerprints
        self.bucket_norm = bucket_norm
        self.encoder = ShingleEncoder(k=self.cfg.shingle_k, seed=self.cfg.minhash_seed)
        self.perm_a, self.perm_b = make_permutations(
            self.cfg.num_perm, self.cfg.minhash_seed)
        self.window = max(1, self.cfg.substring_min_len - self.cfg.winnow_kgram + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        tcol = batch.column(self.text_col)
        # tokenization runs as Arrow C++ kernels for ASCII rows (word
        # hashing touches only DISTINCT tokens; no per-token Python
        # object); rare non-ASCII rows take the per-doc Python
        # tokenizer inside arrow_token_stats — bit-identical results
        from dedup_restore_ray.functions.shingle import arrow_token_stats
        wh, ntok, norm, raws = arrow_token_stats(tcol, self.encoder.hasher)
        flat, offsets = self.encoder.encode_word_hashes(wh, ntok)
        # the 128-perm minhash matrix is the most expensive signature;
        # skip it when neither the column nor the bucket keys need it.
        # When the matrix is folded into bucket keys and discarded
        # (flagship), it lives in the scratch arena — safe because the
        # winnowing pass below uses disjoint arena names (kg_*/wm_*)
        # and compute_bucket_keys consumes sig before this returns.
        if self.emit_minhash or self.emit_bucket_keys:
            if cfg.minhash_mode == "oph":
                from dedup_restore_ray.functions.minhash import oph_signatures
                sig = oph_signatures(flat, offsets, cfg.num_perm,
                                     use_scratch=not self.emit_minhash)
            else:
                sig = minhash_signatures(flat, offsets, self.perm_a,
                                         self.perm_b,
                                         use_scratch=not self.emit_minhash)
        else:
            sig = None
        sh = simhash_signatures(flat, offsets)
        # norm/raws are Arrow binary arrays; SHA-1 reads their buffers
        # via memoryview slices — no Python bytes copy of the corpus
        chashes = content_hashes_arrow(raws)
        nhashes = content_hashes_arrow(norm)
        nshingles = np.diff(offsets)
        need_fp = (self.emit_fingerprints
                   or (self.emit_bucket_keys and self.bucket_fingerprints))
        fp_flat, fp_offsets = (batch_winnowed_fingerprints_csr(
            norm, cfg.winnow_kgram, self.window) if need_fp
            else (np.empty(0, np.uint64),
                  np.zeros(len(norm) + 1, dtype=np.int64)))

        shingle_list = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32)), pa.array(flat, pa.uint64()))

        cols = {
            "doc_id": batch.column(self.id_col),
            "content_hash": pa.array(chashes, pa.binary(20)),
            "norm_hash": pa.array(nhashes, pa.binary(20)),
            "n_tokens": pa.array(ntok, pa.int64()),
            "n_shingles": pa.array(nshingles, pa.int64()),
            "shingles": shingle_list,
            "simhash": pa.array(sh, pa.uint64()),
        }
        if self.emit_minhash:
            mh_offsets = np.arange(len(norm) + 1, dtype=np.int32) * cfg.num_perm
            cols["minhash"] = pa.ListArray.from_arrays(
                pa.array(mh_offsets), pa.array(sig.reshape(-1), pa.uint64()))
        if self.emit_lgrams:
            from dedup_restore_ray.functions.fingerprint import batch_lgram_hashes
            gs = batch_lgram_hashes(norm.to_pylist(), cfg.substring_min_len)
            goffs = np.zeros(len(gs) + 1, dtype=np.int64)
            goffs[1:] = np.cumsum([len(g) for g in gs])
            gflat = (np.concatenate(gs) if gs
                     else np.empty(0, dtype=np.uint64))
            cols["lgrams"] = pa.ListArray.from_arrays(
                pa.array(goffs.astype(np.int32), pa.int32()),
                pa.array(gflat, pa.uint64()))
        if self.emit_fingerprints:
            cols["fingerprints"] = pa.ListArray.from_arrays(
                pa.array(fp_offsets.astype(np.int32)),
                pa.array(fp_flat, pa.uint64()))
        if self.emit_bucket_keys:
            # fold every candidate-source key into one compact list so
            # the heavyweight minhash matrix need not be materialized
            from dedup_restore_ray.functions.lsh import compute_bucket_keys
            norm64 = np.frombuffer(
                b"".join(h[:8] for h in nhashes), dtype=np.uint64)
            kflat, koffs = compute_bucket_keys(
                cfg, sig,
                sh if self.bucket_simhash else None,
                fp_flat if self.bucket_fingerprints else None,
                np.diff(fp_offsets).astype(np.int64)
                if self.bucket_fingerprints else None,
                norm64 if self.bucket_norm else None)
            cols["bucket_keys"] = pa.ListArray.from_arrays(
                pa.array(koffs.astype(np.int32), pa.int32()),
                pa.array(kflat, pa.uint64()))
        for c in self.keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)
