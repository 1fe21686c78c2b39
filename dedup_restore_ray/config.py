"""Pipeline configuration.

The reference's extension surface is compile-time ``#define``s
(reference: include/config.h:62-157 — chunk sizes, cache sizes, mode
switches).  Here every knob is a field of one dataclass whose hash is
recorded in lineage manifests so a resumed run cannot silently mix
configs (SURVEY §7.4).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- shingling (north_rule: 5-gram word shingles) -------------------
    shingle_k: int = 5            # words per shingle
    # --- MinHash (north_rule: 128 permutations) -------------------------
    num_perm: int = 128
    minhash_seed: int = 42
    minhash_mode: str = "perm"    # "perm" (128 independent permutations,
    #                               the north_rule config — keep for
    #                               oracle-checked pipelines) or "oph"
    #                               (one-permutation hashing + rotation
    #                               densification: ~1/num_perm of the
    #                               hashing traffic, same LSH contract)
    # --- LSH banding (north_rule: 16 bands x 8 rows) --------------------
    num_bands: int = 16
    rows_per_band: int = 8
    # --- SimHash (north_rule: 64-bit) -----------------------------------
    simhash_bits: int = 64
    simhash_hamming_threshold: int = 3   # candidate if hamming distance <= t
    # --- verification ---------------------------------------------------
    jaccard_threshold: float = 0.8       # exact-Jaccard accept threshold
    # --- skew handling (north_rule: explicit salted-key splitting) ------
    max_bucket_pairs: int = 64           # bucket size above which we stop
    #                                      emitting all O(n^2) pairs and
    #                                      switch to salted star+chain pairing
    num_salts: int = 16                  # sub-buckets for hot LSH keys
    # --- substring pass (north_rule: suffix-array substring pass) -------
    substring_min_len: int = 100         # chars; guaranteed-detect length
    winnow_kgram: int = 50               # chars per k-gram fingerprint
    #   winnowing guarantee: any shared run >= winnow_kgram + window - 1
    #   chars is detected; window = substring_min_len - winnow_kgram + 1
    suffix_max_partition_chars: int = 32_000_000   # SA memory budget per task
    # --- clustering -----------------------------------------------------
    max_label_rounds: int = 30           # bound on min-label fixpoint rounds
    # --- execution sizing ----------------------------------------------
    batch_size: int = 2048               # docs per signature batch
    signature_concurrency: int | tuple | None = None  # actor pool size (None=tasks)
    broadcast_limit: int = 2_000_000     # max graph nodes for driver-side
    #                                      union-find / broadcast label maps;
    #                                      beyond this the distributed
    #                                      label-propagation path is required
    # --- similarity search ----------------------------------------------
    ann_top_k: int = 10
    ivf_num_centroids: int = 16
    ivf_num_probe: int = 4

    def config_hash(self) -> str:
        """Stable hash of every knob — stamped into partition manifests."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def __post_init__(self):
        if self.num_bands * self.rows_per_band != self.num_perm:
            raise ValueError("num_bands * rows_per_band must equal num_perm")
        if self.minhash_mode not in ("perm", "oph"):
            raise ValueError(
                f"minhash_mode must be 'perm' or 'oph', got "
                f"{self.minhash_mode!r}")


DEFAULT_CONFIG = PipelineConfig()
