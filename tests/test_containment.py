"""Containment-pairs operator: asymmetric (small-in-big) near-dup
detection that symmetric Jaccard misses by design."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestContainmentPairs:
    def test_small_in_big_found_jaccard_misses(self, tmp_path):
        rng = np.random.default_rng(7)
        words = [f"w{i}" for i in range(500)]
        big = " ".join(rng.choice(words, 200).tolist())
        small = " ".join(big.split()[:30])          # prefix: contained
        other = " ".join(rng.choice(words, 150).tolist())
        sf = _write_docs(tmp_path, [big, small, other])

        from dedup_restore_ray.queries import q_containment_pairs_docs
        out = q_containment_pairs_docs(sf)
        got = set(zip(out.u, out.v))
        assert (1, 2) in got
        row = out[(out.u == 1) & (out.v == 2)].iloc[0]
        assert row.containment >= 0.99
        # the same pair is NOT a Jaccard>=0.8 near-dup (asymmetric case)
        inter = row.containment * min(200 - 4, 30 - 4)
        assert inter / (196 + 26 - inter) < 0.8

    def test_matches_brute_force(self, tmp_path):
        """Engine output == brute-force python containment on a mixed
        corpus (planted containment, near-dups, unrelated, tiny docs)."""
        rng = np.random.default_rng(11)
        words = [f"t{i}" for i in range(300)]
        texts = []
        for _ in range(12):
            texts.append(" ".join(rng.choice(words, 80).tolist()))
        texts.append(" ".join(texts[0].split()[10:40]))   # contained in 0
        texts.append(texts[3])                            # exact dup of 3
        texts.append("one two three")                     # < k tokens
        texts.append("")                                  # empty
        sf = _write_docs(tmp_path, texts)

        from dedup_restore_ray.functions.shingle import ShingleEncoder
        from dedup_restore_ray.queries import CFG, q_containment_pairs_docs
        enc = ShingleEncoder(k=CFG.shingle_k, seed=CFG.minhash_seed)
        flat, off = enc.encode(texts)
        sets = [set(flat[off[i]:off[i + 1]].tolist())
                for i in range(len(texts))]
        expect = set()
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                a, b = sets[i], sets[j]
                if a and b and len(a & b) / min(len(a), len(b)) >= 0.9:
                    expect.add((i + 1, j + 1))
        out = q_containment_pairs_docs(sf)
        assert set(zip(out.u, out.v)) == expect
        assert len(expect) >= 2
