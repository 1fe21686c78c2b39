"""Incremental append dedup (pipelines/append.py)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _docs_table(rows):
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


CORPUS = [
    (1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta"),
    (4, "epsilon"), (5, "gamma delta"), (6, "zeta"),
    (7, "alpha beta"), (8, "eta theta"), (9, "eta theta"),
    (10, "zeta"),
]


class TestAppendDedup:
    def _run_append(self, old_rows, new_rows, store_roundtrip=None):
        from dedup_restore_ray.pipelines.append import (
            append_exact_dedup, canonical_hash_store, hash_new_docs,
            read_hash_store, write_hash_store)
        store = canonical_hash_store(
            hash_new_docs(rd.from_arrow(_docs_table(old_rows))))
        if store_roundtrip:
            write_hash_store(store, store_roundtrip)
            store = read_hash_store(store_roundtrip)
        out = append_exact_dedup(
            hash_new_docs(rd.from_arrow(_docs_table(new_rows))
                          .repartition(3)), store)
        return (out.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))

    def test_equals_batch_when_ids_ordered(self, ray_session):
        # old = ids 1..5, new = ids 6..10: incremental must equal the
        # batch first-wins run restricted to the new ids
        from dedup_restore_ray.stages.groups import mark_canonical
        from dedup_restore_ray.pipelines.append import hash_new_docs
        old, new = CORPUS[:5], CORPUS[5:]
        got = self._run_append(old, new)
        batch = (mark_canonical(
                     hash_new_docs(rd.from_arrow(_docs_table(CORPUS))),
                     "content_hash")
                 .to_pandas())
        exp = (batch[batch.doc_id >= 6]
               [["doc_id", "canonical_id", "is_dup"]]
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

    def test_store_wins_over_new_ids(self, ray_session):
        # a new doc with a smaller id than the store's canonical still
        # defers to the store (the persisted-index semantics)
        got = self._run_append([(100, "x y z")], [(1, "x y z")])
        assert got.loc[0, "canonical_id"] == 100
        assert bool(got.loc[0, "is_dup"])

    def test_first_new_wins_within_shard(self, ray_session):
        got = self._run_append([(1, "seen")],
                               [(20, "fresh"), (21, "fresh"),
                                (22, "seen")])
        by_id = got.set_index("doc_id")
        assert by_id.loc[20, "canonical_id"] == 20
        assert not bool(by_id.loc[20, "is_dup"])
        assert by_id.loc[21, "canonical_id"] == 20
        assert bool(by_id.loc[21, "is_dup"])
        assert by_id.loc[22, "canonical_id"] == 1
        assert bool(by_id.loc[22, "is_dup"])

    def test_store_parquet_roundtrip(self, ray_session, tmp_path):
        direct = self._run_append(CORPUS[:5], CORPUS[5:])
        via_disk = self._run_append(CORPUS[:5], CORPUS[5:],
                                    store_roundtrip=str(tmp_path / "hs"))
        pd.testing.assert_frame_equal(direct, via_disk)


class TestNearDupAppend:
    def test_equals_batch_pairs_touching_shard(self, ray_session, sf_dir):
        """Incremental near-dup (odd shard vs even store) must equal
        the batch verified pairs restricted to pairs touching the
        shard — bands are corpus-independent, so nothing is lost."""
        from dedup_restore_ray.queries import (q_incremental_neardup_docs,
                                               q_near_dup_pairs_docs)
        inc = q_incremental_neardup_docs(sf_dir)
        batch = q_near_dup_pairs_docs(sf_dir)
        exp = (batch[(batch.u % 2 == 1) | (batch.v % 2 == 1)]
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(inc, exp)

    def test_empty_shard(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from dedup_restore_ray.config import PipelineConfig
        from dedup_restore_ray.pipelines.append import near_dup_append
        from dedup_restore_ray.stages.signatures import SignatureStage
        cfg = PipelineConfig()
        docs = _docs_table([(1, "alpha beta gamma delta epsilon zeta"),
                            (2, "alpha beta gamma delta epsilon zeta")])
        sigs = (rd.from_arrow(docs)
                .map_batches(SignatureStage(cfg), batch_format="pyarrow"))
        empty = (rd.from_arrow(docs.slice(0, 0))
                 .map_batches(SignatureStage(cfg),
                              batch_format="pyarrow"))
        out = near_dup_append(empty, sigs, cfg).to_pandas()
        assert len(out) == 0
