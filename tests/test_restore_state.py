"""Restore roundtrip, resumable output manifests, multimodal plumbing."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from dedup_restore_ray.config import PipelineConfig


@pytest.mark.usefixtures("ray_session")
class TestRestore:
    def test_roundtrip_byte_identity(self, tmp_path):
        """The reference's restored-bytes invariant
        (src/look_ahead.c:204-215): every doc reconstructs to its exact
        original text from the deduplicated store."""
        import ray.data as rd
        from dedup_restore_ray.pipelines.restore import (canonical_store,
                                                         restore_corpus)
        from dedup_restore_ray.stages.exact import exact_dedup
        from dedup_restore_ray.functions.hashing import content_hashes

        texts = ["alpha beta gamma", "alpha beta gamma", "delta", "",
                 "epsilon zeta", "delta"]
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())}))

        def add_hash(b):
            h = content_hashes(b.column("text").to_pylist())
            return b.append_column("content_hash", pa.array(h, pa.binary(20)))

        hashed = docs.map_batches(add_hash, batch_format="pyarrow")
        marked = exact_dedup(hashed).materialize()
        store = canonical_store(docs, marked)
        # store holds only canonical rows
        assert store.count() == len(set(texts))
        for strategy in ("broadcast", "sort"):
            restored = restore_corpus(
                marked.select_columns(["doc_id", "canonical_id"]), store,
                strategy=strategy).to_pandas()
            assert len(restored) == len(texts)
            got = dict(zip(restored.doc_id, restored.restored_text))
            for i, t in enumerate(texts):
                assert got[i] == t, (strategy, i)


@pytest.mark.usefixtures("ray_session")
class TestResumableOutput:
    def test_manifests_and_resume_skip(self, tmp_path):
        import ray.data as rd
        from dedup_restore_ray.pipelines.dedup import (dedup_pipeline,
                                                       write_assignments)
        from dedup_restore_ray.state.manifest import (aggregate_metrics,
                                                      completed_partitions,
                                                      read_manifests)
        docs = rd.from_items([
            {"doc_id": i, "text": f"doc number {i % 7} body text here"}
            for i in range(40)])
        res = dedup_pipeline(docs, PipelineConfig())
        out_dir = str(tmp_path / "assignments")
        summary = write_assignments(res, out_dir, num_partitions=4)
        assert summary["written_rows"] == 40
        assert completed_partitions(out_dir) == {"0", "1", "2", "3"}
        manifests = read_manifests(out_dir)
        assert sum(m["rows"] for m in manifests) == 40
        cfg_hashes = {m["config_hash"] for m in manifests}
        assert cfg_hashes == {PipelineConfig().config_hash()}
        # resume: second write skips all completed partitions
        res2 = dedup_pipeline(docs, PipelineConfig())
        summary2 = write_assignments(res2, out_dir, num_partitions=4)
        assert summary2["written_rows"] == 0
        assert aggregate_metrics(out_dir)["rows"] == 40


class TestMultimodal:
    def test_real_decode_rejects_unknown_type(self):
        from dedup_restore_ray.stages.multimodal import DecodeMedia
        t = pa.table({"doc_id": [1], "payload": [b"\xff\xd8rubbish"],
                      "media_type": ["image/jpeg"]})
        with pytest.raises(ValueError, match="no decoder"):
            DecodeMedia(fake=False)(t)

    def test_fake_decode_deterministic(self):
        from dedup_restore_ray.stages.multimodal import DecodeMedia
        t = pa.table({"doc_id": [1, 2], "payload": [b"abc", None]})
        d = DecodeMedia(fake=True, feature_dim=8)
        out1, out2 = d(t), d(t)
        assert out1.column("features").to_pylist() == \
            out2.column("features").to_pylist()
        feats = out1.column("features").to_pylist()
        assert len(feats[0]) == 8
        assert feats[1] == [0.0] * 8          # null payload -> zeros
        assert out1.column("payload_bytes").to_pylist() == [3, 0]

    def test_frame_sample_counts(self):
        from dedup_restore_ray.stages.multimodal import FrameSample
        t = pa.table({"doc_id": [1, 2], "duration_s": [1.0, 0.0]})
        out = FrameSample(every_k=10, fps=30.0)(t)
        # 30 frames / 10 -> 3 refs for doc 1, none for doc 2
        assert out.column("doc_id").to_pylist() == [1, 1, 1]
        assert out.column("frame_index").to_pylist() == [0, 10, 20]


class TestManifestAtomicity:
    def test_incomplete_partition_invisible(self, tmp_path):
        from dedup_restore_ray.state.manifest import (completed_partitions,
                                                      write_partition)
        root = str(tmp_path / "out")
        t = pa.table({"a": [1, 2]})
        write_partition(root, "0", t, "cfg")
        # a tmp dir without manifest must not count as complete
        os.makedirs(os.path.join(root, "part=1.tmp-zz"), exist_ok=True)
        assert completed_partitions(root) == {"0"}

    def test_idempotent_rewrite(self, tmp_path):
        from dedup_restore_ray.state.manifest import (read_manifests,
                                                      write_partition)
        root = str(tmp_path / "out")
        t = pa.table({"a": [1, 2]})
        write_partition(root, "0", t, "cfg")
        first = read_manifests(root)[0]["written_at"]
        write_partition(root, "0", pa.table({"a": [9]}), "cfg")
        assert read_manifests(root)[0]["written_at"] == first  # untouched


@pytest.mark.usefixtures("ray_session")
class TestWindowedRestore:
    def test_window_size_reduces_container_reads(self):
        """The reference's central restore result (src/look_ahead.c):
        larger look-ahead windows -> fewer container reads, identical
        restored bytes."""
        import ray.data as rd
        from dedup_restore_ray.pipelines.restore import (canonical_store,
                                                         windowed_restore)
        from dedup_restore_ray.stages.exact import exact_dedup
        from dedup_restore_ray.functions.hashing import content_hashes

        # 400 refs over 40 distinct payloads, heavy duplication
        texts = [f"payload number {i % 40} with some body text" \
                 for i in range(400)]
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(400), pa.int64()),
            "text": pa.array(texts, pa.string())}))

        def add_hash(b):
            h = content_hashes(b.column("text").to_pylist())
            return b.append_column("content_hash",
                                   pa.array(h, pa.binary(20)))

        marked = exact_dedup(docs.map_batches(
            add_hash, batch_format="pyarrow")).materialize()
        store = canonical_store(docs, marked).materialize()
        stats = {}
        for w in (16, 64, 400):
            stats[w] = windowed_restore(
                marked.select_columns(["doc_id", "canonical_id"]),
                store, window_size=w)
        # monotone: bigger window -> fewer container reads
        assert stats[16]["total_container_read"] >= \
            stats[64]["total_container_read"] >= \
            stats[400]["total_container_read"]
        # window covering everything reads each container exactly once
        assert stats[400]["total_container_read"] == 40
        # restored stream identical regardless of window size
        assert len({s["restored_sha1"] for s in stats.values()}) == 1
        assert stats[16]["restored_rows"] == 400


@pytest.mark.usefixtures("ray_session")
class TestCanonicalStoreScaleGate:
    """Beyond broadcast_limit canonicals the store derivation must not
    build a driver-resident id pack (round-2 verdict 'what's wrong
    #4'): the gated path is a sort-scatter semi join."""

    def _corpus(self):
        import ray.data as rd
        from dedup_restore_ray.stages.exact import exact_dedup
        from dedup_restore_ray.functions.hashing import content_hashes
        texts = [f"body {i % 9} of the document" for i in range(60)]
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())}))

        def add_hash(b):
            h = content_hashes(b.column("text").to_pylist())
            return b.append_column("content_hash",
                                   pa.array(h, pa.binary(20)))

        marked = exact_dedup(
            docs.map_batches(add_hash, batch_format="pyarrow")
        ).materialize()
        return docs, marked, texts

    def test_gated_path_matches_broadcast_without_driver_pack(
            self, monkeypatch):
        from dedup_restore_ray.pipelines import restore as R
        docs, marked, texts = self._corpus()
        want = (R.canonical_store(docs, marked).to_pandas()
                .sort_values("canonical_id").reset_index(drop=True))
        # the broadcast branch is the ONLY consumer of _id_hashes here;
        # poisoning it proves the gated path never packs ids driver-side
        import dedup_restore_ray.stages.verify as V

        def boom(*a, **k):
            raise AssertionError("driver-side id pack on gated path")

        monkeypatch.setattr(V, "_id_hashes", boom)
        got = (R.canonical_store(docs, marked, broadcast_limit=0)
               .to_pandas().sort_values("canonical_id")
               .reset_index(drop=True))
        assert got.equals(want)
        assert len(got) == len(set(texts))

    def test_restore_rides_gated_store(self):
        from dedup_restore_ray.pipelines.restore import (canonical_store,
                                                         restore_corpus)
        docs, marked, texts = self._corpus()
        store = canonical_store(docs, marked, broadcast_limit=0)
        restored = restore_corpus(
            marked.select_columns(["doc_id", "canonical_id"]), store,
            strategy="sort").to_pandas()
        got = dict(zip(restored.doc_id, restored.restored_text))
        assert all(got[i] == t for i, t in enumerate(texts))


def _dup_corpus(n=400, k=40):
    """n refs over k distinct payloads, heavy duplication."""
    import ray.data as rd
    from dedup_restore_ray.stages.exact import exact_dedup
    from dedup_restore_ray.functions.hashing import content_hashes
    texts = [f"payload number {i % k} with some body text"
             for i in range(n)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    def add_hash(b):
        h = content_hashes(b.column("text").to_pylist())
        return b.append_column("content_hash", pa.array(h, pa.binary(20)))

    marked = exact_dedup(docs.map_batches(
        add_hash, batch_format="pyarrow")).materialize()
    from dedup_restore_ray.pipelines.restore import canonical_store
    store = canonical_store(docs, marked).materialize()
    return marked, store


@pytest.mark.usefixtures("ray_session")
class TestChunkCache:
    """e/p-split chunk-cache counters (reference R9/R11,
    src/chunk_cache.c:131-527): limit parity + the e/p state machine."""

    def test_limit_parity(self):
        from dedup_restore_ray.pipelines.restore import (
            windowed_restore_chunkcache)
        marked, store = _dup_corpus(400, 40)
        refs = marked.select_columns(["doc_id", "canonical_id"])
        # cache=0 degenerates to one read per ref (regular_assemble,
        # src/look_ahead.c:149-179)
        m0 = windowed_restore_chunkcache(refs, store, cache_size=0,
                                         window_size=64)
        assert m0["total_container_read"] == 400
        assert m0["cache_hit"] == 0
        assert m0["ecache_size"] == m0["pcache_size"] == 0
        # cache >= #canonicals reads each stored row exactly once
        # (the one-shot restore limit)
        minf = windowed_restore_chunkcache(refs, store, cache_size=10_000,
                                           window_size=64)
        assert minf["total_container_read"] == 40
        assert minf["cache_hit"] == 360
        # finite cache sits between the limits, monotone in size
        m8 = windowed_restore_chunkcache(refs, store, cache_size=8,
                                         window_size=64)
        m24 = windowed_restore_chunkcache(refs, store, cache_size=24,
                                          window_size=64)
        assert 40 <= m24["total_container_read"] \
            <= m8["total_container_read"] <= 400
        assert m8["total_container_read"] + m8["cache_hit"] == 400

    def test_ep_state_machine(self):
        """Hand-stepped windows against the reference semantics:
        hits promote on known in-window reuse and demote otherwise;
        eviction drains the probationary region first."""
        from dedup_restore_ray.pipelines.restore import (
            ChunkCachedWindowGather)

        def window(ids):
            return pa.table({"canonical_id": pa.array(ids, pa.int64())})

        g = ChunkCachedWindowGather(cache_size=2)
        r1 = g(window([7, 7, 9]))
        # 7: miss->e; 7 again: hit, no later reuse -> demoted to p;
        # 9: miss->e
        assert r1["container_read"][0].as_py() == 2
        assert r1["cache_hit"][0].as_py() == 1
        assert r1["e_num"][0].as_py() == 1      # {9}
        assert r1["p_num"][0].as_py() == 1      # {7}
        # new canonical evicts the probationary 7, not the e-chunk 9
        r2 = g(window([11]))
        assert r2["container_read"][0].as_py() == 3
        assert r2["e_num"][0].as_py() == 2      # {9, 11}
        assert r2["p_num"][0].as_py() == 0
        # 9 survived in the e region (hit); with no later in-window
        # reuse the hit demotes it to the probationary region
        # (move_2_chunk_cache_after_s_prt, src/look_ahead.c:406-410)
        r3 = g(window([9]))
        assert r3["container_read"][0].as_py() == 3
        assert r3["cache_hit"][0].as_py() == 2
        assert r3["e_num"][0].as_py() == 1      # {11}
        assert r3["p_num"][0].as_py() == 1      # {9}

    def test_p_eviction_order_is_fifo_from_tail(self):
        """p-chunks inserted after s_ptr push older p-chunks toward
        the tail; eviction takes the tail (src/chunk_cache.c:294-346)."""
        from dedup_restore_ray.pipelines.restore import (
            ChunkCachedWindowGather)
        g = ChunkCachedWindowGather(cache_size=2)
        # make 1 and 2 probationary (hit with no later in-window reuse),
        # in that demotion order: 1 older than 2 in the p region
        g(pa.table({"canonical_id": pa.array([1, 2, 1, 2], pa.int64())}))
        assert len(g.p) == 2 and len(g.e) == 0
        # one insert -> evicts oldest p (1); 2 must still be cached
        g(pa.table({"canonical_id": pa.array([5], pa.int64())}))
        hits_before = g.cache_hit
        g(pa.table({"canonical_id": pa.array([2], pa.int64())}))
        assert g.cache_hit == hits_before + 1
        g(pa.table({"canonical_id": pa.array([1], pa.int64())}))
        assert g.cache_hit == hits_before + 1   # 1 was the eviction victim


@pytest.mark.usefixtures("ray_session")
class TestFAAScatter:
    """R13 multi-window scatter (src/adaptive_faa.c:266-462): one
    container read fills every in-flight window's slots."""

    def test_faa_one_reproduces_windowed_restore(self):
        from dedup_restore_ray.pipelines.restore import (
            windowed_restore_distributed, windowed_restore_faa)
        marked, store = _dup_corpus(400, 40)
        refs = marked.select_columns(["doc_id", "canonical_id"])
        base = windowed_restore_distributed(refs, store, window_size=32)
        faa1 = windowed_restore_faa(refs, store, window_size=32,
                                    faa_windows=1)
        for key in ("total_container_read", "restored_rows",
                    "restored_bytes", "restored_merkle"):
            assert faa1[key] == base[key], key

    def test_reads_shrink_bytes_invariant(self):
        from dedup_restore_ray.pipelines.restore import (
            windowed_restore_distributed, windowed_restore_faa)
        marked, store = _dup_corpus(400, 40)
        refs = marked.select_columns(["doc_id", "canonical_id"])
        runs = {f: windowed_restore_faa(refs, store, window_size=16,
                                        faa_windows=f)
                for f in (1, 4, 100)}
        # byte-identity: per-window digests do not depend on how many
        # windows share a container read
        assert len({r["restored_merkle"] for r in runs.values()}) == 1
        assert all(r["restored_rows"] == 400 for r in runs.values())
        # container reads shrink monotonically toward the one-shot limit
        assert runs[1]["total_container_read"] >= \
            runs[4]["total_container_read"] >= \
            runs[100]["total_container_read"] == 40
        # a group of faa windows reads like ONE window of w*faa refs
        eq = windowed_restore_distributed(refs, store, window_size=64)
        assert runs[4]["total_container_read"] == \
            eq["total_container_read"]
