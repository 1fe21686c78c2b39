"""Round-2 additions: reference-exact CDC checksum, batched Jaccard,
distributed join helpers, sessionize kernel, substring parity,
vectorized id hashing, restore strictness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dedup_restore_ray.config import PipelineConfig


# ----------------------------------------------------------------------
# Reference rsync-style checksum (src/adler32.c:12-28) bit-exactness
# ----------------------------------------------------------------------

def _c_adler32_checksum(buf: bytes) -> int:
    """Direct scalar port of the reference src/adler32.c:12-28
    (s1 = s2 = 0, CHAR_OFFSET 0, signed chars, uint32 wraparound)."""
    s1 = s2 = 0
    vals = np.frombuffer(buf, dtype=np.uint8).view(np.int8)
    for c in vals.tolist():
        s1 = (s1 + c) & 0xFFFFFFFF
        s2 = (s2 + s1) & 0xFFFFFFFF
    return ((s1 & 0xFFFF) + ((s2 << 16) & 0xFFFFFFFF)) & 0xFFFFFFFF


class TestRsyncChecksum:
    def test_matches_c_port(self):
        from dedup_restore_ray.functions.cdc import rolling_rsync32
        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, 400, dtype=np.uint8)
        h = rolling_rsync32(data, win=48)
        for i in (0, 1, 100, len(h) - 1):
            expect = _c_adler32_checksum(bytes(data[i:i + 48]))
            assert int(h[i]) == expect, i

    def test_rolling_update_consistency(self):
        """The reference's incremental adler32_rolling_checksum
        (src/adler32.c:34-45) applied stepwise equals the fresh
        per-window value — mod 2^16 exactness of the update."""
        from dedup_restore_ray.functions.cdc import rolling_rsync32
        rng = np.random.default_rng(9)
        data = rng.integers(0, 256, 200, dtype=np.uint8)
        win = 48
        h = rolling_rsync32(data, win)
        sview = data.view(np.int8)
        csum = _c_adler32_checksum(bytes(data[:win]))
        assert int(h[0]) == csum
        for i in range(1, len(h)):
            c1, c2 = int(sview[i - 1]), int(sview[i + win - 1])
            s1 = csum & 0xFFFF
            s2 = (csum >> 16) & 0xFFFF
            s1 = (s1 - (c1 - c2)) & 0xFFFFFFFF
            s2 = (s2 - (win * c1 - s1)) & 0xFFFFFFFF
            csum = ((s1 & 0xFFFF) + ((s2 << 16) & 0xFFFFFFFF)) & 0xFFFFFFFF
            assert int(h[i]) == csum, i

    def test_cut_decision_uses_low_bits(self):
        # the mask test (abstract & 0x3FF) depends only on s1's low
        # bits — a boundary found by the C code is found here
        from dedup_restore_ray.functions.cdc import chunk_boundaries
        rng = np.random.default_rng(11)
        data = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
        b = chunk_boundaries(data, min_chunk=256, max_chunk=4096, mask=0xFF)
        assert b[-1] == len(data)
        assert (np.diff(np.concatenate(([0], b))) <= 4096).all()


# ----------------------------------------------------------------------
# Batched CSR Jaccard == per-pair scalar Jaccard
# ----------------------------------------------------------------------

class TestJaccardBatch:
    def test_matches_scalar(self):
        from dedup_restore_ray.functions.jaccard import (jaccard_batch,
                                                         jaccard_sorted)
        rng = np.random.default_rng(5)
        sets = []
        for _ in range(40):
            n = int(rng.integers(0, 30))
            sets.append(np.unique(rng.integers(0, 50, n).astype(np.uint64)))
        offsets = np.concatenate(([0], np.cumsum([len(s) for s in sets])))
        flat = (np.concatenate(sets) if sets else np.empty(0, np.uint64))
        ii = rng.integers(0, len(sets), 100)
        jj = rng.integers(0, len(sets), 100)
        got = jaccard_batch(flat,
                            offsets[ii], offsets[ii + 1] - offsets[ii],
                            offsets[jj], offsets[jj + 1] - offsets[jj])
        for k in range(len(ii)):
            expect = jaccard_sorted(sets[ii[k]], sets[jj[k]])
            assert got[k] == pytest.approx(expect), (ii[k], jj[k])

    def test_empty_batch(self):
        from dedup_restore_ray.functions.jaccard import jaccard_batch
        z = np.empty(0, np.int64)
        assert len(jaccard_batch(np.empty(0, np.uint64), z, z, z, z)) == 0


# ----------------------------------------------------------------------
# Vectorized id hashing
# ----------------------------------------------------------------------

class TestIdHashes:
    def test_int_paths_consistent(self):
        from dedup_restore_ray.stages.verify import _id_hashes
        ids = [5, 123456789, 0, 2**40]
        a = _id_hashes(ids)
        b = _id_hashes(pa.array(ids, pa.int64()))
        c = _id_hashes(np.array(ids, dtype=np.int64))
        assert (a == b).all() and (a == c).all()
        assert len(set(a.tolist())) == len(ids)

    def test_string_path_stable(self):
        from dedup_restore_ray.stages.verify import _id_hashes
        a = _id_hashes(["x", "y"])
        b = _id_hashes(pa.array(["x", "y"]))
        assert (a == b).all()


# ----------------------------------------------------------------------
# Distributed join helpers (stages/joins.py)
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestJoins:
    @pytest.fixture(scope="class")
    def tables(self):
        rng = np.random.default_rng(7)
        refs = pa.table({
            "k": pa.array(rng.integers(0, 50, 200), pa.int64()),
            "payload": pa.array([f"r{i}" for i in range(200)])})
        keys = pa.table({
            "k": pa.array(rng.integers(25, 75, 300), pa.int64()),
            "n": pa.array(rng.integers(1, 9, 300), pa.int64())})
        return refs, keys

    def test_semi_join(self, tables):
        import ray.data as rd
        from dedup_restore_ray.stages.joins import semi_join
        refs, keys = tables
        got = semi_join(rd.from_arrow(refs).repartition(4),
                        rd.from_arrow(keys).repartition(3),
                        "k").to_pandas()
        kset = set(keys["k"].to_pylist())
        expect = refs.to_pandas()[refs.to_pandas().k.isin(kset)]
        assert sorted(got.payload) == sorted(expect.payload)

    def test_anti_join(self, tables):
        import ray.data as rd
        from dedup_restore_ray.stages.joins import anti_join
        refs, keys = tables
        got = anti_join(rd.from_arrow(refs).repartition(4),
                        rd.from_arrow(keys).repartition(3),
                        "k").to_pandas()
        kset = set(keys["k"].to_pylist())
        expect = refs.to_pandas()[~refs.to_pandas().k.isin(kset)]
        assert sorted(got.payload) == sorted(expect.payload)

    def test_left_lookup_with_default(self, tables):
        import ray.data as rd
        from dedup_restore_ray.stages.groups import grouped_aggregate
        from dedup_restore_ray.stages.joins import left_lookup
        refs, keys = tables
        counts = grouped_aggregate(rd.from_arrow(keys).repartition(3),
                                   ["k"], {}, count_alias="n_orders")
        got = left_lookup(rd.from_arrow(refs).repartition(4), counts,
                          "k", "n_orders", 0).to_pandas()
        vc = keys.to_pandas().k.value_counts()
        for _, row in got.iterrows():
            assert row.n_orders == vc.get(row.k, 0)
        assert len(got) == refs.num_rows


# ----------------------------------------------------------------------
# Substring: fingerprint shuffle ⊇ suffix-array pairs (parity at small
# scale; the SA form is the demoted-to-test exact oracle)
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestSubstringParity:
    def test_fingerprint_superset_of_suffix_array(self, pages_corpus):
        import ray.data as rd
        from dedup_restore_ray.functions.shingle import normalize_text
        from dedup_restore_ray.stages.signatures import SignatureStage
        from dedup_restore_ray.stages.substring import (fingerprint_pairs,
                                                        suffix_array_pairs)
        pages, truth = pages_corpus
        cfg = PipelineConfig()
        docs = rd.from_arrow(pa.table({
            "doc_id": pages["url"],
            "text": pages["text"]}))

        def norm(b):
            nt = [normalize_text(t) for t in b.column("text").to_pylist()]
            return pa.table({"doc_id": b.column("doc_id"),
                             "norm_text": pa.array(nt, pa.string())})

        sa = suffix_array_pairs(
            docs.map_batches(norm, batch_format="pyarrow").repartition(1),
            cfg).to_pandas()
        sigs = docs.map_batches(
            SignatureStage(cfg, emit_minhash=False, emit_bucket_keys=False),
            batch_format="pyarrow")
        fp = fingerprint_pairs(
            sigs.select_columns(["doc_id", "fingerprints"]),
            cfg).to_pandas()
        sa_set = {tuple(sorted(t)) for t in zip(sa.u, sa.v)}
        fp_set = {tuple(sorted(t)) for t in zip(fp.u, fp.v)}
        # winnowing guarantee: every exact >= min_len run is caught
        assert sa_set <= fp_set
        assert len(sa_set) > 0

    def test_verified_pairs_exact_vs_suffix_array(self, pages_corpus):
        """verified_substring_pairs == the suffix-array ground truth:
        candidates (winnowed superset) filtered by L-gram hash-set
        intersection must yield EXACTLY the pairs sharing a normalized
        run >= substring_min_len chars."""
        import dataclasses

        import ray.data as rd
        from dedup_restore_ray.functions.shingle import normalize_text
        from dedup_restore_ray.stages.substring import (
            suffix_array_pairs, verified_substring_pairs)
        pages, _ = pages_corpus
        cfg = dataclasses.replace(PipelineConfig(),
                                  max_bucket_pairs=10_000_000)
        docs = rd.from_arrow(pa.table({
            "doc_id": pages["url"],
            "text": pages["text"]}))

        def norm(b):
            nt = [normalize_text(t) for t in b.column("text").to_pylist()]
            return pa.table({"doc_id": b.column("doc_id"),
                             "norm_text": pa.array(nt, pa.string())})

        sa = suffix_array_pairs(
            docs.map_batches(norm, batch_format="pyarrow").repartition(1),
            cfg).to_pandas()
        ver = verified_substring_pairs(docs, cfg).to_pandas()
        sa_set = {tuple(sorted(t)) for t in zip(sa.u, sa.v)}
        ver_set = {tuple(sorted(t)) for t in zip(ver.u, ver.v)}
        assert ver_set == sa_set
        assert len(sa_set) > 0

    def test_verified_pairs_scatter_matches_broadcast(self, pages_corpus):
        import dataclasses

        import ray.data as rd
        from dedup_restore_ray.stages.substring import \
            verified_substring_pairs
        pages, _ = pages_corpus
        cfg = dataclasses.replace(PipelineConfig(),
                                  max_bucket_pairs=10_000_000)
        docs = rd.from_arrow(pa.table({
            "doc_id": pages["url"],
            "text": pages["text"]}))
        b = verified_substring_pairs(docs, cfg,
                                     strategy="broadcast").to_pandas()
        s = verified_substring_pairs(docs, cfg,
                                     strategy="scatter").to_pandas()
        bs = {tuple(sorted(t)) for t in zip(b.u, b.v)}
        ss = {tuple(sorted(t)) for t in zip(s.u, s.v)}
        assert bs == ss


# ----------------------------------------------------------------------
# Restore strictness: missing canonical fails loudly
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestRestoreStrict:
    def _mini(self):
        import ray.data as rd
        assigns = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "canonical_id": pa.array([1, 1, 99], pa.int64())}))
        store = rd.from_arrow(pa.table({
            "canonical_id": pa.array([1], pa.int64()),
            "stored_text": pa.array(["alpha"], pa.string())}))
        return assigns, store

    def test_broadcast_raises(self):
        from dedup_restore_ray.pipelines.restore import restore_corpus
        assigns, store = self._mini()
        with pytest.raises(Exception, match="absent from the store"):
            restore_corpus(assigns, store, strategy="broadcast").to_pandas()

    def test_sort_raises(self):
        from dedup_restore_ray.pipelines.restore import restore_corpus
        assigns, store = self._mini()
        with pytest.raises(Exception, match="absent from the store"):
            restore_corpus(assigns, store, strategy="sort").to_pandas()

    def test_windowed_raises(self):
        from dedup_restore_ray.pipelines.restore import windowed_restore
        assigns, store = self._mini()
        with pytest.raises(Exception, match="absent from the store"):
            windowed_restore(assigns, store, window_size=2)


# ----------------------------------------------------------------------
# Direct random write (reference R15 write_to_reloaded parity)
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestDirectWrite:
    @pytest.fixture(scope="class")
    def deduped(self):
        import ray.data as rd
        from dedup_restore_ray.functions.hashing import content_hashes
        from dedup_restore_ray.pipelines.restore import canonical_store
        from dedup_restore_ray.stages.exact import exact_dedup
        texts = ["alpha beta", "alpha beta", "gamma", "delta", "gamma",
                 "epsilon"]
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())}))

        def add_hash(b):
            h = content_hashes(b.column("text").to_pylist())
            return b.append_column("content_hash",
                                   pa.array(h, pa.binary(20)))

        marked = exact_dedup(
            docs.map_batches(add_hash, batch_format="pyarrow")).materialize()
        store = canonical_store(docs, marked).materialize()
        return texts, docs, marked, store

    def _restore_texts(self, res):
        from dedup_restore_ray.pipelines.restore import restore_corpus
        out = restore_corpus(
            res.assignments.select_columns(["doc_id", "canonical_id"]),
            res.store, strategy="sort").to_pandas()
        return dict(zip(out.doc_id, out.restored_text))

    def test_update_to_new_content(self, deduped):
        import ray.data as rd
        from dedup_restore_ray.pipelines.update import apply_updates
        texts, docs, marked, store = deduped
        updates = rd.from_arrow(pa.table({
            "doc_id": pa.array([3], pa.int64()),
            "new_text": pa.array(["delta PRIME"], pa.string())}))
        res = apply_updates(marked.select_columns(
            ["doc_id", "canonical_id", "is_dup"]), store, updates)
        got = self._restore_texts(res)
        assert got[3] == "delta PRIME"
        for i, t in enumerate(texts):
            if i != 3:
                assert got[i] == t
        assert res.metrics["n_updates"] == 1
        assert res.metrics["new_store_rows"] == 1
        assert res.metrics["dedup_hits"] == 0

    def test_update_dedups_against_existing_content(self, deduped):
        import ray.data as rd
        from dedup_restore_ray.pipelines.update import apply_updates
        texts, docs, marked, store = deduped
        # doc 5 rewritten to content that already exists (canonical 2)
        updates = rd.from_arrow(pa.table({
            "doc_id": pa.array([5], pa.int64()),
            "new_text": pa.array(["gamma"], pa.string())}))
        res = apply_updates(marked.select_columns(
            ["doc_id", "canonical_id", "is_dup"]), store, updates)
        assert res.metrics["dedup_hits"] == 1
        assert res.metrics["new_store_rows"] == 0
        got = self._restore_texts(res)
        assert got[5] == "gamma"
        a = res.assignments.to_pandas().set_index("doc_id")
        assert a.loc[5, "canonical_id"] == 2
        assert bool(a.loc[5, "is_dup"])

    def test_update_canonical_keeps_dependents(self, deduped):
        import ray.data as rd
        from dedup_restore_ray.pipelines.update import (apply_updates,
                                                        vacuum_store)
        texts, docs, marked, store = deduped
        # doc 0 is canonical for doc 1; updating 0 must not corrupt 1
        updates = rd.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "new_text": pa.array(["ZERO v2"], pa.string())}))
        res = apply_updates(marked.select_columns(
            ["doc_id", "canonical_id", "is_dup"]), store, updates)
        got = self._restore_texts(res)
        assert got[0] == "ZERO v2"
        assert got[1] == "alpha beta"     # dependent unaffected
        # vacuum retains every still-referenced row
        v = vacuum_store(res.assignments, res.store)
        refs = set(res.assignments.to_pandas().canonical_id)
        assert set(v.to_pandas().canonical_id) == refs

    def test_concurrent_identical_updates_share_row(self, deduped):
        import ray.data as rd
        from dedup_restore_ray.pipelines.update import apply_updates
        texts, docs, marked, store = deduped
        updates = rd.from_arrow(pa.table({
            "doc_id": pa.array([3, 5], pa.int64()),
            "new_text": pa.array(["same NEW content"] * 2, pa.string())}))
        res = apply_updates(marked.select_columns(
            ["doc_id", "canonical_id", "is_dup"]), store, updates)
        assert res.metrics["new_store_rows"] == 1   # first-wins election
        got = self._restore_texts(res)
        assert got[3] == got[5] == "same NEW content"
        a = res.assignments.to_pandas().set_index("doc_id")
        assert a.loc[3, "canonical_id"] == a.loc[5, "canonical_id"]
        assert not bool(a.loc[3, "is_dup"])   # elected writer
        assert bool(a.loc[5, "is_dup"])


# ----------------------------------------------------------------------
# Distributed windowed restore: counter + merkle parity with the
# driver-side formulation (reference R5-R12 look-ahead restore)
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestWindowedRestoreDistributed:
    @pytest.fixture(scope="class")
    def corpus(self, pages_corpus):
        import ray.data as rd
        from dedup_restore_ray.functions.hashing import content_hashes
        from dedup_restore_ray.pipelines.restore import canonical_store
        from dedup_restore_ray.stages.exact import exact_dedup
        pages, truth = pages_corpus
        docs = rd.from_arrow(pa.table({
            "doc_id": pages["url"],
            "text": pages["text"]})).map_batches(
            lambda b: pa.table({
                "doc_id": b.column("doc_id"),
                "text": pa.compute.fill_null(b.column("text"), "")}),
            batch_format="pyarrow")

        def add_hash(b):
            h = content_hashes(b.column("text").to_pylist())
            return b.append_column("content_hash",
                                   pa.array(h, pa.binary(20)))

        marked = exact_dedup(docs.map_batches(
            add_hash, batch_format="pyarrow")).materialize()
        store = canonical_store(docs, marked).materialize()
        return marked.select_columns(
            ["doc_id", "canonical_id"]).repartition(7).materialize(), store

    @pytest.mark.parametrize("window", [32, 128])
    def test_counter_and_merkle_parity(self, corpus, window):
        from dedup_restore_ray.pipelines.restore import (
            windowed_restore, windowed_restore_distributed)
        assigns, store = corpus
        drv = windowed_restore(assigns, store, window_size=window)
        dist = windowed_restore_distributed(assigns, store,
                                            window_size=window)
        assert dist["total_container_read"] == drv["total_container_read"]
        assert dist["restored_rows"] == drv["restored_rows"]
        assert dist["restored_bytes"] == drv["restored_bytes"]
        assert dist["restored_merkle"] == drv["restored_merkle"]

    def test_reads_monotone_in_window(self, corpus):
        from dedup_restore_ray.pipelines.restore import (
            windowed_restore_distributed)
        assigns, store = corpus
        reads = [windowed_restore_distributed(
            assigns, store, window_size=w)["total_container_read"]
            for w in (16, 64, 512)]
        assert reads[0] >= reads[1] >= reads[2]

    def test_cached_counters(self, corpus):
        from dedup_restore_ray.pipelines.restore import (
            windowed_restore_cached)
        assigns, store = corpus
        n = assigns.count()
        uniq = store.count()
        no_cache = windowed_restore_cached(assigns, store, cache_size=0)
        big_cache = windowed_restore_cached(assigns, store,
                                            cache_size=10**6)
        mid_cache = windowed_restore_cached(assigns, store, cache_size=8)
        # cache_size=0 -> regular_assemble: one read per ref
        assert no_cache["total_container_read"] == n
        # infinite cache -> one read per stored row (one-shot restore)
        assert big_cache["total_container_read"] == uniq
        assert (uniq <= mid_cache["total_container_read"] <= n)
        assert mid_cache["cache_hit"] + mid_cache["total_container_read"] == n


# ----------------------------------------------------------------------
# Embedding pair generation without whole-corpus broadcast
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestEmbeddingPairs:
    @pytest.fixture(scope="class")
    def planted(self):
        """120 random unit vectors + 15 planted near-dups of the first
        15 (cosine > 0.95)."""
        rng = np.random.default_rng(13)
        base = rng.standard_normal((120, 32))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        noisy = base[:15] + 0.08 * rng.standard_normal((15, 32))
        vecs = np.vstack([base, noisy])
        ids = np.arange(len(vecs), dtype=np.int64)
        tbl = pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64()))})
        # brute-force expected pairs at 0.8
        from dedup_restore_ray.functions.similarity import l2_normalize
        vn = l2_normalize(vecs)
        s = vn @ vn.T
        iu, iv = np.nonzero(np.triu(s >= 0.8, k=1))
        return tbl, {(int(a), int(b)) for a, b in zip(iu, iv)}

    def test_blockwise_exact(self, planted):
        import ray.data as rd
        from dedup_restore_ray.stages.embpairs import cosine_pairs_blockwise
        tbl, expect = planted
        got = cosine_pairs_blockwise(rd.from_arrow(tbl), 0.8,
                                     num_blocks=5).to_pandas()
        assert {(int(u), int(v)) for u, v in zip(got.u, got.v)} == expect
        assert len(expect) >= 15

    def test_hyperplane_lsh_recall(self, planted):
        import ray.data as rd
        from dedup_restore_ray.stages.embpairs import hyperplane_lsh_pairs
        tbl, expect = planted
        got = hyperplane_lsh_pairs(rd.from_arrow(tbl), 0.8).to_pandas()
        found = {(int(u), int(v)) for u, v in zip(got.u, got.v)}
        # verification is exact cosine -> precision 1.0
        assert found <= expect
        # 16x8 sign-LSH at cosine>=0.95 collides w.h.p.
        assert len(found & expect) / len(expect) >= 0.9


# ----------------------------------------------------------------------
# Pure-python media codecs: round trips + real decode stages
# ----------------------------------------------------------------------

class TestCodecs:
    def test_ppm_roundtrip(self):
        from dedup_restore_ray.functions.codecs import decode_ppm, encode_ppm
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        gray = rng.integers(0, 256, (4, 6), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(gray)) == gray).all()

    def test_ppm_comments_and_errors(self):
        from dedup_restore_ray.functions.codecs import decode_ppm
        data = b"P5\n# a comment\n2 2\n255\n" + bytes([1, 2, 3, 4])
        assert decode_ppm(data).tolist() == [[1, 2], [3, 4]]
        with pytest.raises(ValueError):
            decode_ppm(b"JUNK")
        with pytest.raises(ValueError):
            decode_ppm(b"P6\n2 2\n255\n\x00")   # truncated

    def test_resize_nearest(self):
        from dedup_restore_ray.functions.codecs import resize_nearest
        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        small = resize_nearest(img, 2, 2)
        assert small.shape == (2, 2)
        assert (resize_nearest(img, 4, 4) == img).all()

    def test_wav_roundtrip(self):
        from dedup_restore_ray.functions.codecs import decode_wav, encode_wav
        rng = np.random.default_rng(2)
        s = (rng.standard_normal(100) * 1000).astype(np.int16)
        out, rate = decode_wav(encode_wav(s, rate=8000))
        assert rate == 8000
        assert (out[:, 0] == s).all()
        with pytest.raises(ValueError):
            decode_wav(b"nope")

    def test_y4m_roundtrip(self):
        from dedup_restore_ray.functions.codecs import decode_y4m, encode_y4m
        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 256, (4, 6), dtype=np.uint8)
                  for _ in range(3)]
        got, w, h = decode_y4m(encode_y4m(frames))
        assert (w, h) == (6, 4)
        assert len(got) == 3
        for a, b in zip(got, frames):
            assert (a == b).all()

    def test_real_decode_stage(self):
        from dedup_restore_ray.stages.multimodal import (DecodeMedia,
                                                         synth_media_table)
        docs = pa.table({"doc_id": pa.array(range(12), pa.int64()),
                         "text": pa.array([f"doc number {i} body" * 3
                                           for i in range(12)])})
        media = synth_media_table(docs)
        types = set(media.column("media_type").to_pylist())
        assert types == {"image/ppm", "audio/wav", "video/y4m"}
        out = DecodeMedia(fake=False)(media)
        feats = out.column("features").to_pylist()
        assert all(len(f) == 64 for f in feats)
        # real features, not the hash stub: decoding twice is identical
        out2 = DecodeMedia(fake=False)(media)
        assert feats == out2.column("features").to_pylist()

    def test_resize_stage_changes_dims(self):
        from dedup_restore_ray.functions.codecs import decode_ppm
        from dedup_restore_ray.stages.multimodal import (ResizeImage,
                                                         synth_media_table)
        docs = pa.table({"doc_id": pa.array(range(12), pa.int64()),
                         "text": pa.array([f"t{i}" for i in range(12)])})
        media = synth_media_table(docs)
        out = ResizeImage(3, 2)(media)
        for p, t in zip(out.column("payload").to_pylist(),
                        out.column("media_type").to_pylist()):
            if t == "image/ppm":
                assert decode_ppm(p).shape == (2, 3, 3)

    def test_frame_sample_real_video(self):
        from dedup_restore_ray.functions.codecs import decode_ppm
        from dedup_restore_ray.stages.multimodal import (FrameSample,
                                                         synth_media_table)
        docs = pa.table({"doc_id": pa.array(range(12), pa.int64()),
                         "text": pa.array([f"t{i}" for i in range(12)])})
        media = synth_media_table(docs)
        out = FrameSample(every_k=2)(media)
        vids = {i for i, t in zip(media.column("doc_id").to_pylist(),
                                  media.column("media_type").to_pylist())
                if t == "video/y4m"}
        got = {}
        for i, fi, fp in zip(out.column("doc_id").to_pylist(),
                             out.column("frame_index").to_pylist(),
                             out.column("frame_payload").to_pylist()):
            got.setdefault(i, []).append((fi, fp))
        # every video emits frames 0 and 2 of its 3 frames, as PPM
        for v in vids:
            assert [fi for fi, _ in got[v]] == [0, 2]
            for _, fp in got[v]:
                assert decode_ppm(fp).shape == (4, 4)


# ----------------------------------------------------------------------
# Multi-stream placement policies (reference D6 set_stream_id) +
# compression counters in manifests
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestPlacementAndCompression:
    def _docs(self, n=64):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "x": pa.array([f"v{i}" for i in range(n)])}))

    def test_policies(self):
        from dedup_restore_ray.pipelines.dedup import assign_streams
        ds = self._docs()
        near = assign_streams(ds, "near", 8).to_pandas()
        assert set(near.stream_id) == {0}
        cyc = assign_streams(ds, "cycle", 8).to_pandas()
        assert sorted(cyc.stream_id.value_counts()) == [8] * 8
        rnd = assign_streams(ds, "random", 8).to_pandas()
        hsh = assign_streams(ds, "hash", 8).to_pandas()
        assert rnd.stream_id.between(0, 7).all()
        assert hsh.stream_id.between(0, 7).all()
        # random is salted differently from hash
        assert not (rnd.stream_id == hsh.stream_id).all()
        # determinism (resume-safety): same ids -> same streams
        rnd2 = assign_streams(ds, "random", 8).to_pandas()
        assert (rnd.stream_id == rnd2.stream_id).all()
        with pytest.raises(Exception):
            assign_streams(ds, "bogus", 8).to_pandas()

    def test_manifest_compression_counters(self, tmp_path):
        from dedup_restore_ray.state.manifest import (aggregate_metrics,
                                                      write_partition)
        root = str(tmp_path / "out")
        t = pa.table({"a": pa.array(["abc" * 100] * 1000)})
        write_partition(root, "0", t, "cfg")
        agg = aggregate_metrics(root)
        assert agg["origin_bytes"] > 0
        assert 0 < agg["stored_bytes"] < agg["origin_bytes"]
        assert agg["compress_ratio"] > 1.0

    def test_write_assignments_placement(self, tmp_path):
        import ray.data as rd
        from dedup_restore_ray.pipelines.dedup import (dedup_pipeline,
                                                       write_assignments)
        texts = [f"document body number {i % 10}" for i in range(40)]
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts)}))
        res = dedup_pipeline(docs, PipelineConfig())
        out_dir = str(tmp_path / "near_out")
        summary = write_assignments(res, out_dir, num_partitions=4,
                                    placement="near")
        assert summary["written_rows"] == 40
        assert summary["partitions"] == 1     # NEAR -> single stream


# ----------------------------------------------------------------------
# Sessionize sort-kernel vs pandas reference
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestSessionizeKernel:
    def test_matches_pandas(self, sf_dir):
        from dedup_restore_ray.queries import q_sessionize_events
        got = (q_sessionize_events(sf_dir).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
        rows = []
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values("ts")
            gaps = g["ts"].diff().dt.total_seconds().fillna(0)
            rows.append((uid, len(g), int((gaps > 1800).sum()) + 1))
        expect = (pd.DataFrame(rows,
                               columns=["user_id", "n_events", "n_sessions"])
                  .sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["user_id", "n_events", "n_sessions"]].astype(
                {"n_events": "int64", "n_sessions": "int64"}),
            expect.astype({"n_events": "int64", "n_sessions": "int64"}))


# ----------------------------------------------------------------------
# Deterministic hash split / sample (stages/split.py)
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestHashSplit:
    def _docs(self, n=400):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        }))

    def test_split_partitions_and_determinism(self):
        from dedup_restore_ray.stages.split import hash_split
        ds = self._docs()
        a = hash_split(ds, key_col="doc_id").to_pandas()
        b = hash_split(self._docs().repartition(7),
                       key_col="doc_id").to_pandas()
        # every row exactly one split; layout-independent assignment
        assert set(a["split"]) <= {"train", "val", "test"}
        am = dict(zip(a.doc_id, a.split))
        bm = dict(zip(b.doc_id, b.split))
        assert am == bm
        # fractions roughly honoured (md5 is uniform)
        frac = (a["split"] == "train").mean()
        assert 0.7 < frac < 0.9

    def test_sample_nested_and_stable(self):
        from dedup_restore_ray.stages.split import hash_sample
        ds = self._docs()
        s10 = set(hash_sample(ds, 0.10).to_pandas().doc_id)
        s25 = set(hash_sample(self._docs(), 0.25).to_pandas().doc_id)
        assert s10 <= s25          # nested by construction
        assert 0.03 < len(s10) / 400 < 0.20
        # salt changes the sample
        s25b = set(hash_sample(self._docs(), 0.25, salt="x").to_pandas().doc_id)
        assert s25 != s25b

    def test_matches_sql_md5(self):
        import hashlib
        from dedup_restore_ray.stages.split import BASIS, _buckets
        ks = [0, 1, 42, "url-a", 999999]
        got = _buckets(ks, "")
        exp = [int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % BASIS
               for k in ks]
        assert got.tolist() == exp


class TestCorpusStats:
    """ngram_topk / tfidf_topk: brute-force parity + layout independence."""

    def _tiny(self, sf="/root/testdata/sf0.001"):
        return sf

    def test_ngram_topk_matches_bruteforce(self):
        from collections import Counter
        import pandas as pd
        from dedup_restore_ray.functions.shingle import tokenize
        from dedup_restore_ray.queries import q_ngram_topk_docs
        sf = self._tiny()
        got = q_ngram_topk_docs(sf, n=3, k=20)
        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        c = Counter()
        for t in docs["text"]:
            toks = tokenize(t)
            c.update(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
        exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert list(zip(got["ngram"], got["n_occurrences"])) == exp

    def test_tfidf_layout_independent_and_k_rows(self):
        import numpy as np
        from dedup_restore_ray.queries import q_tfidf_topk_docs
        sf = self._tiny()
        a = (q_tfidf_topk_docs(sf).to_pandas()
             .sort_values(["doc_id", "term"]).reset_index(drop=True))
        # per-doc row cap and positive scores for non-trivial corpora
        assert (a.groupby("doc_id").size() <= 3).all()
        assert np.isfinite(a["score"]).all()
        b = (q_tfidf_topk_docs(sf).to_pandas()
             .sort_values(["doc_id", "term"]).reset_index(drop=True))
        assert a.equals(b)


class TestQualityFilter:
    def test_mask_matches_naive_rules(self):
        from dedup_restore_ray.functions.shingle import tokenize
        from dedup_restore_ray.functions.textstats import (
            _PUNCT_RE, _STOPWORDS_EN, _UPPER_RE, gopher_keep_mask,
            quality_filter_counts)
        texts = ["the cat sat on the mat and it was good",
                 "a b c d",                      # too few tokens
                 "!!! ??? ... ;;; ###",          # pure punctuation
                 "THE LOUD THING IS AT THE TOP OF THE HOUSE",  # uppercase
                 "wordswithoutanystopword " * 10,  # no stopwords
                 "", None,
                 "it is a fine day and the sun is out at noon you see"]
        c = quality_filter_counts(texts)
        got = gopher_keep_mask(c)
        for i, t in enumerate(texts):
            toks = tokenize(t)
            nt = len(toks)
            sl = sum(map(len, toks))
            sh = sum(1 for w in toks if w in _STOPWORDS_EN)
            npn = len(_PUNCT_RE.findall(t)) if t else 0
            nup = len(_UPPER_RE.findall(t)) if t else 0
            nc = len(t) if t else 0
            exp = (5 <= nt <= 50000 and 2 * nt <= sl <= 12 * nt
                   and 20 * sh >= nt and 5 * npn <= nc
                   and 10 * nup <= 3 * nc)
            assert bool(got[i]) == exp, (i, t)
        assert bool(got[0]) and not bool(got[1])

    def test_query_shapes(self):
        from dedup_restore_ray.queries import q_quality_filter_docs
        df = q_quality_filter_docs("/root/testdata/sf0.001").to_pandas()
        assert set(df.columns) == {"doc_id", "n_tokens", "kept"}
        assert df.kept.any() and (~df.kept).any()


class TestDecontamination:
    K = 8

    def _naive(self, ids, texts):
        """pure-python reference: md5 split + string k-gram overlap."""
        import hashlib
        from dedup_restore_ray.functions.shingle import tokenize
        split = {}
        grams = {}
        for d, t in zip(ids, texts):
            b = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 10000
            split[d] = "train" if b < 8000 else ("test" if b >= 9000
                                                 else "val")
            toks = tokenize(t)
            grams[d] = {" ".join(toks[i:i + self.K])
                        for i in range(len(toks) - self.K + 1)}
        test_g = set().union(*(grams[d] for d in ids
                               if split[d] == "test")) if ids else set()
        return {d: len(grams[d] & test_g) for d in ids
                if split[d] == "train" and grams[d] & test_g}

    def test_matches_naive_and_layout_independent(self):
        import random
        import ray.data as rd
        from dedup_restore_ray.stages.split import cross_split_contamination
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(50)]
        # force shared passages so some train/test pairs overlap
        passages = [" ".join(rng.choices(vocab, k=12)) for _ in range(8)]
        ids, texts = [], []
        for i in range(120):
            base = " ".join(rng.choices(vocab, k=rng.randint(0, 30)))
            if i % 3 == 0:
                base += " " + passages[i % len(passages)]
            ids.append(i)
            texts.append(base)
        exp = self._naive(ids, texts)
        tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                        "text": pa.array(texts, pa.string())})
        got = (cross_split_contamination(rd.from_arrow(tbl), k=self.K)
               .to_pandas())
        assert dict(zip(got.doc_id, got.n_shared)) == exp
        got2 = (cross_split_contamination(
            rd.from_arrow(tbl).repartition(13), k=self.K).to_pandas())
        assert dict(zip(got2.doc_id, got2.n_shared)) == exp

    def test_short_docs_emit_no_grams(self):
        import ray.data as rd
        from dedup_restore_ray.stages.split import cross_split_contamination
        tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                        "text": pa.array(["one two three"] * 40)})
        got = cross_split_contamination(rd.from_arrow(tbl), k=8).to_pandas()
        assert len(got) == 0


class TestSimhashPairs:
    def test_precision_exact_and_connectivity_recall(self):
        """q_simhash_pairs_docs vs a brute-force popcount over the
        SAME md5-basis signature chain the query (and its SQL oracle)
        derives — precision exact, recall at connectivity level (hot
        buckets emit star+chain)."""
        import numpy as np
        import pyarrow.parquet as pq
        from dedup_restore_ray.config import PipelineConfig
        from dedup_restore_ray.functions.hashing import Md5WordHasher
        from dedup_restore_ray.functions.shingle import (
            ShingleEncoder, arrow_token_hashes)
        from dedup_restore_ray.functions.simhash import (
            popcount64, simhash_signatures)
        from dedup_restore_ray.functions.unionfind import UnionFind
        from dedup_restore_ray.queries import q_simhash_pairs_docs

        sf = "/root/testdata/sf0.001"
        got = q_simhash_pairs_docs(sf).to_pandas()
        cfg = PipelineConfig()
        tbl = pq.read_table(f"{sf}/documents.parquet",
                            columns=["doc_id", "text"])
        enc = ShingleEncoder(k=cfg.shingle_k)
        wh, counts = arrow_token_hashes(
            tbl.column("text").combine_chunks(), Md5WordHasher())
        flat, offs = enc.encode_word_hashes(wh, counts)
        sh = simhash_signatures(flat, offs)
        ids = np.asarray(tbl.column("doc_id"))
        t = cfg.simhash_hamming_threshold
        brute = {}
        for i in range(len(ids)):
            d = popcount64(np.bitwise_xor(sh[i], sh[i + 1:]))
            for j in np.flatnonzero(d <= t):
                a, b = sorted((int(ids[i]), int(ids[i + 1 + j])))
                brute[(a, b)] = int(d[j])
        got_pairs = {(int(r.u), int(r.v)): int(r.hamming)
                     for r in got.itertuples()}
        # precision: every emitted pair is a true Hamming<=t pair
        for p, h in got_pairs.items():
            assert brute.get(p) == h, p
        # recall at connectivity level (hot buckets emit star+chain)
        uf = UnionFind()
        for a, b in got_pairs:
            uf.union(a, b)
        for a, b in brute:
            assert uf.find(a) == uf.find(b), (a, b)
        assert got_pairs, "no simhash pairs found at sf0.001"


# ----------------------------------------------------------------------
# Bloom-prefiltered semi join + snapshot diff (stages/joins.py)
# ----------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
class TestBloomSemiJoin:
    def test_equals_exact_semi_join(self):
        import ray.data as rd
        from dedup_restore_ray.stages.joins import bloom_semi_join, semi_join
        rng = np.random.default_rng(11)
        refs = pa.table({
            "k": pa.array(rng.integers(0, 10_000, 5_000), pa.int64()),
            "payload": pa.array(np.arange(5_000, dtype=np.int64))})
        keys = pa.table({
            "k": pa.array(rng.integers(0, 500, 400), pa.int64())})
        got = bloom_semi_join(rd.from_arrow(refs).repartition(4),
                              rd.from_arrow(keys).repartition(3),
                              "k").to_pandas()
        want = semi_join(rd.from_arrow(refs).repartition(4),
                         rd.from_arrow(keys).repartition(3),
                         "k").to_pandas()
        assert sorted(got.payload) == sorted(want.payload)

    def test_prefilter_prunes_before_shuffle(self):
        """The broadcast bitmap must drop (nearly all) non-member refs
        before the sort — that's the point of the operator."""
        import ray
        import ray.data as rd
        from dedup_restore_ray.functions.bloom import BloomFilter
        from dedup_restore_ray.stages.verify import _id_hashes
        rng = np.random.default_rng(12)
        member = np.arange(100, dtype=np.int64)
        non_member = rng.integers(1_000_000, 9_000_000, 10_000)
        bf = BloomFilter(num_bits=1 << 20)
        bf.add(_id_hashes(member))
        keep = bf.check(_id_hashes(non_member.astype(np.int64)))
        assert keep.mean() < 0.01          # <1% false positives survive
        assert bf.check(_id_hashes(member)).all()   # no false negatives

    def test_string_keys(self):
        import ray.data as rd
        from dedup_restore_ray.stages.joins import bloom_semi_join
        refs = pa.table({"k": pa.array([f"u{i}" for i in range(200)]),
                         "v": pa.array(np.arange(200, dtype=np.int64))})
        keys = pa.table({"k": pa.array([f"u{i}" for i in range(0, 200, 4)])})
        got = bloom_semi_join(rd.from_arrow(refs).repartition(3),
                              rd.from_arrow(keys), "k").to_pandas()
        assert sorted(got.v) == list(range(0, 200, 4))


@pytest.mark.usefixtures("ray_session")
class TestSnapshotDiff:
    def _mk(self, rows):
        import hashlib
        ids = [r[0] for r in rows]
        hs = [hashlib.sha1(r[1].encode()).digest() for r in rows]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "content_hash": pa.array(hs, pa.binary())})

    def test_classification(self):
        import ray.data as rd
        from dedup_restore_ray.stages.joins import snapshot_diff
        old = self._mk([(1, "a"), (2, "b"), (3, "c"), (4, "d")])
        new = self._mk([(2, "b"), (3, "C!"), (4, "d"), (5, "e")])
        got = (snapshot_diff(rd.from_arrow(old).repartition(2),
                             rd.from_arrow(new).repartition(3),
                             "doc_id", "content_hash")
               .to_pandas().sort_values("doc_id"))
        assert dict(zip(got.doc_id, got.change)) == {
            1: "removed", 3: "changed", 5: "added"}

    def test_identical_snapshots_empty(self):
        import ray.data as rd
        from dedup_restore_ray.stages.joins import snapshot_diff
        t = self._mk([(i, f"t{i}") for i in range(50)])
        got = snapshot_diff(rd.from_arrow(t).repartition(4),
                            rd.from_arrow(t).repartition(2),
                            "doc_id", "content_hash").to_pandas()
        assert len(got) == 0


@pytest.mark.usefixtures("ray_session")
class TestHeavyHitters:
    def _run(self, texts, m, n_blocks=6):
        import ray.data as rd
        from dedup_restore_ray.stages.heavy import heavy_hitters
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)})
                           ).repartition(n_blocks)
        return heavy_hitters(ds, m=m).to_pandas()

    def _brute(self, texts, m):
        from collections import Counter

        from dedup_restore_ray.functions.shingle import tokenize
        c = Counter()
        for t in texts:
            c.update(tokenize(t))
        n = sum(c.values())
        return {v: k for v, k in c.items() if k * m > n}

    def test_matches_brute_force(self):
        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(200)]
        texts = [" ".join(rng.choice(vocab, 40)) + " hot hot"
                 for _ in range(50)]
        got = self._run(texts, m=50)
        want = self._brute(texts, m=50)
        assert dict(zip(got.value, got.n_occurrences)) == want

    def test_spread_hitter_found(self):
        """A value just over N/m globally but spread evenly across
        blocks must still surface (the pigeonhole superset at work) —
        and locally-loud-but-globally-light values must NOT."""
        # 60 docs in 6 blocks; 'ubiq' once per doc; 'loud' 30x in one doc
        texts = ["ubiq " + " ".join(f"u{i}_{j}" for j in range(20))
                 for i in range(60)]
        texts[0] += " loud" * 30
        m = 25                      # N ~= 60*21+30 => N/m ~= 52
        got = self._run(texts, m=m)
        want = self._brute(texts, m=m)
        assert dict(zip(got.value, got.n_occurrences)) == want
        assert "ubiq" in set(got.value)
        assert "loud" not in set(got.value)

    def test_no_hitters(self):
        texts = [" ".join(f"a{i}_{j}" for j in range(30))
                 for i in range(20)]
        got = self._run(texts, m=10)
        assert len(got) == 0


@pytest.mark.usefixtures("ray_session")
class TestZoneMap:
    @pytest.fixture(scope="class")
    def store(self, tmp_path_factory):
        import ray.data as rd
        from dedup_restore_ray.state.zonemap import ZoneMapStore
        rng = np.random.default_rng(5)
        n = 20_000
        t = pa.table({
            "ts_epoch": pa.array(rng.integers(0, 1_000_000, n),
                                 pa.int64()),
            "k": pa.array(np.arange(n, dtype=np.int64))})
        root = str(tmp_path_factory.mktemp("zm") / "store")
        s = ZoneMapStore.build(rd.from_arrow(t).repartition(8), root,
                               "ts_epoch", num_zones=16)
        return s, t

    def test_prunes_and_matches_brute_force(self, store):
        s, t = store
        lo, hi = 100_000, 199_999       # ~10% of the range
        ds, stats = s.read_range(lo, hi)
        assert stats["zones_read"] < stats["zones_total"]
        got = sorted(ds.to_pandas().k)
        ep = t["ts_epoch"].to_numpy()
        want = sorted(t["k"].to_numpy()[(ep >= lo) & (ep <= hi)])
        assert got == want

    def test_empty_range_reads_nothing(self, store):
        s, _ = store
        ds, stats = s.read_range(2_000_000, 3_000_000)
        assert stats["zones_read"] == 0

    def test_meta_reuse(self, store):
        import ray.data as rd
        from dedup_restore_ray.state.zonemap import ZoneMapStore
        s, t = store
        again = ZoneMapStore.build(rd.from_arrow(t), s.root,
                                   "ts_epoch", num_zones=16)
        assert again.meta == s.meta


@pytest.mark.usefixtures("ray_session")
class TestWeightedSample:
    def test_matches_brute_force_and_layout_independent(self, sf_dir):
        from dedup_restore_ray.functions.sketch import kmv_hash
        from dedup_restore_ray.queries import q_weighted_sample_docs
        got = q_weighted_sample_docs(sf_dir, k=25)
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
        u = ((kmv_hash(docs["doc_id"].tolist()).astype(np.float64)
              + 0.5) / 2.0**64)
        docs["pri"] = np.log(u) / (docs["n_chars"] + 1.0)
        exp = (docs.sort_values(["pri", "doc_id"],
                                ascending=[False, True])
               .head(25)[["doc_id", "n_chars"]].reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

    def test_weight_bias(self):
        """A doc with overwhelming weight must be sampled; tiny-weight
        docs must not crowd it out (Efraimidis-Spirakis property)."""
        import ray.data as rd
        from dedup_restore_ray.functions.sketch import kmv_hash
        ids = np.arange(200, dtype=np.int64)
        w = np.ones(200, dtype=np.int64)
        w[7] = 10_000_000
        u = (kmv_hash(ids.tolist()).astype(np.float64) + 0.5) / 2.0**64
        pri = np.log(u) / (w + 1.0)
        top = np.argsort(-pri)[:10]
        assert 7 in top


class TestSampleQuantileSketch:
    def test_mergeability_and_error_bound(self):
        """Bottom-k of concatenated block bottom-ks == global bottom-k
        (mergeable by construction); rank error of the k=512 sketch vs
        the exact quantile stays small on a skewed 20k corpus."""
        from dedup_restore_ray.functions.sketch import (
            sample_quantile_candidates, sample_quantile_estimate)
        rng = np.random.default_rng(17)
        n, k = 20_000, 512
        ids = rng.permutation(n).astype(np.int64)
        vals = np.round(rng.lognormal(5, 1.5, n)).astype(np.int64)

        # split into 7 uneven blocks, collect per-block candidates
        cuts = np.sort(rng.choice(np.arange(1, n), 6, replace=False))
        parts = np.split(np.arange(n), cuts)
        hvs, cids, cvals = [], [], []
        for p in parts:
            h, i, v = sample_quantile_candidates(ids[p], vals[p], k)
            hvs.append(h); cids.append(i); cvals.append(v)
        est, ns = sample_quantile_estimate(
            np.concatenate(hvs), np.concatenate(cids),
            np.concatenate(cvals), k, [0.25, 0.5, 0.9])
        assert ns == k

        # single-pass global sketch must agree exactly (mergeability)
        h, i, v = sample_quantile_candidates(ids, vals, k)
        est2, _ = sample_quantile_estimate(h, i, v, k, [0.25, 0.5, 0.9])
        assert est == est2

        # rank error vs exact: the sketch value's true CDF position
        # must be within ~2.5/sqrt(k) of the target quantile
        sv = np.sort(vals)
        for q, e in zip([0.25, 0.5, 0.9], est):
            rank = np.searchsorted(sv, e) / n
            assert abs(rank - q) < 2.5 / np.sqrt(k), (q, rank)

    def test_layout_independence(self, ray_session, sf_dir):
        from dedup_restore_ray.queries import q_approx_quantile_nchars
        a = q_approx_quantile_nchars(sf_dir)
        b = q_approx_quantile_nchars(sf_dir)  # plan re-executed fresh
        pd.testing.assert_frame_equal(a, b)
        assert (a["n_sample"] == 256).all()


@pytest.mark.usefixtures("ray_session")
class TestGroupedAggregateSkewGuard:
    @pytest.mark.parametrize("num_blocks", [1, 9])
    def test_hot_key_spanning_all_blocks(self, num_blocks):
        """One key holds 70% of all rows (guaranteed to span blocks and
        take the residual path); integer pre-agg results must equal
        brute-force pandas for sum/min/max/count."""
        import ray.data as rd
        from dedup_restore_ray.stages.groups import grouped_aggregate
        rng = np.random.default_rng(21)
        n = 4000
        k = np.where(rng.random(n) < 0.7, 7,
                     rng.integers(0, 50, n)).astype(np.int64)
        v = rng.integers(-1000, 1000, n).astype(np.int64)
        df = pd.DataFrame({"k": k, "v": v})
        got = (grouped_aggregate(
                   rd.from_pandas(df).repartition(num_blocks), ["k"],
                   {"s": ("v", "sum"), "mn": ("v", "min"),
                    "mx": ("v", "max")}, count_alias="n")
               .to_pandas().sort_values("k").reset_index(drop=True))
        exp = (df.groupby("k", as_index=False)
               .agg(s=("v", "sum"), mn=("v", "min"), mx=("v", "max"),
                    n=("v", "size")))
        exp["n"] = exp["n"].astype("int64")
        exp = exp.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)

    def test_float_path_unchanged(self):
        """Float inputs keep the row-level residual (no pre-agg float
        reordering): results still match pandas to float equality on
        a value set where order effects would be visible at 1 ulp."""
        import ray.data as rd
        from dedup_restore_ray.stages.groups import grouped_aggregate
        rng = np.random.default_rng(4)
        df = pd.DataFrame({"k": rng.integers(0, 5, 300).astype(np.int64),
                           "v": rng.uniform(0, 1, 300)})
        got = (grouped_aggregate(rd.from_pandas(df).repartition(6),
                                 ["k"], {"mn": ("v", "min"),
                                         "mx": ("v", "max")})
               .to_pandas().sort_values("k").reset_index(drop=True))
        exp = (df.groupby("k", as_index=False)
               .agg(mn=("v", "min"), mx=("v", "max"))
               .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)


class TestEditDistance:
    def test_known_distances(self):
        from dedup_restore_ray.functions.editdist import levenshtein
        assert levenshtein("", "") == 0
        assert levenshtein("abc", "") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("flaw", "lawn") == 2
        assert levenshtein("abc", "abc") == 0
        assert levenshtein("ab", "ba") == 2

    def test_random_parity_vs_duckdb(self):
        import duckdb
        import random
        from dedup_restore_ray.functions.editdist import levenshtein
        con = duckdb.connect()
        random.seed(7)
        for _ in range(80):
            a = "".join(random.choice("abcd e") for _ in
                        range(random.randint(0, 40)))
            b = "".join(random.choice("abcd e") for _ in
                        range(random.randint(0, 40)))
            want = con.sql("SELECT levenshtein($1, $2)",
                           params=[a, b]).fetchone()[0]
            assert levenshtein(a, b) == want, (a, b)

    @pytest.mark.usefixtures("ray_session")
    def test_blocked_pairs_layout_independent(self, sf_dir):
        from dedup_restore_ray.queries import q_editdist_pairs_docs
        a = q_editdist_pairs_docs(sf_dir)
        b = q_editdist_pairs_docs(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        assert (a["dist"] <= 20).all()
        assert (a["id_a"] < a["id_b"]).all()


@pytest.mark.usefixtures("ray_session")
class TestTrigramIndex:
    @pytest.fixture(scope="class")
    def idx(self, tmp_path_factory):
        import ray.data as rd
        from dedup_restore_ray.stages.trigram import TrigramIndex
        texts = ["the quick brown fox", "quick silver lining",
                 "a brown cow", "fox hunting season", "nothing here",
                 "the quick brown dog", ""]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        ds = rd.from_arrow(t).repartition(3)
        root = str(tmp_path_factory.mktemp("tg") / "idx")
        return TrigramIndex.build(ds, root, num_buckets=8), ds, texts

    def test_append_equals_rebuild(self, ray_session, tmp_path):
        import ray.data as rd
        from dedup_restore_ray.stages.trigram import TrigramIndex
        texts = ["the quick brown fox", "quick silver lining",
                 "a brown cow", "fox hunting season", "nothing here",
                 "the quick brown dog", "brown fox redux"]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        ds = rd.from_arrow(t)
        base = rd.from_arrow(t.slice(0, 4)).repartition(2)
        extra = rd.from_arrow(t.slice(4)).repartition(2)
        inc = TrigramIndex.build(base, str(tmp_path / "inc"),
                                 num_buckets=8)
        assert inc.append(extra) > 0
        full = TrigramIndex.build(ds, str(tmp_path / "full"),
                                  num_buckets=8)
        assert inc.num_rows == full.num_rows
        for pat in ["quick brown", "brown fox", "zzzq"]:
            a, _ = inc.search(pat, ds)
            b, _ = full.search(pat, ds)
            pa_df, pb_df = a.to_pandas(), b.to_pandas()
            ga = sorted(pa_df["doc_id"]) if "doc_id" in pa_df.columns \
                else []
            gb = sorted(pb_df["doc_id"]) if "doc_id" in pb_df.columns \
                else []
            want = [i for i, txt in enumerate(texts) if pat in txt]
            assert ga == gb == want, (pat, ga, gb, want)

    def test_search_matches_brute_force(self, idx):
        index, ds, texts = idx
        for pat in ["quick brown", "brown", "fox", "season",
                    "quick brown fox"]:
            hits, m = index.search(pat, ds)
            pdf = hits.to_pandas()
            got = sorted(pdf["doc_id"]) if "doc_id" in pdf.columns else []
            want = [i for i, t in enumerate(texts) if pat in t]
            assert got == want, (pat, got, want)
            assert m["partitions_read"] <= m["partitions_total"]

    def test_absent_pattern_empty(self, idx):
        index, ds, _ = idx
        hits, m = index.search("zzzq", ds)
        assert hits.count() == 0

    def test_candidates_are_superset(self, idx):
        index, ds, texts = idx
        cand, _ = index.candidates("quick brown")
        ids = set(cand.to_pandas()["doc_id"])
        want = {i for i, t in enumerate(texts) if "quick brown" in t}
        assert want <= ids

    def test_meta_reuse(self, idx):
        from dedup_restore_ray.stages.trigram import TrigramIndex
        import ray.data as rd
        index, ds, _ = idx
        again = TrigramIndex.build(ds, index.index_dir, num_buckets=8)
        assert again.num_rows == index.num_rows


@pytest.mark.usefixtures("ray_session")
class TestRegexAndTrend:
    def test_regex_hits_all_contain_match(self, sf_dir):
        import re
        from dedup_restore_ray.queries import q_regex_search_docs
        got = q_regex_search_docs(sf_dir)
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        rx = re.compile("merge (batch|order)")
        want = sorted(docs.doc_id[docs.text.map(
            lambda t: rx.search(t) is not None)])
        assert sorted(got.doc_id) == want

    def test_trend_matches_numpy_lstsq_sign(self, sf_dir):
        from dedup_restore_ray.queries import q_user_value_trend
        got = q_user_value_trend(sf_dir)
        assert (got["slope_den"] > 0).all()
        ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "value"])
        u0 = int(got.user_id.iloc[0])
        g = ev[ev.user_id == u0]
        x = (g.ts.values.astype("datetime64[us]").astype(np.int64)
             // 1_000_000 - 1704067200).astype(np.float64)
        y = np.round(g.value.values * 100).astype(np.float64)
        slope = np.polyfit(x, y, 1)[0]
        r = got[got.user_id == u0].iloc[0]
        assert abs(r.slope_num / r.slope_den - slope) < 1e-6 * max(
            1.0, abs(slope))


@pytest.mark.usefixtures("ray_session")
class TestZoneMapAppend:
    def test_append_parity_and_out_of_range_clamp(self, tmp_path):
        import ray.data as rd
        from dedup_restore_ray.state.zonemap import ZoneMapStore
        rng = np.random.default_rng(8)
        base = pa.table({
            "ts_epoch": pa.array(rng.integers(0, 1000, 500), pa.int64()),
            "k": pa.array(np.arange(500, dtype=np.int64))})
        # appended rows include values OUTSIDE the built range
        extra = pa.table({
            "ts_epoch": pa.array(
                np.concatenate([rng.integers(0, 1000, 200),
                                [-50, 1500]]).astype(np.int64)),
            "k": pa.array(np.arange(500, 702, dtype=np.int64))})
        root = str(tmp_path / "zm")
        s = ZoneMapStore.build(rd.from_arrow(base).repartition(4),
                               root, "ts_epoch", num_zones=8)
        n = s.append(rd.from_arrow(extra).repartition(3))
        assert n == 202
        full = pd.concat([base.to_pandas(), extra.to_pandas()])
        for lo, hi in [(100, 299), (-100, 0), (900, 2000)]:
            ds, stats = s.read_range(lo, hi)
            pdf = ds.to_pandas()
            got = sorted(pdf["k"]) if "k" in pdf.columns else []
            want = sorted(full.k[(full.ts_epoch >= lo)
                                 & (full.ts_epoch <= hi)])
            assert got == want, (lo, hi)
        # meta rows account for every row
        assert sum(z["rows"] for z in s.zones) == 702
