"""End-to-end pipeline tests on the synthetic page corpus + testdata."""

import numpy as np
import pandas as pd
import pytest

from dedup_restore_ray.config import PipelineConfig
from dedup_restore_ray.functions.jaccard import jaccard_sorted
from dedup_restore_ray.functions.shingle import ShingleEncoder


@pytest.mark.usefixtures("ray_session")
class TestFlagship:
    @pytest.fixture(scope="class")
    def result(self, pages_corpus):
        import ray.data as rd
        from dedup_restore_ray.pipelines.dedup import dedup_pipeline
        pages, truth = pages_corpus
        res = dedup_pipeline(rd.from_arrow(pages), PipelineConfig(),
                             id_col="url", text_col="text", html_col="html")
        return pages, truth, res, res.assignments.to_pandas()

    def test_every_row_assigned_exactly_once(self, result):
        pages, truth, res, out = result
        # reference invariant: dup + unique == total (src/optsmr.c:316-332)
        assert len(out) == pages.num_rows
        assert out["doc_id"].is_unique
        assert out["cluster_id"].notna().all()

    def test_dup_plus_unique_is_total(self, result):
        pages, truth, res, out = result
        from dedup_restore_ray.pipelines.dedup import dedup_stats
        stats = dedup_stats(res.assignments)
        assert stats["dup"] + stats["unique"] == stats["total"] == pages.num_rows

    def test_exact_dups_share_cluster(self, result):
        pages, truth, res, out = result
        texts = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
        cl = dict(zip(out.doc_id, out.cluster_id))
        by_text = {}
        for u, t in texts.items():
            if t:
                by_text.setdefault(t, []).append(u)
        for t, urls in by_text.items():
            if len(urls) > 1:
                assert len({cl[u] for u in urls}) == 1

    def test_recall_vs_exact_jaccard_oracle(self, result):
        """The BASELINE gate: dup-pair recall >= 0.99 vs brute-force
        exact-Jaccard oracle at the same shingle/signature config."""
        pages, truth, res, out = result
        from dedup_restore_ray.pipelines.dedup import ExtractText
        cfg = PipelineConfig()
        ex = ExtractText()
        urls = pages["url"].to_pylist()
        texts = [t if t is not None else ex.extract_one(h)
                 for t, h in zip(pages["text"].to_pylist(),
                                 pages["html"].to_pylist())]
        enc = ShingleEncoder(k=cfg.shingle_k, seed=cfg.minhash_seed)
        flat, off = enc.encode(texts)
        sets = [flat[off[i]:off[i + 1]] for i in range(len(urls))]
        cl = dict(zip(out.doc_id, out.cluster_id))
        n = len(urls)
        oracle = hits = 0
        for i in range(n):
            for j in range(i + 1, n):
                if jaccard_sorted(sets[i], sets[j]) >= cfg.jaccard_threshold:
                    oracle += 1
                    hits += cl[urls[i]] == cl[urls[j]]
        assert oracle > 100
        assert hits / oracle >= 0.99

    def test_cluster_ids_are_member_ids(self, result):
        pages, truth, res, out = result
        # cluster id = min doc_id of the component -> must be a real doc id
        ids = set(out.doc_id)
        assert set(out.cluster_id) <= ids

    def test_verified_pairs_meet_threshold(self, result):
        pages, truth, res, out = result
        vp = res.verified_pairs.to_pandas()
        assert (vp["jaccard"] >= PipelineConfig().jaccard_threshold).all()


@pytest.mark.usefixtures("ray_session")
class TestDocumentsTable:
    def test_runs_on_int64_ids(self, sf_dir):
        import ray.data as rd
        from dedup_restore_ray.pipelines.dedup import dedup_pipeline
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
        res = dedup_pipeline(ds, PipelineConfig(), id_col="doc_id",
                             text_col="text")
        out = res.assignments.to_pandas()
        assert len(out) == 500
        assert out["doc_id"].is_unique


@pytest.mark.usefixtures("ray_session")
class TestExactDedupStage:
    def test_first_wins_semantics(self):
        import ray.data as rd
        from dedup_restore_ray.stages.exact import exact_dedup
        rows = [{"content_hash": b"A" * 20, "doc_id": i} for i in (5, 3, 9)]
        rows += [{"content_hash": b"B" * 20, "doc_id": 7}]
        out = exact_dedup(rd.from_items(rows)).to_pandas()
        canon = dict(zip(out.doc_id, out.canonical_id))
        assert canon[5] == canon[3] == canon[9] == 3   # min id wins
        assert canon[7] == 7
        assert out.set_index("doc_id")["is_dup"].to_dict() == {
            3: False, 5: True, 9: True, 7: False}


@pytest.mark.usefixtures("ray_session")
class TestHotBucketSkew:
    def test_salted_star_chain_preserves_clustering(self):
        """A bucket larger than max_bucket_pairs takes the salted
        star+chain path (north_rule skew handling) — connectivity must
        survive the O(n) edge subset."""
        import ray.data as rd
        from dedup_restore_ray.pipelines.dedup import dedup_pipeline
        from dedup_restore_ray.sources.pages import generate_pages
        cfg = PipelineConfig()
        pages, truth = generate_pages(200, seed=42,
                                      hot_bucket_size=cfg.max_bucket_pairs * 2)
        res = dedup_pipeline(rd.from_arrow(pages), cfg, id_col="url",
                             text_col="text", html_col="html")
        out = res.assignments.to_pandas()
        tr = truth.to_pandas()
        m = out.merge(tr, left_on="doc_id", right_on="url")
        hot = m[m.kind == "boilerplate"]
        assert len(hot) == cfg.max_bucket_pairs * 2
        assert hot["cluster_id"].nunique() == 1


class TestGroupPairIndices:
    def test_hot_bucket_spanning_connectivity(self):
        from dedup_restore_ray.stages.groups import group_pair_indices
        from dedup_restore_ray.functions.unionfind import connected_component_labels
        n, cap, salts = 500, 64, 16
        iu, iv = group_pair_indices(0, n, cap, salts)
        # O(n) edges, not O(n^2)
        assert len(iu) == n - 1
        labels = connected_component_labels(list(zip(iu.tolist(), iv.tolist())))
        assert set(labels.values()) == {0}
        assert len(labels) == n

    def test_small_bucket_all_pairs(self):
        from dedup_restore_ray.stages.groups import group_pair_indices
        iu, iv = group_pair_indices(10, 14, 64, 16)
        assert len(iu) == 6           # C(4,2)
        assert all(u < v for u, v in zip(iu, iv))


@pytest.mark.usefixtures("ray_session")
class TestScaleModeParity:
    def test_scale_and_broadcast_paths_agree(self, pages_corpus):
        """Force scale_mode (full-shuffle exact dedup, scatter verify,
        distributed clustering) and require cluster assignments
        identical to the broadcast path."""
        import ray.data as rd
        from dedup_restore_ray.pipelines.dedup import dedup_pipeline
        pages, _ = pages_corpus
        ds = rd.from_arrow(pages)
        normal = dedup_pipeline(ds, PipelineConfig(), id_col="url",
                                text_col="text", html_col="html")
        tiny_limit = PipelineConfig(broadcast_limit=10)
        scaled = dedup_pipeline(rd.from_arrow(pages), tiny_limit,
                                id_col="url", text_col="text",
                                html_col="html",
                                cluster_strategy="distributed")
        a = normal.assignments.to_pandas().sort_values("doc_id")
        b = scaled.assignments.to_pandas().sort_values("doc_id")
        assert scaled.metrics["scale_mode"] is True
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["canonical_id"].tolist() == b["canonical_id"].tolist()
        assert a["cluster_id"].tolist() == b["cluster_id"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestDeterminism:
    def test_flagship_identical_across_runs(self, pages_corpus):
        import ray.data as rd
        from dedup_restore_ray.pipelines.dedup import dedup_pipeline
        pages, _ = pages_corpus
        outs = []
        for _ in range(2):
            res = dedup_pipeline(rd.from_arrow(pages), PipelineConfig(),
                                 id_col="url", text_col="text",
                                 html_col="html")
            outs.append(res.assignments.to_pandas()
                        .sort_values("doc_id").reset_index(drop=True))
        assert outs[0].equals(outs[1])


@pytest.mark.usefixtures("ray_session")
class TestGoldenRegression:
    def test_assignments_match_golden(self, pages_corpus):
        """Committed golden fixture (FIXTURES.md F4): flagship output
        on the 300-doc corpus is bit-stable across sessions.  If a
        deliberate algorithm change shifts results, regenerate the
        golden (tests/golden/) in the same commit and say why."""
        import os
        import pyarrow.parquet as pq
        import ray.data as rd
        from dedup_restore_ray.pipelines.dedup import dedup_pipeline
        golden_path = os.path.join(os.path.dirname(__file__), "golden",
                                   "assignments_300.parquet")
        golden = pq.read_table(golden_path).to_pandas()
        pages, _ = pages_corpus
        res = dedup_pipeline(rd.from_arrow(pages), PipelineConfig(),
                             id_col="url", text_col="text", html_col="html")
        out = (res.assignments.to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out.equals(golden)


class TestExtractTextStitch:
    def test_null_rows_extracted_others_untouched(self):
        """The null path extracts ONLY the null rows through Python and
        stitches them back with one Arrow take — mixed null/non-null
        batches (including unicode and chunked columns) must come out
        byte-identical to the all-Python reference."""
        import pyarrow as pa
        from dedup_restore_ray.pipelines.dedup import ExtractText
        ex = ExtractText()
        texts = ["plain text", None, "ünïcode tëxt", None, "", None]
        htmls = [None, b"<p>Hello <b>World</b></p>", None,
                 b"<div>\xc3\xbcml\xc3\xa4ut</div>", None, b""]
        batch = pa.table({
            "text": pa.chunked_array([texts[:3], texts[3:]], pa.string()),
            "html": pa.array(htmls, pa.binary())})
        out = ex(batch).column("text").to_pylist()
        expect = [t if t is not None else ex.extract_one(h)
                  for t, h in zip(texts, htmls)]
        assert out == expect

    def test_all_null_and_no_null(self):
        import pyarrow as pa
        from dedup_restore_ray.pipelines.dedup import ExtractText
        ex = ExtractText()
        allnull = pa.table({"text": pa.array([None, None], pa.string()),
                            "html": pa.array([b"<i>a</i>", b"<b>b</b>"])})
        assert ex(allnull).column("text").to_pylist() == ["a", "b"]
        nonull = pa.table({"text": pa.array(["x", "y"]),
                           "html": pa.array([None, None], pa.binary())})
        assert ex(nonull).column("text").to_pylist() == ["x", "y"]
