"""End-to-end LLM data-prep composition (pipelines/prep.py): planted
low-quality, foreign-language, duplicate, near-duplicate and
contaminated documents must each fall out at the right stage, and the
manifest must account for every loss."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


GOOD = ("the quick brown fox jumps over the lazy dog while the old "
        "miller waits by the river and the children watch from the "
        "wooden bridge in the morning light with quiet wonder "
        "then the bell rings across the valley and the farmers come "
        "home from the long fields carrying baskets of grain while "
        "the evening sun settles slowly behind the distant hills")


def _corpus():
    rows = []
    # 20 distinct good english docs
    for i in range(20):
        rows.append((i, GOOD + f" chapter {i} tells a new story about "
                     f"village number {i} and its people"))
    # exact duplicate of doc 0
    rows.append((100, rows[0][1]))
    # near duplicate of doc 1 (one word changed)
    rows.append((101, rows[1][1].replace("quiet wonder",
                                         "quiet wonder indeed")))
    # low quality: too few tokens
    rows.append((102, "tiny doc"))
    # low quality: no stopwords / gibberish
    rows.append((103, " ".join("zqxj" for _ in range(40))))
    # foreign language (spanish stopword profile dominates) with just
    # enough EN stopwords sprinkled in to clear the Gopher rule, so
    # it reaches and is dropped by the LANGID stage, not quality
    rows.append((104, "el perro corre por la calle y la casa es "
                 "grande pero el gato duerme en la cama con la "
                 "manta roja durante la tarde de verano and the "
                 "and the and the"))
    # contaminated: shares a long 5-gram window with the test doc
    rows.append((105, GOOD + " unique benchmark sentinel passage "
                 "alpha beta gamma delta epsilon zeta"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


class TestPrepCorpus:
    def test_stage_accounting_and_survivors(self, ray_session):
        from dedup_restore_ray.pipelines.prep import prep_corpus
        df = _corpus()
        test_df = pd.DataFrame({
            "doc_id": [0],
            "text": ["the benchmark contains unique benchmark "
                     "sentinel passage alpha beta gamma delta "
                     "epsilon zeta here"]})
        res = prep_corpus(rd.from_pandas(df).repartition(3),
                          test_docs=rd.from_pandas(test_df),
                          shard_capacity=256)
        m = res.manifest
        assert m["input"] == len(df)
        # quality drops 102 (short) and 103 (no stopwords)
        assert m["after_quality"] == len(df) - 2
        # langid drops the spanish doc
        assert m["after_langid"] == m["after_quality"] - 1
        # dedup drops the exact dup AND the near dup
        assert m["after_dedup"] == m["after_langid"] - 2
        # decontamination drops the sentinel-sharing doc
        assert m["after_decontaminate"] == m["after_dedup"] - 1
        assert m["output"] == m["after_decontaminate"]
        out = res.docs.to_pandas()
        survivors = set(out["doc_id"])
        assert survivors == set(range(20))
        # shard packing: contiguous ids, every shard <= capacity+max doc
        assert m["n_shards"] >= 2
        assert m["total_tokens"] == int(out["n_tokens"].sum())
        assert set(out["shard_id"]) == set(range(m["n_shards"]))

    def test_no_test_docs_skips_decontamination(self, ray_session):
        from dedup_restore_ray.pipelines.prep import prep_corpus
        df = _corpus()
        res = prep_corpus(rd.from_pandas(df), target_lang=None)
        m = res.manifest
        # no language filter: spanish doc survives quality
        assert m["after_langid"] == m["after_quality"]
        assert m["after_decontaminate"] == m["after_dedup"]


@pytest.mark.usefixtures("ray_session")
class TestEmptyAndSkipQuality:
    def test_dedup_pipeline_empty_input(self):
        import pyarrow as pa
        import ray.data as rd
        from dedup_restore_ray.config import PipelineConfig
        from dedup_restore_ray.pipelines.dedup import dedup_pipeline
        empty = rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string())}))
        res = dedup_pipeline(empty, PipelineConfig())
        assert res.assignments.count() == 0
        assert res.verified_pairs.count() == 0
        assert res.metrics["total"] == 0

    def test_prep_all_docs_filtered_out(self):
        # gopher-failing corpus: quality filter drops EVERY doc and
        # the chain must complete with an all-zero manifest
        import pyarrow as pa
        import ray.data as rd
        from dedup_restore_ray.pipelines.prep import prep_corpus
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(["zzz"] * 20)}))
        res = prep_corpus(docs)
        assert res.manifest["after_quality"] == 0
        assert res.manifest["output"] == 0

    def test_quality_false_keeps_everything(self):
        import pyarrow as pa
        import ray.data as rd
        from dedup_restore_ray.pipelines.prep import prep_corpus
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array([f"zzq wkj qpl {i}" for i in range(30)])}))
        res = prep_corpus(docs, quality=False, target_lang=None)
        assert res.manifest["after_quality"] == 30
        assert res.manifest["output"] == 30
