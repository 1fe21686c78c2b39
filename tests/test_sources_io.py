"""CSV / JSON-Lines ingestion round-trips: clean metadata-free blocks,
column projection, end-to-end compatibility with the dedup pipeline,
and the JSONL sink round-trip."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.fixture()
def doc_frame():
    rng = np.random.default_rng(7)
    n = 120
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"doc {i} body word{int(rng.integers(0, 9))}"
                 for i in range(n)],
        "extra": np.arange(n) * 2,
    })


class TestCsvJsonlSources:
    def test_csv_roundtrip_projection_and_clean_schema(
            self, ray_session, doc_frame, tmp_path):
        from dedup_restore_ray.sources.io import read_csv_clean
        p = str(tmp_path / "docs.csv")
        doc_frame.to_csv(p, index=False)
        ds = read_csv_clean(p, columns=["doc_id", "text"])
        tbl = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")])
        assert tbl.schema.metadata is None
        assert tbl.column_names == ["doc_id", "text"]
        got = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, doc_frame[["doc_id", "text"]], check_dtype=False)

    def test_jsonl_roundtrip_and_sink(self, ray_session, doc_frame,
                                      tmp_path):
        from dedup_restore_ray.sources.io import (read_jsonl_clean,
                                                  write_jsonl)
        src = str(tmp_path / "docs.jsonl")
        doc_frame.to_json(src, orient="records", lines=True)
        ds = read_jsonl_clean(src, columns=["doc_id", "text"])
        got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, doc_frame[["doc_id", "text"]], check_dtype=False)

        out_dir = str(tmp_path / "export")
        os.makedirs(out_dir, exist_ok=True)
        write_jsonl(ds, out_dir)
        back = rd.read_json(out_dir).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            back[["doc_id", "text"]],
            doc_frame[["doc_id", "text"]], check_dtype=False)

    def test_jsonl_feeds_dedup_pipeline(self, ray_session, tmp_path):
        from dedup_restore_ray.config import PipelineConfig
        from dedup_restore_ray.pipelines.dedup import (dedup_pipeline,
                                                       dedup_stats)
        from dedup_restore_ray.sources.io import read_jsonl_clean
        # planted exact duplicates through the JSONL boundary
        rows = []
        for i in range(60):
            body = f"the quick brown fox {i % 20} jumps over dog {i % 20}"
            rows.append({"doc_id": i, "text": body})
        src = str(tmp_path / "dup.jsonl")
        pd.DataFrame(rows).to_json(src, orient="records", lines=True)
        ds = read_jsonl_clean(src)
        res = dedup_pipeline(ds, PipelineConfig(), id_col="doc_id",
                             text_col="text")
        st = dedup_stats(res.assignments)
        assert st["total"] == 60 and st["unique"] == 20
