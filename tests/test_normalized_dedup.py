"""Aggressive-normalization dedup: Arrow's NFC/lower/RE2 pipeline must
agree with DuckDB's nfc_normalize/lower/regexp_replace on planted
non-NFC unicode, mixed case and whitespace runs."""

import duckdb
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
class TestNormalizedDedup:
    def test_unicode_parity_with_duckdb(self, tmp_path):
        # "Café" precomposed (NFC) vs decomposed (NFD e + U+0301);
        # case + whitespace-run variants; a genuinely distinct doc.
        texts = [
            "Café au lait",          # NFC
            "Café au lait",         # NFD -> same after NFC
            "CAFÉ   au\tlait",       # case + runs -> same
            "  café au lait \n",     # leading/trailing -> same
            "tea with milk",              # distinct
            "tea  WITH milk",             # run+case variant of above
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                           "lang": "fr", "source": "t",
                           "n_chars": [len(t) for t in texts]})
        p = tmp_path / "documents.parquet"
        df.to_parquet(p)
        from dedup_restore_ray.queries import (ORACLE_SQL,
                                               q_normalized_dedup_docs)
        got = (q_normalized_dedup_docs(str(tmp_path)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
        want = (con.execute(ORACLE_SQL["normalized_dedup_docs"]).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"is_dup": bool}), want[got.columns].astype(
                {"is_dup": bool}))
        # the planted clusters: 0-3 collapse, 4-5 collapse
        assert got["canonical_id"].tolist() == [0, 0, 0, 0, 4, 4]
