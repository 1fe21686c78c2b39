"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-dup pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator
(SURVEY.md §2 inventory + the training-data operators);
``oracle_sql()`` gives DuckDB equivalents for the SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents ->
    signatures -> exact dedup -> LSH/simhash/substring candidates ->
    exact-Jaccard verify -> clustering -> assignments."""
    from dedup_restore_ray.config import PipelineConfig
    from dedup_restore_ray.pipelines.dedup import dedup_pipeline
    from dedup_restore_ray.sources.io import read_parquet_clean

    ds = read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    res = dedup_pipeline(ds, PipelineConfig(), id_col="doc_id",
                         text_col="text")
    return res.assignments


def queries() -> dict[str, Callable[[str], Any]]:
    from dedup_restore_ray.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dedup_restore_ray.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
