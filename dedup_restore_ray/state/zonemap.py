"""Zone-mapped partitioned storage — skip partitions by min/max.

The reference prunes container reads by grouping physically co-located
chunks (src/look_ahead.c:710-793); the columnar re-expression is the
classic zone map: cluster the table on one column, record each
partition's TRUE (min, max, rows) in a meta manifest, and serve range
reads that only open overlapping partitions.  At 100 TB a 3-day scan
of a year-partitioned event store reads ~1% of the files; everything
else is pruned by ~KBs of driver-resident metadata.

Build = one histogram-style (min, max) partials pass to fix the zone
width, one grouped (min, max, count) aggregate for the TRUE per-zone
bounds (num_zones rows reach the driver), and ONE sort feeding a
partitioned Parquet write (the IVF/invindex file-layout lesson: sort
by the partition column first or every block fans out into every
partition directory).

The zone column must be int64 (cast timestamps to epoch seconds
first); values cluster by RANGE, so reads prune only when the filter
column is the clustering column — same contract as any zone map.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data as rd

META_NAME = "meta.json"
SCHEMA_VERSION = 1


class ZoneMapStore:
    def __init__(self, root: str, meta: dict):
        self.root = root
        self.meta = meta
        self.zones = meta["zones"]          # [{zone, zmin, zmax, rows}]

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, ds: "rd.Dataset", root: str, zone_col: str,
              num_zones: int = 32) -> "ZoneMapStore":
        """Cluster ``ds`` on int64 ``zone_col`` into ``num_zones``
        equi-width range partitions under ``root``.  Reusable across
        runs via the meta manifest (same contract as the inverted
        index / IVF stores)."""
        meta_path = os.path.join(root, META_NAME)
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
            if (meta.get("schema") == SCHEMA_VERSION
                    and meta.get("zone_col") == zone_col
                    and meta.get("num_zones") == num_zones):
                return cls(root, meta)
        if os.path.isdir(root):
            # a partitioned write does not remove stale files
            shutil.rmtree(root)

        def mm(b: pa.Table) -> pa.Table:
            v = np.asarray(b.column(zone_col), dtype=np.int64)
            if len(v) == 0:
                return pa.table({"lo": pa.array([], pa.int64()),
                                 "hi": pa.array([], pa.int64())})
            return pa.table({"lo": pa.array([int(v.min())]),
                             "hi": pa.array([int(v.max())])})

        parts = (ds.select_columns([zone_col])
                 .map_batches(mm, batch_format="pyarrow").to_pandas())
        lo, hi = int(parts["lo"].min()), int(parts["hi"].max())
        width = max((hi - lo) // num_zones + 1, 1)

        def add_zone(b: pa.Table) -> pa.Table:
            v = np.asarray(b.column(zone_col), dtype=np.int64)
            return b.append_column("zone", pa.array((v - lo) // width))

        zoned = ds.map_batches(add_zone, batch_format="pyarrow")
        # ONE sort clusters each zone contiguously -> few files per dir
        zoned.sort([zone_col]).write_parquet(root,
                                             partition_cols=["zone"])

        from dedup_restore_ray.stages.groups import grouped_aggregate
        ztab = grouped_aggregate(
            zoned.select_columns(["zone", zone_col]), ["zone"],
            {"zmin": (zone_col, "min"), "zmax": (zone_col, "max")},
            count_alias="rows").to_pandas().sort_values("zone")
        meta = {"schema": SCHEMA_VERSION, "zone_col": zone_col,
                "num_zones": num_zones, "lo": lo, "width": width,
                "zones": [{"zone": int(r.zone), "zmin": int(r.zmin),
                           "zmax": int(r.zmax), "rows": int(r.rows)}
                          for r in ztab.itertuples()]}
        json.dump(meta, open(meta_path, "w"))
        return cls(root, meta)

    # ------------------------------------------------------------------
    def append(self, ds: "rd.Dataset") -> int:
        """Incremental store maintenance against the FROZEN zone
        layout (lo/width from build; values outside the built range
        clamp into the edge zones, whose TRUE min/max then widen).
        New rows land as new Parquet files in their zone directories —
        resident partitions untouched, the same append discipline as
        the IVF / hash stores.  Returns the appended row count."""
        zone_col = self.meta["zone_col"]
        lo, width = self.meta["lo"], self.meta["width"]
        nz = self.meta["num_zones"]

        def add_zone(b: pa.Table) -> pa.Table:
            v = np.asarray(b.column(zone_col), dtype=np.int64)
            z = np.clip((v - lo) // width, 0, nz - 1)
            return b.append_column("zone", pa.array(z, pa.int64()))

        zoned = ds.map_batches(add_zone, batch_format="pyarrow")
        n_new = zoned.count()
        if n_new == 0:
            return 0
        zoned.sort([zone_col]).write_parquet(self.root,
                                             partition_cols=["zone"])
        from dedup_restore_ray.stages.groups import grouped_aggregate
        ztab = grouped_aggregate(
            zoned.select_columns(["zone", zone_col]), ["zone"],
            {"zmin": (zone_col, "min"), "zmax": (zone_col, "max")},
            count_alias="rows").to_pandas()
        by_zone = {z["zone"]: z for z in self.zones}
        for r in ztab.itertuples():
            z = by_zone.get(int(r.zone))
            if z is None:
                by_zone[int(r.zone)] = {"zone": int(r.zone),
                                        "zmin": int(r.zmin),
                                        "zmax": int(r.zmax),
                                        "rows": int(r.rows)}
            else:
                z["zmin"] = min(z["zmin"], int(r.zmin))
                z["zmax"] = max(z["zmax"], int(r.zmax))
                z["rows"] += int(r.rows)
        self.meta["zones"] = sorted(by_zone.values(),
                                    key=lambda z: z["zone"])
        self.zones = self.meta["zones"]
        json.dump(self.meta, open(os.path.join(self.root, META_NAME),
                                  "w"))
        return int(n_new)

    # ------------------------------------------------------------------
    def _zone_files(self, zone: int) -> list[str]:
        d = os.path.join(self.root, f"zone={zone}")
        return [os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")]

    def read_range(self, lo: int, hi: int, columns: list[str] | None = None
                   ) -> tuple["rd.Dataset", dict]:
        """Rows with ``lo <= zone_col <= hi``: opens ONLY partitions
        whose true [zmin, zmax] overlaps the range (metadata decision,
        no data touched for pruned zones), then applies the exact
        residual filter.  Returns (dataset, stats) with
        ``zones_read`` / ``zones_total`` so callers and tests can
        assert the pruning actually happened."""
        hit = [z for z in self.zones
               if not (z["zmax"] < lo or z["zmin"] > hi)]
        stats = {"zones_total": len(self.zones), "zones_read": len(hit),
                 "rows_in_zones": sum(z["rows"] for z in hit)}
        files = [f for z in hit for f in self._zone_files(z["zone"])]
        if not files:
            empty = rd.from_arrow(pa.table({}))
            return empty, stats
        from dedup_restore_ray.sources.io import read_parquet_clean
        ds = read_parquet_clean(files, columns=columns)
        zc = self.meta["zone_col"]

        def exact(b: pa.Table) -> pa.Table:
            v = np.asarray(b.column(zc), dtype=np.int64)
            return b.filter(pa.array((v >= lo) & (v <= hi)))

        return ds.map_batches(exact, batch_format="pyarrow"), stats
