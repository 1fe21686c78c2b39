"""Trace-file reader — the reference's native input format (S1).

The reference consumes text traces: one line per chunk reference, a
17-character fingerprint in columns 0-16 and a decimal length at
columns 18-24, with the parsed length then forced to 4096
(reference: src/trace_work.c:51-85 `trace_read_line` /
`process_trace_line`, length override at :83).

Ray formulation: ``ray.data.read_text`` -> one vectorized parse
``map_batches`` producing the F2 trace schema
(file_id, seq_no, fingerprint: binary(17), len: int32).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

FORCED_LEN = 4096  # reference: src/trace_work.c:83


def parse_trace_lines(batch: pa.Table, file_id: str = "trace",
                      line_col: str = "text") -> pa.Table:
    """Vectorized parse of trace lines -> trace-record rows.
    seq_no is assigned per-batch locally; the reader below rewrites it
    globally (single input file => read order is line order)."""
    lines = batch.column(line_col).to_pylist()
    fps = []
    lens = []
    for ln in lines:
        fps.append(ln[:17].encode("ascii", "replace").ljust(17, b"\x00"))
        try:
            lens.append(int(ln[18:25].strip() or FORCED_LEN))
        except ValueError:
            lens.append(FORCED_LEN)
    n = len(lines)
    return pa.table({
        "file_id": pa.array([file_id] * n, pa.string()),
        "seq_no": pa.array(np.arange(n, dtype=np.int64)),
        "fingerprint": pa.array(fps, pa.binary(17)),
        # the reference overrides every parsed length to 4096
        "len": pa.array(np.full(n, FORCED_LEN, np.int32)),
        "parsed_len": pa.array(lens, pa.int32()),
    })


def read_trace(path: str, file_id: str | None = None) -> "rd.Dataset":
    """Read a reference-format trace file into the F2 schema with
    globally consistent seq_no (line order)."""
    import os
    fid = file_id or os.path.basename(path)
    ds = rd.read_text(path)
    # read_text of one file yields blocks in order; recover global
    # seq_no by enumerating on a single pass (trace files are small
    # metadata, not payload — the reference caps them in ./config)
    tables = []
    offset = 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        t = parse_trace_lines(b, file_id=fid)
        seq = pa.array(np.arange(offset, offset + t.num_rows,
                                 dtype=np.int64))
        t = t.set_column(t.schema.get_field_index("seq_no"), "seq_no", seq)
        offset += t.num_rows
        tables.append(t)
    if not tables:
        return rd.from_arrow(parse_trace_lines(
            pa.table({"text": pa.array([], pa.string())}), file_id=fid))
    return rd.from_arrow(pa.concat_tables(tables))


def write_synthetic_trace(path: str, n_lines: int = 1000, dup_rate: float = 0.5,
                          seed: int = 42) -> str:
    """Deterministic trace fixture in the reference's line format."""
    rng = np.random.default_rng(seed)
    n_unique = max(1, int(n_lines * (1 - dup_rate)))
    with open(path, "w") as f:
        for i in range(n_lines):
            key = int(rng.integers(0, n_unique))
            h = np.random.default_rng(key).bytes(6).hex()
            fp = ":".join(h[j:j + 2] for j in range(0, 12, 2))  # 17 chars
            f.write(f"{fp} {int(rng.integers(1024, 999999)):6d}\n")
    return path
