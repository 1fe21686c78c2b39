"""Child process for the R12 design-equiv evidence (run by
tests/test_r12_memory.py): one distributed windowed restore at a given
window size in a FRESH Ray session, reporting the driver's peak RSS.

The reference's adaptive controller (R12/R14, src/adaptive_faa.c)
exists to re-split a fixed memory budget as the window count grows;
the Ray claim (SURVEY §2.5) is that streaming backpressure already
bounds memory independently of window count.  This child makes that
measurable: driver peak RSS must be flat in window_size.

Usage: python r12_window_memory_child.py <window_size> <n_refs> <k>
Prints one JSON line.
"""

import json
import os
import resource
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    window_size, n_refs, k = (int(a) for a in sys.argv[1:4])
    import ray
    import ray.data as rd
    import pyarrow as pa
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from dedup_restore_ray.pipelines.restore import (
        windowed_restore_distributed)

    # recipe: n_refs ordered refs over k distinct canonicals; store
    # built directly (no dedup run needed — this measures restore only)
    import numpy as np

    def make_refs(b):
        ids = np.asarray(b.column("id").combine_chunks())
        return pa.table({"doc_id": b.column("id"),
                         "canonical_id": pa.array(ids % k, pa.int64())})

    assignments = rd.range(n_refs).map_batches(
        make_refs, batch_format="pyarrow")
    store = rd.range(k).map_batches(
        lambda b: pa.table({
            "canonical_id": b.column("id"),
            "stored_text": pa.compute.binary_join_element_wise(
                pa.array(["canonical text body number"] * b.num_rows),
                pa.compute.cast(b.column("id"), pa.string()), " ")}),
        batch_format="pyarrow")

    m = windowed_restore_distributed(assignments, store,
                                     window_size=window_size)
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "window_size": window_size,
        "n_windows": -(-n_refs // window_size),
        "total_container_read": m["total_container_read"],
        "restored_rows": m["restored_rows"],
        "restored_bytes": m["restored_bytes"],
        "driver_peak_rss_mb": round(peak_rss_mb, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
