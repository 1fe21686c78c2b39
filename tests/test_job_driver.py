"""tools/run_dedup_job.py — the `ray job submit` entrypoint: runs in
its own process with its own Ray session, writes resumable partitions,
skips them all on re-submission."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "run_dedup_job.py")


def _submit(out_dir: str) -> dict:
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.run(
        [sys.executable, SCRIPT,
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out_dir, "--id-col", "doc_id",
         "--text-col", "text", "--num-partitions", "4",
         "--no-substring"],
        capture_output=True, text=True, timeout=420, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


class TestJobDriver:
    def test_submit_and_resume(self, tmp_path):
        out = str(tmp_path / "assignments")
        first = _submit(out)
        assert first["stats"]["total"] == 500
        assert first["write"]["written_rows"] == 500
        assert first["write"]["partitions"] == 4
        assert first["stage_sec"]  # per-stage metrics present
        again = _submit(out)
        assert again["write"]["written_rows"] == 0  # resume skips all
        assert again["config_hash"] == first["config_hash"]
