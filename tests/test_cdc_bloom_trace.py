"""CDC chunker, bloom filter, trace reader (reference parity ops)."""

import zlib

import numpy as np
import pytest

from dedup_restore_ray.functions.bloom import BloomFilter
from dedup_restore_ray.functions.cdc import (chunk_boundaries, chunk_payload,
                                             rolling_adler32)


class TestRollingAdler:
    def test_matches_zlib(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 300, dtype=np.uint8)
        h = rolling_adler32(data, win=48)
        for i in (0, 57, 211, len(h) - 1):
            expect = zlib.adler32(bytes(data[i:i + 48]))
            assert int(h[i]) == expect, i

    def test_short_input(self):
        assert len(rolling_adler32(np.zeros(10, np.uint8), 48)) == 0


class TestCDC:
    @pytest.fixture(scope="class")
    def payload(self):
        rng = np.random.default_rng(7)
        return rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()

    def test_concatenation_preserved(self, payload):
        chunks = chunk_payload(payload)
        assert b"".join(chunks) == payload

    def test_size_bounds(self, payload):
        chunks = chunk_payload(payload)
        assert len(chunks) > 1
        for c in chunks[:-1]:
            assert 512 <= len(c) <= 16384
        assert len(chunks[-1]) <= 16384

    def test_deterministic(self, payload):
        assert np.array_equal(chunk_boundaries(payload),
                              chunk_boundaries(payload))

    def test_content_defined_shift_resistance(self, payload):
        """Inserting bytes at the front realigns to the same cuts after
        the disturbance — the property the reference's chunker exists
        for (src/chunk.c)."""
        shifted = b"XYZ" + payload
        b1 = set(chunk_boundaries(payload).tolist())
        b2 = {b - 3 for b in chunk_boundaries(shifted).tolist()}
        # most original boundaries reappear (first chunk may differ)
        assert len(b1 & b2) >= len(b1) * 0.8

    def test_empty(self):
        assert chunk_payload(b"") == []


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(num_bits=1 << 16)
        keys = np.arange(1000, dtype=np.uint64) * 7919
        bf.add(keys)
        assert bf.check(keys).all()

    def test_mostly_true_negatives(self):
        bf = BloomFilter(num_bits=1 << 20)
        bf.add(np.arange(1000, dtype=np.uint64))
        probe = np.arange(100_000, 110_000, dtype=np.uint64)
        fp = bf.check(probe).mean()
        assert fp < 0.01   # reference log shows 0 BF false positives

    def test_fp_estimate(self):
        bf = BloomFilter(num_bits=1 << 20, num_hashes=2)
        assert bf.fp_rate_estimate(1000) < 0.001


@pytest.mark.usefixtures("ray_session")
class TestTraceReader:
    def test_roundtrip_and_dedup(self, tmp_path):
        from dedup_restore_ray.sources.trace import (read_trace,
                                                     write_synthetic_trace)
        from dedup_restore_ray.stages.groups import mark_canonical
        p = write_synthetic_trace(str(tmp_path / "t.trace"), n_lines=500,
                                  dup_rate=0.5, seed=42)
        ds = read_trace(p)
        df = ds.to_pandas()
        assert len(df) == 500
        assert (df["len"] == 4096).all()            # forced length
        assert df["seq_no"].tolist() == list(range(500))
        assert df["fingerprint"].map(len).eq(17).all()
        # first-wins dedup over the trace (reference mode 7 semantics)
        marked = mark_canonical(ds.select_columns(["fingerprint", "seq_no"])
                                .rename_columns({"seq_no": "doc_id"}),
                                "fingerprint").to_pandas()
        dups = marked["is_dup"].sum()
        uniq = len(marked) - dups
        assert dups + uniq == 500
        assert 0 < dups < 500
        # canonical is the minimum seq among equal fingerprints
        g = marked.groupby(marked["canonical_id"])
        for canon, rows in g:
            assert canon == rows["doc_id"].min()
