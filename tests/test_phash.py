"""Perceptual-hash image near-dup rail: average_hash properties, the
PHashImage actor stage, and the end-to-end band-candidate + Hamming
verify chain on planted duplicate / near-duplicate / distinct images."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _img(rng, h=16, w=16):
    return rng.integers(0, 200, (h, w, 3), dtype=np.uint8)


class TestAverageHash:
    def test_brightness_shift_invariant(self):
        from dedup_restore_ray.functions.codecs import average_hash
        rng = np.random.default_rng(2)
        img = _img(rng)
        shifted = np.clip(img.astype(np.int64) + 30, 0, 255) \
            .astype(np.uint8)
        assert average_hash(img) == average_hash(shifted)

    def test_resize_of_nearest_grid_invariant(self):
        from dedup_restore_ray.functions.codecs import (average_hash,
                                                        resize_nearest)
        rng = np.random.default_rng(4)
        img = _img(rng, 8, 8)
        up = resize_nearest(img, 32, 32)   # preserves the 8x8 samples
        assert average_hash(img) == average_hash(up)

    def test_distinct_images_differ(self):
        from dedup_restore_ray.functions.codecs import average_hash
        rng = np.random.default_rng(6)
        hs = {average_hash(_img(rng)) for _ in range(20)}
        assert len(hs) == 20


def _media_table(payloads, types, ids):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "media_type": pa.array(types),
                     "payload": pa.array(payloads, pa.binary())})


class TestPHashRail:
    def test_stage_drops_non_images(self, ray_session):
        from dedup_restore_ray.functions.codecs import (encode_ppm,
                                                        encode_wav)
        from dedup_restore_ray.stages.multimodal import PHashImage
        rng = np.random.default_rng(8)
        tbl = _media_table(
            [encode_ppm(_img(rng)),
             encode_wav(np.zeros(64, np.int16)),
             encode_ppm(_img(rng))],
            ["image/ppm", "audio/wav", "image/ppm"], [1, 2, 3])
        out = rd.from_arrow(tbl).map_batches(
            PHashImage(), batch_format="pyarrow").to_pandas()
        assert list(out["doc_id"]) == [1, 3]
        assert out["simhash"].dtype == np.uint64

    @pytest.mark.parametrize("num_blocks", [1, 5])
    def test_planted_duplicates_found(self, ray_session, num_blocks):
        from dedup_restore_ray.functions.codecs import encode_ppm
        from dedup_restore_ray.stages.multimodal import phash_pairs
        rng = np.random.default_rng(10)
        base = _img(rng)
        bright = np.clip(base.astype(np.int64) + 25, 0, 255) \
            .astype(np.uint8)
        payloads = [encode_ppm(base), encode_ppm(base),
                    encode_ppm(bright)]
        ids = [10, 11, 12]
        for i in range(40):               # distinct background images
            payloads.append(encode_ppm(_img(rng)))
            ids.append(100 + i)
        tbl = _media_table(payloads, ["image/ppm"] * len(ids), ids)
        out = phash_pairs(
            rd.from_arrow(tbl).repartition(num_blocks),
            hamming_max=0).to_pandas()
        got = (set(map(tuple, out[["u", "v"]].to_numpy()))
               if "u" in out.columns else set())
        assert {(10, 11), (10, 12), (11, 12)} <= got
        # no distinct background image may pair with the planted set
        assert all(u >= 100 or v < 100 for u, v in got
                   if (u, v) not in {(10, 11), (10, 12), (11, 12)})

    def test_empty_candidates_yield_typed_empty(self, ray_session):
        from dedup_restore_ray.functions.codecs import encode_ppm
        from dedup_restore_ray.stages.multimodal import phash_pairs
        rng = np.random.default_rng(12)
        tbl = _media_table([encode_ppm(_img(rng)) for _ in range(6)],
                           ["image/ppm"] * 6, list(range(6)))
        out = phash_pairs(rd.from_arrow(tbl), hamming_max=0)
        assert out.count() == 0
