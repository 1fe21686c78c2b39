"""Unit tests for the pure signature kernels (no Ray)."""

import numpy as np
import pytest

from dedup_restore_ray.functions.fingerprint import kgram_hashes, winnow, winnowed_fingerprints
from dedup_restore_ray.functions.hashing import WordHasher, combine64, mix64
from dedup_restore_ray.functions.jaccard import jaccard_sorted, ngram_jaccard
from dedup_restore_ray.functions.lsh import band_keys
from dedup_restore_ray.functions.minhash import (EMPTY_SIG, estimate_jaccard,
                                                 make_permutations,
                                                 minhash_signatures)
from dedup_restore_ray.functions.shingle import (ShingleEncoder,
                                                 shingle_hashes_for_tokens,
                                                 tokenize, normalize_text)
from dedup_restore_ray.functions.simhash import (hamming_distance,
                                                 simhash_signatures,
                                                 simhash_band_keys)
from dedup_restore_ray.functions.suffix import substring_pairs, suffix_array

T1 = "the quick brown fox jumps over the lazy dog again and again for testing purposes"
T2 = "the quick brown fox jumps over the lazy cat again and again for testing purposes"
T3 = "completely different text with unrelated words banana apple orange grape melon"


def encode(*texts):
    enc = ShingleEncoder(k=5, seed=0)
    return enc.encode(list(texts))


class TestTokenize:
    def test_basic(self):
        assert tokenize("Hello, World!") == ["hello", "world"]

    def test_none_empty(self):
        assert tokenize(None) == []
        assert tokenize("") == []
        assert tokenize("   ") == []

    def test_normalize(self):
        assert normalize_text("  Hello,\n WORLD ") == "hello world"


class TestShingles:
    def test_deterministic(self):
        f1, o1 = encode(T1)
        f2, o2 = encode(T1)
        assert np.array_equal(f1, f2)
        assert np.array_equal(o1, o2)

    def test_sorted_unique(self):
        f, o = encode(T1)
        d = f[o[0]:o[1]]
        assert np.array_equal(d, np.unique(d))

    def test_count(self):
        # n tokens -> n-k+1 windows (before dedup)
        toks = tokenize(T1)
        wh = WordHasher().hash_words(toks)
        sh = shingle_hashes_for_tokens(wh, 5)
        assert len(sh) <= len(toks) - 4

    def test_short_doc_single_shingle(self):
        f, o = encode("only three words")
        assert o[1] - o[0] == 1

    def test_empty(self):
        f, o = encode("")
        assert o[1] == 0


class TestJaccard:
    def test_identical(self):
        f, o = encode(T1, T1)
        assert jaccard_sorted(f[o[0]:o[1]], f[o[1]:o[2]]) == 1.0

    def test_disjoint(self):
        f, o = encode(T1, T3)
        assert jaccard_sorted(f[o[0]:o[1]], f[o[1]:o[2]]) == 0.0

    def test_empty_conventions(self):
        e = np.empty(0, dtype=np.uint64)
        x = np.array([1], dtype=np.uint64)
        assert jaccard_sorted(e, e) == 1.0
        assert jaccard_sorted(e, x) == 0.0

    def test_known_value(self):
        # hand-computable: sets {1,2,3} and {2,3,4} -> 2/4
        a = np.array([1, 2, 3], dtype=np.uint64)
        b = np.array([2, 3, 4], dtype=np.uint64)
        assert jaccard_sorted(a, b) == 0.5

    def test_counts_batch_matches_ratio_batch(self):
        from dedup_restore_ray.functions.jaccard import (
            jaccard_batch2, jaccard_counts_batch2)
        rng = np.random.default_rng(7)
        sets = [np.unique(rng.integers(0, 40, size=n).astype(np.uint64))
                for n in [0, 1, 5, 12, 0, 30]]
        flat = np.concatenate([s for s in sets if len(s)] or
                              [np.empty(0, np.uint64)])
        offs = np.concatenate(([0], np.cumsum([len(s) for s in sets])))
        idx = [(i, j) for i in range(len(sets))
               for j in range(len(sets))]
        a_s = np.array([offs[i] for i, _ in idx])
        a_l = np.array([len(sets[i]) for i, _ in idx])
        b_s = np.array([offs[j] for _, j in idx])
        b_l = np.array([len(sets[j]) for _, j in idx])
        jac = jaccard_batch2(flat, a_s, a_l, flat, b_s, b_l)
        ii, uu = jaccard_counts_batch2(flat, a_s, a_l, flat, b_s, b_l)
        # integer legs reproduce the ratio exactly, incl. the
        # empty-vs-empty (union 0 -> 1.0) convention
        rec = np.where(uu == 0, 1.0, ii / np.maximum(uu, 1))
        assert np.array_equal(jac, rec)
        # and the legs themselves are right on a hand case
        k = idx.index((2, 3))
        inter = len(np.intersect1d(sets[2], sets[3]))
        assert ii[k] == inter
        assert uu[k] == len(sets[2]) + len(sets[3]) - inter


class TestMinHash:
    def test_estimate_tracks_exact(self):
        f, o = encode(T1, T2)
        exact = jaccard_sorted(f[o[0]:o[1]], f[o[1]:o[2]])
        a, b = make_permutations(128, 42)
        sig = minhash_signatures(f, o, a, b)
        est = estimate_jaccard(sig[0], sig[1])
        assert abs(est - exact) < 0.15

    def test_identical_sets_identical_sigs(self):
        f, o = encode(T1, T1)
        a, b = make_permutations(128, 42)
        sig = minhash_signatures(f, o, a, b)
        assert np.array_equal(sig[0], sig[1])

    def test_empty_doc_sentinel(self):
        f, o = encode("", T1, "")
        a, b = make_permutations(128, 42)
        sig = minhash_signatures(f, o, a, b)
        assert (sig[0] == EMPTY_SIG).all()
        assert (sig[2] == EMPTY_SIG).all()
        assert not (sig[1] == EMPTY_SIG).all()

    def test_seed_changes_sigs(self):
        f, o = encode(T1)
        a1, b1 = make_permutations(128, 1)
        a2, b2 = make_permutations(128, 2)
        assert not np.array_equal(minhash_signatures(f, o, a1, b1),
                                  minhash_signatures(f, o, a2, b2))

    def test_scratch_matches_fresh(self):
        """use_scratch=True (arena-backed result view, flagship path)
        is bit-identical to the fresh-allocation path, including
        empty docs interleaved and back-to-back calls that reuse the
        same arena pages."""
        rng = np.random.default_rng(7)
        a, b = make_permutations(128, 42)
        for _ in range(4):
            n_docs = int(rng.integers(1, 40))
            lens = rng.integers(0, 400, n_docs)
            lens[rng.integers(0, n_docs)] = 0
            offs = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            flat = rng.integers(0, 1 << 63, int(offs[-1]), dtype=np.uint64)
            ref = minhash_signatures(flat, offs, a, b)
            got = minhash_signatures(flat, offs, a, b, use_scratch=True)
            assert np.array_equal(ref, got)


class TestSimHash:
    def test_similar_docs_close(self):
        f, o = encode(T1, T2, T3)
        sh = simhash_signatures(f, o)
        d12 = hamming_distance(sh[0:1], sh[1:2])[0]
        d13 = hamming_distance(sh[0:1], sh[2:3])[0]
        assert d12 < d13

    def test_identical(self):
        f, o = encode(T1, T1)
        sh = simhash_signatures(f, o)
        assert sh[0] == sh[1]

    def test_band_pigeonhole(self):
        # hamming distance <= 3 guarantees a shared band among 4
        rng = np.random.default_rng(0)
        base = rng.integers(0, 1 << 63, dtype=np.uint64)
        flipped = base ^ np.uint64((1 << 3) | (1 << 20) | (1 << 45))
        keys = simhash_band_keys(np.array([base, flipped], dtype=np.uint64), 4)
        assert (keys[0] == keys[1]).any()


class TestLSHBands:
    def test_identical_docs_share_all_bands(self):
        f, o = encode(T1, T1)
        a, b = make_permutations(128, 42)
        sig = minhash_signatures(f, o, a, b)
        bk = band_keys(sig, 16, 8)
        assert (bk[0] == bk[1]).all()

    def test_empty_docs_never_collide(self):
        f, o = encode("", "")
        a, b = make_permutations(128, 42)
        sig = minhash_signatures(f, o, a, b)
        bk = band_keys(sig, 16, 8)
        assert not (bk[0] == bk[1]).any()


class TestWinnowing:
    def test_shared_substring_detected(self):
        shared = "the common run that appears in both documents verbatim and is long enough to survive winnowing by a wide margin"
        a = normalize_text("prefix alpha " + shared + " suffix beta gamma")
        b = normalize_text("other start " + shared + " different ending")
        fa = winnowed_fingerprints(a, 50, 51)
        fb = winnowed_fingerprints(b, 50, 51)
        assert len(np.intersect1d(fa, fb)) > 0

    def test_disjoint_texts_disjoint_fps(self):
        fa = winnowed_fingerprints(normalize_text(T1 * 5), 50, 51)
        fb = winnowed_fingerprints(normalize_text(T3 * 5), 50, 51)
        assert len(np.intersect1d(fa, fb)) == 0

    def test_density(self):
        # winnowing keeps ~2/(w+1) of positions
        text = normalize_text(" ".join(f"w{i}" for i in range(2000)))
        h = kgram_hashes(text, 50)
        pos, fp = winnow(h, 51)
        assert len(pos) < len(h) / 10

    def test_arrow_token_stats_matches_python(self):
        """The Arrow C++ tokenize path (with non-ASCII rows stitched
        through the Python tokenizer) must be bit-identical to the
        per-doc Python path for word hashes, counts, norm bytes and
        raw bytes — including nulls, empties, punctuation-only docs
        and interleaved unicode rows."""
        import pyarrow as pa
        from dedup_restore_ray.functions.hashing import WordHasher
        from dedup_restore_ray.functions.shingle import (arrow_token_stats,
                                                         tokenize)
        docs = ["The Quick-brown FOX_1 jumps!!", "", None,
                "  lots   of   WS\t\n", "__under__score__ 123 CASE",
                "ünïcodé tëxt höhér ça ira", "punct,only.,!?",
                "trailing space ", "héllo wörld", " leading",
                "normal ascii doc with words", None]
        tcol = pa.chunked_array([docs[:5], docs[5:]], pa.string())
        hasher = WordHasher(seed=0)
        wh, counts, norm, raw = arrow_token_stats(tcol, hasher)
        ref_hasher = WordHasher(seed=0)
        pos = 0
        for i, t in enumerate(docs):
            toks = tokenize(t)
            assert counts[i] == len(toks), f"doc {i}"
            expect_wh = ref_hasher.hash_words(toks)
            assert wh[pos:pos + len(toks)].tolist() == expect_wh.tolist(), \
                f"doc {i}"
            pos += len(toks)
            assert norm[i].as_py() == " ".join(toks).encode("utf-8"), \
                f"doc {i}"
            assert raw[i].as_py() == (t or "").encode("utf-8"), f"doc {i}"
        assert pos == len(wh)

    def test_segmented_batch_matches_per_doc(self, monkeypatch):
        """The scratch-arena CSR kernel processes batches in whole-doc
        segments (_SEG_CHARS); shrink the segment so a small batch
        spans several, with empty / shorter-than-k docs landing on
        segment boundaries, and check per-doc value sets are identical
        to the reference per-doc path."""
        from dedup_restore_ray.functions import fingerprint as fp_mod
        from dedup_restore_ray.functions.fingerprint import (
            batch_winnowed_fingerprints_csr)
        k, w = 50, 51
        docs = ["", "tiny", T1 * 3, "", T2 * 4, "x" * (k - 1),
                T3 * 6, T1 + " " + T3, "", T2 * 2, "y" * k, T3 * 3]
        monkeypatch.setattr(fp_mod, "_SEG_CHARS", 256)
        flat, offs = batch_winnowed_fingerprints_csr(docs, k, w)
        assert len(offs) == len(docs) + 1
        assert int(offs[-1]) == len(flat)
        for i, d in enumerate(docs):
            got = flat[offs[i]:offs[i + 1]]
            expect = np.unique(winnowed_fingerprints(d, k, w))
            assert got.tolist() == expect.tolist(), f"doc {i}"


class TestSuffixArray:
    def test_banana(self):
        codes = np.frombuffer("banana".encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        assert suffix_array(codes).tolist() == [5, 3, 1, 0, 4, 2]

    def test_substring_pairs(self):
        shared = "z" * 10 + "qwertyuiopasdfghjklzxcvbnm" * 5
        pairs = substring_pairs(
            ["aaa " + shared + " bbb", "ccc " + shared + " ddd", "unrelated"], 100)
        assert pairs == {(0, 1)}

    def test_no_false_pairs(self):
        assert substring_pairs([T1, T3], 20) == set()

    def test_repeat_within_one_doc_not_a_pair(self):
        s = "x" * 200
        assert substring_pairs([s + " middle " + s], 100) == set()


class TestLshTuning:
    def test_s_curve_properties(self):
        import numpy as np
        from dedup_restore_ray.functions.lsh import lsh_collision_prob
        s = np.linspace(0, 1, 101)
        p = lsh_collision_prob(s, 16, 8)
        assert p[0] == 0.0 and abs(p[-1] - 1.0) < 1e-12
        assert (np.diff(p) >= -1e-12).all()          # monotone

    def test_rows_per_band_monotone_in_threshold(self):
        from dedup_restore_ray.functions.lsh import optimal_bands
        rs = [optimal_bands(t)[1] for t in (0.3, 0.5, 0.7, 0.9)]
        assert rs == sorted(rs)
        assert all(b * r == 128
                   for b, r, _ in (optimal_bands(t)
                                   for t in (0.3, 0.5, 0.7, 0.9)))

    def test_recall_weighted_recovers_engine_default(self):
        # the flagship verifies candidates exactly, so false positives
        # are cheap: with fn-dominated weights at the 0.8 threshold
        # the optimizer lands on the engine's own 16x8 banding
        from dedup_restore_ray.functions.lsh import optimal_bands
        b, r, _ = optimal_bands(0.8, fp_weight=0.1, fn_weight=0.9)
        assert (b, r) == (16, 8)

    def test_bad_threshold_raises(self):
        import pytest as _pytest
        from dedup_restore_ray.functions.lsh import optimal_bands
        with _pytest.raises(ValueError):
            optimal_bands(1.0)
