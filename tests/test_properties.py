"""Property-based tests (hypothesis) for the signature kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from dedup_restore_ray.functions.cdc import chunk_boundaries, chunk_payload
from dedup_restore_ray.functions.fingerprint import (
    batch_winnowed_fingerprints, winnowed_fingerprints)
from dedup_restore_ray.functions.jaccard import jaccard_sorted
from dedup_restore_ray.functions.minhash import (estimate_jaccard,
                                                 make_permutations,
                                                 minhash_signatures)
from dedup_restore_ray.functions.shingle import ShingleEncoder
from dedup_restore_ray.functions.suffix import substring_pairs, suffix_array

words = st.sampled_from(
    "data pipeline stream batch query join merge sort hash scan filter "
    "window group table row column vector key value order".split())
texts = st.lists(words, min_size=0, max_size=80).map(" ".join)


class TestJaccardProperties:
    @given(texts, texts)
    @settings(max_examples=50, deadline=None)
    def test_symmetry_and_bounds(self, a, b):
        enc = ShingleEncoder(k=5, seed=0)
        flat, off = enc.encode([a, b])
        sa, sb = flat[off[0]:off[1]], flat[off[1]:off[2]]
        j1 = jaccard_sorted(sa, sb)
        j2 = jaccard_sorted(sb, sa)
        assert j1 == j2
        assert 0.0 <= j1 <= 1.0
        if a == b:
            assert j1 == 1.0

    @given(texts)
    @settings(max_examples=30, deadline=None)
    def test_minhash_identity(self, a):
        enc = ShingleEncoder(k=5, seed=0)
        flat, off = enc.encode([a, a])
        pa_, pb_ = make_permutations(128, 42)
        sig = minhash_signatures(flat, off, pa_, pb_)
        assert estimate_jaccard(sig[0], sig[1]) == 1.0


class TestMinHashEstimate:
    @given(st.integers(0, 2**31 - 1))
    @settings(max_examples=20, deadline=None)
    def test_estimate_within_bound(self, seed):
        """|estimate - exact| <= 4.5/sqrt(128) ≈ 0.40 always holds in
        practice for random pairs (Chernoff, generous slack)."""
        rng = np.random.default_rng(seed)
        n1, n2, novl = (int(rng.integers(1, 200)), int(rng.integers(1, 200)),
                        int(rng.integers(0, 100)))
        base = rng.choice(1 << 30, size=n1 + n2 + novl, replace=False)
        a = np.unique(np.concatenate([base[:n1], base[-novl:]])
                      if novl else base[:n1]).astype(np.uint64)
        b = np.unique(np.concatenate([base[n1:n1 + n2], base[-novl:]])
                      if novl else base[n1:n1 + n2]).astype(np.uint64)
        exact = jaccard_sorted(np.sort(a), np.sort(b))
        flat = np.concatenate([np.sort(a), np.sort(b)])
        off = np.array([0, len(a), len(a) + len(b)], dtype=np.int64)
        pa_, pb_ = make_permutations(128, 42)
        sig = minhash_signatures(flat, off, pa_, pb_)
        est = estimate_jaccard(sig[0], sig[1])
        assert abs(est - exact) <= 0.40


class TestWinnowingGuarantee:
    @given(st.lists(words, min_size=25, max_size=60).map(" ".join),
           st.lists(words, min_size=0, max_size=30).map(" ".join),
           st.lists(words, min_size=0, max_size=30).map(" ".join))
    @settings(max_examples=40, deadline=None)
    def test_shared_run_detected(self, shared, pre, post):
        """Any shared character run >= kgram + window - 1 chars yields
        at least one common fingerprint (the winnowing guarantee)."""
        k, w = 50, 51
        if len(shared) < k + w - 1:
            return
        doc_a = (pre + " " + shared + " zq").strip()
        doc_b = ("qz " + shared + " " + post).strip()
        fa = winnowed_fingerprints(doc_a, k, w)
        fb = winnowed_fingerprints(doc_b, k, w)
        assert len(np.intersect1d(fa, fb)) > 0

    @given(st.lists(texts, min_size=1, max_size=8))
    @settings(max_examples=25, deadline=None)
    def test_batch_matches_per_doc(self, docs):
        k, w = 50, 51
        batched = batch_winnowed_fingerprints(docs, k, w)
        for d, got in zip(docs, batched):
            expect = winnowed_fingerprints(d, k, w)
            assert set(got.tolist()) == set(expect.tolist())


class TestCDCProperties:
    @given(st.binary(min_size=0, max_size=30000))
    @settings(max_examples=30, deadline=None)
    def test_chunks_partition_input(self, payload):
        chunks = chunk_payload(payload)
        assert b"".join(chunks) == payload
        for c in chunks[:-1]:
            assert 512 <= len(c) <= 16384
        if chunks:
            assert 1 <= len(chunks[-1]) <= 16384

    @given(st.binary(min_size=0, max_size=8000))
    @settings(max_examples=20, deadline=None)
    def test_deterministic(self, payload):
        assert np.array_equal(chunk_boundaries(payload),
                              chunk_boundaries(payload))


class TestSuffixArrayProperties:
    @given(st.text(alphabet="abcd", min_size=0, max_size=200))
    @settings(max_examples=30, deadline=None)
    def test_sa_is_sorted_permutation(self, s):
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32
                              ).astype(np.int64)
        sa = suffix_array(codes)
        assert sorted(sa.tolist()) == list(range(len(s)))
        suffixes = [s[i:] for i in sa]
        assert suffixes == sorted(suffixes)

    @given(st.text(alphabet="ab", min_size=110, max_size=160))
    @settings(max_examples=15, deadline=None)
    def test_identical_docs_always_pair(self, s):
        assert (0, 1) in substring_pairs([s, s], 100)


class TestUrlCanonProperties:
    url_strategy = st.builds(
        lambda scheme, www, host, port, segs, slash, params, frag:
            scheme + "://" + www + host + port + "/" + "/".join(segs)
            + ("/" if slash and segs else "")
            + ("?" + "&".join(params) if params else "")
            + ("#" + frag if frag else ""),
        st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
        st.sampled_from(["", "www.", "WWW."]),
        st.sampled_from(["ex.com", "Ex.COM", "a-b.org", "X9.net"]),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.lists(st.sampled_from(["a", "B", "c1", "d_e", ""]),
                 min_size=0, max_size=4),
        st.booleans(),
        st.lists(st.sampled_from(
            ["id=3", "q=x", "utm_source=a", "utm_b=2", "ref=hp",
             "pref=1", "gclid=9", "page=2"]), min_size=0, max_size=4),
        st.sampled_from(["", "frag", "a/b?c"]),
    )

    @given(url_strategy)
    @settings(max_examples=150, deadline=None)
    def test_canonicalize_idempotent(self, url):
        import pyarrow as pa
        from dedup_restore_ray.functions.urlnorm import canonicalize_urls
        once = canonicalize_urls(pa.array([url]))[0].as_py()
        twice = canonicalize_urls(pa.array([once]))[0].as_py()
        assert twice == once

    @given(url_strategy)
    @settings(max_examples=100, deadline=None)
    def test_canonical_is_clean(self, url):
        import pyarrow as pa
        from dedup_restore_ray.functions.urlnorm import canonicalize_urls
        c = canonicalize_urls(pa.array([url]))[0].as_py()
        assert "#" not in c
        assert "utm_" not in c and "gclid" not in c
        assert not c.endswith("?") and not c.endswith("&")
        host = c.split("://", 1)[1]
        assert not host.startswith("www.")
