"""URL canonicalization (functions/urlnorm.py) edge cases."""

import pyarrow as pa

from dedup_restore_ray.functions.urlnorm import canonicalize_urls


def canon(u: str) -> str:
    return canonicalize_urls(pa.array([u]))[0].as_py()


class TestUrlCanon:
    def test_case_and_www_and_port(self):
        assert (canon("HTTPS://WWW.Foo.COM:443/A/B") ==
                "https://foo.com/A/B")  # path case preserved

    def test_default_port_scheme_conditional(self):
        assert canon("http://x.com:80/a") == "http://x.com/a"
        # :80 is NOT http's-peer default for https and vice versa
        assert canon("https://x.com:80/a") == "https://x.com:80/a"
        assert canon("http://x.com:443/a") == "http://x.com:443/a"
        assert canon("ftp://x.com:80/a") == "ftp://x.com:80/a"

    def test_fragment_and_trailing_slash(self):
        assert canon("https://x.com/a/b/#frag") == "https://x.com/a/b"
        assert canon("https://x.com/") == "https://x.com/"
        assert canon("https://x.com") == "https://x.com/"

    def test_doubled_slashes(self):
        assert canon("https://x.com//a///b/") == "https://x.com/a/b"

    def test_tracking_params(self):
        assert (canon("https://x.com/p?utm_source=a&id=3&utm_medium=b")
                == "https://x.com/p?id=3")
        assert canon("https://x.com/p?utm_a=1&utm_b=2") == \
            "https://x.com/p"
        assert canon("https://x.com/p?gclid=9") == "https://x.com/p"
        assert (canon("https://x.com/p?ref=hp&page=2") ==
                "https://x.com/p?page=2")

    def test_tracking_key_suffix_not_stripped(self):
        # 'pref=' must not match 'ref='
        assert (canon("https://x.com/p?pref=x&utm_y=1") ==
                "https://x.com/p?pref=x")

    def test_adjacent_tracking_params_all_go(self):
        assert (canon("https://x.com/p?utm_a=1&utm_b=2&c=3&utm_d=4")
                == "https://x.com/p?c=3")

    def test_param_order_preserved(self):
        assert (canon("https://x.com/p?b=2&a=1") ==
                "https://x.com/p?b=2&a=1")

    def test_non_url_passthrough_and_null(self):
        arr = canonicalize_urls(pa.array(["not a url", None]))
        assert arr[0].as_py() == "not a url"
        assert arr[1].as_py() is None

    def test_query_on_bare_host(self):
        assert (canon("https://X.com?utm_s=1&q=2") ==
                "https://x.com/?q=2")

    def test_chunked_array_input(self):
        ch = pa.chunked_array([["https://A.com/x/"], ["HTTP://b.com"]])
        out = canonicalize_urls(ch)
        assert out.to_pylist() == ["https://a.com/x", "http://b.com/"]
