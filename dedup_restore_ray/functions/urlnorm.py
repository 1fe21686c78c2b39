"""URL canonicalization — the first dedup stage of any web pipeline.

The reference engine keys its exact dedup on a content fingerprint
(src/dedup.c:84); at web scale the cheaper key that removes most
crawl duplication is the *canonical URL* (same page fetched as
http/https, with/without ``www.``, default ports, tracking params,
fragments, trailing slashes).  This module normalizes a URL column
entirely inside Arrow's RE2 string kernels — the SAME regex engine
DuckDB uses — so the SQL oracle is bit-identical by construction
(same pattern as ``functions/pii.py``).

Rules applied, in order (each a global RE2 replace / extract):

1. drop the fragment (``#...``);
2. split ``scheme://hostport rest`` (non-URL rows pass through
   unchanged);
3. lowercase scheme and hostport; strip one leading ``www.``; strip
   the scheme's default port (``:80`` http, ``:443`` https);
4. split ``rest`` into path and query; in the query, drop tracking
   parameters (``utm_*``, ``gclid``, ``fbclid``, ``ref``) — the
   C4/CCNet-style strip — then drop a now-empty ``?``;
5. collapse ``//+`` runs in the path, strip trailing slashes, map an
   empty path to ``/``.

Parameter *order* is preserved (no param sort): stripping is the
common curation behavior and keeps every step a vectorized kernel.

Keep ``_TRACKING_RE`` and the split patterns in sync with the
``url_dedup_docs`` oracle in ``queries.py``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://hostport rest   (rest = path + query, fragment already gone)
URL_SPLIT_RE = (r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
                r"(?P<hostport>[^/?#]*)(?P<rest>[\s\S]*)$")
# one tracking parameter, anchored at its preceding '?'/'&' so key
# SUFFIXES never match (``pref=`` is not ``ref=``); the anchor is
# kept via backreference and the leftover '?&'/'&&' runs are
# collapsed afterwards (RE2 global replace does not rescan rewritten
# text, so consuming the FOLLOWING '&' would skip adjacent params)
_TRACKING_RE = r"([?&])(?:utm_[a-zA-Z0-9_]*|gclid|fbclid|ref)=[^&]*"


def canonicalize_urls(urls: pa.Array) -> pa.Array:
    """[n] string array -> [n] canonical-URL string array.

    Pure Arrow compute (zero per-row Python).  Rows that do not parse
    as ``scheme://host...`` are returned unchanged; nulls stay null.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    # 1. fragment off
    u = pc.replace_substring_regex(urls, r"#[\s\S]*$", "")
    parts = pc.extract_regex(u, URL_SPLIT_RE)
    ok = pc.is_valid(parts)
    scheme = pc.ascii_lower(pc.struct_field(parts, "scheme"))
    host = pc.ascii_lower(pc.struct_field(parts, "hostport"))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    # default ports (scheme-conditional)
    h80 = pc.replace_substring_regex(host, r":80$", "")
    h443 = pc.replace_substring_regex(host, r":443$", "")
    host = pc.if_else(pc.equal(scheme, "http"), h80,
                      pc.if_else(pc.equal(scheme, "https"), h443, host))
    rest = pc.struct_field(parts, "rest")
    path = pc.replace_substring_regex(rest, r"\?[\s\S]*$", "")
    query = pc.replace_substring_regex(rest, r"^[^?]*", "")
    # 4. tracking params out; separator runs and empty '?' out
    query = pc.replace_substring_regex(query, _TRACKING_RE, r"\1")
    query = pc.replace_substring_regex(query, r"&&+", "&")
    query = pc.replace_substring_regex(query, r"\?&", "?")
    query = pc.replace_substring_regex(query, r"[?&]$", "")
    # 5. path normalization
    path = pc.replace_substring_regex(path, r"//+", "/")
    path = pc.replace_substring_regex(path, r"/+$", "")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    canon = pc.binary_join_element_wise(
        scheme, "://", host, path, query, "")
    return pc.if_else(ok, canon, urls)
