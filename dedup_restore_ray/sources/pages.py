"""Deterministic synthetic web-page corpus (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
  (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Ground truth written alongside (``pages_truth``): url, true_cluster_id,
kind ∈ {unique, exact, near, substring, boilerplate, degenerate}.

Duplication plan mirrors the reference's captured dedup ratio (49.3 %
duplicate chunks, reference: optsmr.log:12-15): ~50 % exact dups,
~15 % near-dups at controlled Jaccard levels, ~5 % long-shared-substring
pairs, a pathological hot LSH bucket (shared boilerplate), and
degenerate rows (empty / whitespace / html-only).
Everything is seeded (seed=42) and scale-parameterised.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_VOCAB = [
    "data", "pipeline", "stream", "batch", "query", "join", "merge", "sort",
    "hash", "scan", "filter", "window", "group", "table", "row", "column",
    "vector", "key", "value", "order", "line", "part", "customer", "spark",
    "ray", "arrow", "shard", "block", "actor", "task", "node", "cluster",
    "shuffle", "spill", "cache", "index", "bloom", "minhash", "simhash",
    "band", "bucket", "salt", "label", "union", "find", "suffix", "array",
    "web", "page", "crawl", "corpus", "token", "shingle", "signature",
    "dedup", "restore", "container", "recipe", "chunk", "fingerprint",
]

_BOILER = ("cookie policy accept terms navigation home about contact "
           "privacy copyright all rights reserved subscribe newsletter")

_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es"]

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds


def _rand_text(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(_VOCAB), size=n_words)
    return " ".join(_VOCAB[i] for i in idx)


def _edit_text(rng: np.random.Generator, text: str, target_jaccard: float) -> str:
    """Word-level edits producing approximately the target shingle
    Jaccard (replacement of a fraction of words; for k-gram shingles a
    word replacement kills ~k shingles, so the replaced fraction is
    tuned down accordingly)."""
    words = text.split()
    n = len(words)
    # fraction of words to replace ~ (1-j) / (k * (1+j)) for k=5
    frac = (1.0 - target_jaccard) / (5.0 * (1.0 + target_jaccard))
    n_edit = max(1, int(round(n * frac)))
    pos = rng.choice(n, size=min(n_edit, n), replace=False)
    for p in pos:
        words[p] = _VOCAB[int(rng.integers(0, len(_VOCAB)))] + "x"
    return " ".join(words)


def _html_wrap(text: str, site: int) -> bytes:
    return (f"<html><head><title>site{site}</title></head><body>"
            f"<nav>{_BOILER}</nav><main>{text}</main>"
            f"<footer>{_BOILER} site{site}</footer></body></html>").encode()


def generate_pages(
    n_docs: int = 500, seed: int = 42, hot_bucket_size: int | None = None
) -> tuple[pa.Table, pa.Table]:
    """Returns (pages, truth) Arrow tables.  Deterministic in (n_docs,
    seed).  hot_bucket_size defaults to max(8, n_docs // 25)."""
    rng = np.random.default_rng(seed)
    if hot_bucket_size is None:
        hot_bucket_size = max(8, n_docs // 25)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    t_urls, t_cids, t_kinds = [], [], []
    next_id = 0

    def emit(text, kind, cid, lang=None, html=None):
        nonlocal next_id
        k = next_id
        next_id += 1
        url = f"https://site{k % 20}.example/path/{k}"
        urls.append(url)
        tss.append(EPOCH_US + k * 1_000_000)
        htmls.append(html if html is not None else _html_wrap(text or "", k % 20))
        texts.append(text)
        langs.append(lang or _LANGS[k % len(_LANGS)])
        t_urls.append(url)
        t_cids.append(cid)
        t_kinds.append(kind)
        return url

    n_unique = max(4, int(n_docs * 0.28))
    n_exact_pairs = max(2, int(n_docs * 0.25))     # ~50% of docs exact-dup rows
    n_near = max(4, int(n_docs * 0.15))
    n_sub_pairs = max(1, int(n_docs * 0.025))
    jac_levels = [0.95, 0.9, 0.85, 0.8]

    base_texts = []
    # unique docs
    for i in range(n_unique):
        t = _rand_text(rng, int(rng.integers(40, 220)))
        base_texts.append(t)
        emit(t, "unique", f"c{i}")
    # exact duplicates: copy of a random earlier base text (byte-identical)
    for i in range(n_exact_pairs * 2):
        src = int(rng.integers(0, n_unique))
        emit(base_texts[src], "exact", f"c{src}")
    # near duplicates at controlled Jaccard
    for i in range(n_near):
        src = int(rng.integers(0, n_unique))
        j = jac_levels[i % len(jac_levels)]
        emit(_edit_text(rng, base_texts[src], j), "near", f"c{src}")
    # long-shared-substring pairs: >= 300 chars common run, different rest
    for i in range(n_sub_pairs):
        shared = _rand_text(rng, 60)  # ~60 words ≈ 350+ chars
        a = _rand_text(rng, 50) + " " + shared + " " + _rand_text(rng, 50)
        b = _rand_text(rng, 50) + " " + shared + " " + _rand_text(rng, 50)
        cid = f"s{i}"
        emit(a, "substring", cid)
        emit(b, "substring", cid)
    # pathological hot bucket: identical boilerplate + 1-word suffix
    for i in range(hot_bucket_size):
        emit(_BOILER + " " + _BOILER + " " + _VOCAB[i % len(_VOCAB)],
             "boilerplate", "hot0")
    # degenerate rows
    emit("", "degenerate", "d0")
    emit("", "degenerate", "d0")          # two empties are exact dups
    emit("   ", "degenerate", "d1")
    emit(None, "degenerate", "d2", html=_html_wrap("extracted only body", 3))
    emit("ünïcodé tëxt höhér ça ira " * 3, "degenerate", "d3")

    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    truth = pa.table({
        "url": pa.array(t_urls, pa.string()),
        "true_cluster_id": pa.array(t_cids, pa.string()),
        "kind": pa.array(t_kinds, pa.string()),
    })
    return pages, truth


def write_pages(dir_path: str, n_docs: int = 500, seed: int = 42) -> tuple[str, str]:
    """Write pages + truth parquet under dir_path; returns file paths."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(dir_path, exist_ok=True)
    pages, truth = generate_pages(n_docs=n_docs, seed=seed)
    p1 = os.path.join(dir_path, "pages.parquet")
    p2 = os.path.join(dir_path, "pages_truth.parquet")
    # bounded row groups: a single-row-group file is UNSPLITTABLE for
    # Ray's parquet reader — the whole scan becomes one serial task and
    # caps the measured scaling efficiency of every downstream stage
    pq.write_table(pages, p1, row_group_size=32_768)
    pq.write_table(truth, p2, row_group_size=65_536)
    return p1, p2
