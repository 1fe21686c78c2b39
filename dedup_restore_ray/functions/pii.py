"""PII redaction for webtext corpora (C4/RefinedWeb-style cleanup).

Emails, IPv4 addresses and phone-shaped digit runs are replaced by
typed placeholder tokens.  The whole pass is Arrow-native:
``pc.replace_substring_regex`` / ``pc.count_substring_regex`` run
Google RE2 inside Arrow's C++ kernels — the SAME regex engine DuckDB
uses, so the SQL oracle (nested ``regexp_replace(..., 'g')``) is
bit-identical by construction, and no Python executes per row.

Patterns are applied in a fixed order (email, then IP, then phone)
because each rewrite can destroy later matches (an email's host part
would otherwise count as a phone-ish digit run); the oracle nests its
replacements in the same order.

Scale shape: embarrassingly parallel map_batches, no shuffle; the
compiled RE2 programs live inside Arrow and are shared per process.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# order matters — see module docstring
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def scrub_batch(texts: pa.ChunkedArray | pa.Array):
    """Redact PII from a text column.  Returns (clean, counts) where
    ``clean`` is the redacted string array and ``counts`` maps pattern
    name -> int64 array of per-row match counts (counted on the text
    as it looked WHEN that pattern ran, matching the nested-replace
    oracle)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    clean = texts
    counts: dict[str, pa.Array] = {}
    for name, pattern, repl in PII_PATTERNS:
        counts[name] = pc.count_substring_regex(clean, pattern=pattern)
        clean = pc.replace_substring_regex(clean, pattern=pattern,
                                           replacement=repl)
    return clean, counts
