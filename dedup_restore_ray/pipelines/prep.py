"""End-to-end LLM training-data preparation: the curation chain a
webtext corpus runs before tokenization, composed from the engine's
stages in ONE call —

    quality filter (Gopher integer rules)
    -> language filter (n-gram heuristic)
    -> exact + near-dup dedup (the flagship MinHash/LSH pipeline;
       only canonical documents survive)
    -> optional n-gram decontamination against a held-out test set
    -> optional passage-level cleaning (byte rewriting: duplicated
       exact-substring spans or duplicated passages removed,
       first-wins — ``clean="substring" | "passage"``)
    -> token counting + contiguous shard packing

Each stage is a streaming Dataset transform; the returned manifest
records survivors per stage, so a corpus run reports exactly WHERE
documents were lost — the observability layer data-curation
pipelines live and die by.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedup_restore_ray.config import PipelineConfig


@dataclass
class PrepResult:
    docs: "ray.data.Dataset"      # (id, text, n_tokens, shard_id)
    manifest: dict = field(default_factory=dict)


def _gram_rows(text_col: str, id_col: str, k: int, distinct_grams: bool):
    """Batch -> (gram, [id]) rows of token k-gram hashes.

    Vectorized: tokenization rides the Arrow C++ path
    (shingle.arrow_token_hashes — word hashes over DISTINCT tokens
    only) and the k-gram rolling combine is the batched CSR kernel the
    signature stage uses (encode_word_hashes), whose per-doc output is
    already sorted-unique — identical to the per-doc
    shingle_hashes_for_tokens reference (parity-tested).  Docs with
    fewer than ``k`` tokens emit nothing."""
    from dedup_restore_ray.functions.shingle import (ShingleEncoder,
                                                     arrow_token_hashes)
    enc = ShingleEncoder(k=k)

    def rows(b: pa.Table) -> pa.Table:
        wh, counts = arrow_token_hashes(b.column(text_col), enc.hasher)
        flat, offs = enc.encode_word_hashes(wh, counts)
        n_sh = np.diff(offs)
        # encode_word_hashes gives 0 < n < k docs one whole-doc
        # shingle; this operator's contract drops them instead
        occ_keep = np.repeat(counts >= k, n_sh)
        grams = flat[occ_keep]
        cols = {"gram": pa.array(grams, pa.uint64())}
        if id_col:
            if b.num_rows:
                row_idx = np.repeat(
                    np.arange(b.num_rows, dtype=np.int64), n_sh)[occ_keep]
                cols[id_col] = (b.column(id_col).combine_chunks()
                                .take(pa.array(row_idx)))
            else:
                cols[id_col] = pa.array([], pa.int64())
        return pa.table(cols)

    return rows


def prep_corpus(docs: "ray.data.Dataset",
                cfg: PipelineConfig | None = None,
                id_col: str = "doc_id", text_col: str = "text",
                target_lang: str | None = "en",
                test_docs: "ray.data.Dataset | None" = None,
                decontam_k: int = 5,
                quality: bool = True,
                clean: str | None = None,
                clean_k: int = 8,
                clean_window: int = 20,
                shard_capacity: int = 4096) -> PrepResult:
    """Run the whole curation chain; see module docstring.

    ``test_docs`` (same text column) enables decontamination: any
    surviving doc sharing a token ``decontam_k``-gram with any test
    doc is dropped.  ``target_lang=None`` keeps all languages.

    ``clean`` enables passage-level byte rewriting between
    decontamination and token counting: ``"substring"`` removes every
    token covered by a duplicated ``clean_k``-token window
    (stages/exactsubstr, first-wins — Lee et al.'s all-but-one
    removal), ``"passage"`` removes duplicated ``clean_window``-token
    passages (stages/passages, first-wins).  Docs whose text is fully
    rewritten away are dropped (``after_clean`` manifest row); removed
    volume is reported as ``clean_dup_tokens`` / ``clean_dup_passages``."""
    from dedup_restore_ray.functions.hashing import WordHasher
    from dedup_restore_ray.functions.shingle import arrow_token_hashes
    from dedup_restore_ray.functions.textstats import (
        detect_language_arrow, gopher_keep_mask,
        quality_filter_counts_arrow)
    from dedup_restore_ray.pipelines.dedup import dedup_pipeline
    from dedup_restore_ray.stages.groups import distinct_rows
    from dedup_restore_ray.stages.joins import anti_join, semi_join
    from dedup_restore_ray.stages.windows import global_running_sum

    cfg = cfg or PipelineConfig()
    # materialize the projected input ONCE: counting a lazy
    # read+select would force a full scan whose work the quality pass
    # immediately redoes (the two-consumers-re-execute trap)
    docs = docs.select_columns([id_col, text_col]).materialize()
    manifest: dict = {"input": int(docs.count())}

    # 1. quality (``quality=False`` skips — pre-curated or synthetic
    # corpora whose text intentionally fails the Gopher rules) -------
    if quality:
        def q_filter(b: pa.Table) -> pa.Table:
            c = quality_filter_counts_arrow(b.column(text_col))
            return b.filter(pa.array(gopher_keep_mask(c)))

        docs = docs.map_batches(q_filter,
                                batch_format="pyarrow").materialize()
    manifest["after_quality"] = int(docs.count())

    # 2. language ------------------------------------------------------
    if target_lang is not None:
        def l_filter(b: pa.Table) -> pa.Table:
            pred = detect_language_arrow(b.column(text_col))
            return b.filter(pa.array(pred == target_lang))

        docs = docs.map_batches(l_filter,
                                batch_format="pyarrow").materialize()
    manifest["after_langid"] = int(docs.count())

    if manifest["after_langid"] == 0:
        # every doc filtered out: short-circuit with an all-zero
        # manifest (empty materialized Datasets have no schema and
        # would trip the joins/scatters downstream)
        manifest.update(after_dedup=0, dedup_metrics={},
                        after_decontaminate=0, output=0,
                        total_tokens=0, n_shards=0)
        if clean is not None:
            manifest["after_clean"] = 0
            manifest["clean_dup_tokens" if clean == "substring"
                     else "clean_dup_passages"] = 0
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          text_col: pa.array([], pa.string()),
                          "n_tokens": pa.array([], pa.int64()),
                          "token_offset": pa.array([], pa.int64()),
                          "shard_id": pa.array([], pa.int64())})
        return PrepResult(docs=ray.data.from_arrow(empty),
                          manifest=manifest)

    # 3. dedup (exact + near): keep canonical docs only ----------------
    res = dedup_pipeline(docs, cfg, id_col=id_col, text_col=text_col)
    # one survivor per duplicate CLUSTER: labels are min-member ids,
    # so the member whose cluster_id equals its own id is the unique
    # canonical (is_dup alone only covers exact dups — near-dup
    # membership lives in cluster_id)
    # assignments are id-normalized to "doc_id" by dedup_pipeline
    # regardless of the caller's id_col
    canon_ids = res.assignments.map_batches(
        lambda b: pa.table({id_col: b.filter(
            pc.equal(b.column("cluster_id"),
                     b.column("doc_id"))).column("doc_id")}),
        batch_format="pyarrow")
    docs = semi_join(docs, canon_ids, id_col).materialize()
    manifest["after_dedup"] = int(docs.count())
    manifest["dedup_metrics"] = {
        k: v for k, v in res.metrics.items()
        if k in ("candidate_pairs", "verified_pairs", "cluster_edges")}

    # 4. decontamination ------------------------------------------------
    if test_docs is not None:
        test_grams = distinct_rows(
            test_docs.map_batches(
                _gram_rows(text_col, None, decontam_k, True),
                batch_format="pyarrow"),
            ["gram"])
        doc_grams = docs.map_batches(
            _gram_rows(text_col, id_col, decontam_k, True),
            batch_format="pyarrow")
        bad_ids = distinct_rows(
            semi_join(doc_grams, test_grams, "gram")
            .select_columns([id_col]), [id_col])
        docs = anti_join(docs, bad_ids, id_col).materialize()
    manifest["after_decontaminate"] = int(docs.count())

    # 4.5 optional passage-level cleaning (byte rewriting) --------------
    if clean is not None:
        if clean == "substring":
            from dedup_restore_ray.stages.exactsubstr import \
                exact_substring_clean
            cleaned = exact_substring_clean(
                docs, k=clean_k, mode="first_wins", id_col=id_col,
                text_col=text_col, emit_text=True)
            dup_count_col, manifest_key = ("n_dup_tokens",
                                           "clean_dup_tokens")
        elif clean == "passage":
            from dedup_restore_ray.stages.passages import passage_dedup
            cleaned = passage_dedup(
                docs, window=clean_window, mode="first_wins",
                id_col=id_col, text_col=text_col, emit_text=True)
            dup_count_col, manifest_key = ("n_dup_passages",
                                           "clean_dup_passages")
        else:
            raise ValueError(f"clean must be None, 'substring' or "
                             f"'passage', got {clean!r}")

        def swap_text(b: pa.Table) -> pa.Table:
            return pa.table({id_col: b.column("doc_id"),
                             text_col: b.column("clean_text"),
                             "__dup": b.column(dup_count_col)})

        cleaned = cleaned.map_batches(swap_text,
                                      batch_format="pyarrow").materialize()
        # removed volume counts EVERY doc, including ones rewritten
        # away entirely (which the non-empty filter below drops)
        manifest[manifest_key] = int(cleaned.sum("__dup") or 0)

        def non_empty(b: pa.Table) -> pa.Table:
            t = b.filter(pc.greater(pc.utf8_length(b.column(text_col)),
                                    pa.scalar(0)))
            return t.drop_columns(["__dup"])

        docs = cleaned.map_batches(non_empty,
                                   batch_format="pyarrow").materialize()
        manifest["after_clean"] = int(docs.count())

    # 5. token counts + contiguous shard packing ------------------------
    hasher = WordHasher()

    def tok_counts(b: pa.Table) -> pa.Table:
        _, counts = arrow_token_hashes(b.column(text_col), hasher)
        return pa.table({id_col: b.column(id_col),
                         text_col: b.column(text_col),
                         "n_tokens": pa.array(counts, pa.int64())})

    counted = docs.map_batches(tok_counts, batch_format="pyarrow")
    offs = global_running_sum(counted, [id_col], "n_tokens",
                              out_col="token_offset",
                              carry_cols=[id_col, text_col,
                                          "n_tokens"])

    def shard(b: pa.Table) -> pa.Table:
        off = np.asarray(b.column("token_offset"), dtype=np.int64)
        return b.append_column(
            "shard_id", pa.array(off // shard_capacity))

    out = offs.map_batches(shard,
                           batch_format="pyarrow").materialize()
    manifest["output"] = int(out.count())
    manifest["total_tokens"] = int(out.sum("n_tokens") or 0)
    manifest["n_shards"] = (int(out.max("shard_id")) + 1
                            if manifest["output"] else 0)
    return PrepResult(docs=out, manifest=manifest)
