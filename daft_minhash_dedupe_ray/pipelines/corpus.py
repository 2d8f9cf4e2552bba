"""Training-corpus assembly: the end-to-end flow a user of the reference
engine composes from individual operators, packaged as one streaming chain.

    quality gate (exact corpus quantile of token counts, no shuffle)
      -> exact dedupe (hash-partitioned min-keep)
      -> MinHash/LSH near-dup dedupe (the flagship pipeline, caption side)
      -> ExactSubstr duplicated-span removal (cross-doc, keeper = min id)

Every stage consumes the previous stage's ``ray.data.Dataset`` — nothing
materializes on the driver; the stages that shuffle do so through the same
partition-granular exchanges they use standalone.  The composition is
SQL-checked end to end (``sql_oracle.corpus_assembly_sql`` chains the four
stages' proven oracle fragments over the same input), which pins not just
each operator but the *hand-offs* between them (schema, survivor sets,
ordering independence).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DedupeConfig


def assemble_corpus(
    ds,
    *,
    quality_q: float = 0.25,
    span_min_len: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 64,
    ngram_size: int = 5,
    seed: int = 42,
    num_actors: int = 4,
):
    """Input docs Dataset -> (id_col, text, n_spans_removed) Dataset of the
    assembled corpus: quality-gated, exactly and near-deduplicated, with
    cross-doc duplicated spans cut."""
    from ..functions.similarity import exact_dedup
    from ..functions.span_dedupe import remove_dup_spans
    from ..functions.textops import quality_quantile_filter
    from .dedupe import MinHashDedupePipeline

    cfg = DedupeConfig(
        index_col=id_col,
        content_col=text_col,
        phash_col=None,
        threshold=threshold,
        num_perm=num_perm,
        ngram_size=ngram_size,
        seed=seed,
    )
    gated = quality_quantile_filter(
        ds.select_columns([id_col, text_col]), q=quality_q, text_col=text_col
    )
    exact = exact_dedup(gated, text_col=text_col, id_col=id_col).select_columns(
        [id_col, text_col]
    )
    near = MinHashDedupePipeline(cfg)(exact, num_actors=num_actors)
    spans = remove_dup_spans(
        near.select_columns([id_col, text_col]),
        min_len=span_min_len,
        id_col=id_col,
        text_col=text_col,
    )

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                text_col: b["text_clean"],
                "n_spans_removed": b["n_removed"],
            }
        )

    return spans.map_batches(_rename, batch_format="pyarrow")
