"""End-to-end training-corpus preparation: the composition a 100 TB
pretraining-data pipeline actually runs, built from the engine's
first-class training operators (COVERAGE.md "LLM-data ops").

    analyze (lang id, quality, token counts, fingerprint)   1 projection
    → gates (lang allowlist, quality floor, length band)    pushed filters
    → exact dedup (fingerprint groupBy, lowest-id keeper)   1 shuffle
    → near-dup pairs (MinHash-LSH candidate → verify)       bucketed joins
    → connected components (large/small-star)               O(log n) rounds
    → keeper selection (component min)                      1 join

Every stage is a DataFrame transformation on the previous stage's output —
the whole job is ONE logical plan per action, Catalyst fuses the gates into
the scan. Nothing here is sandbox-shaped: the same code runs over a 100 TB
documents table because each stage only ever shuffles on content keys
(fingerprint / band bucket / pair node), never collects, and the near-dup
stage is candidate-bounded (LSH buckets + prefix-filter, no all-pairs).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import training


@dataclass
class CorpusStats:
    docs_in: int
    after_gates: int
    after_exact: int
    near_dup_pairs: int
    components: int
    kept: int


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    jaccard_min: float = 0.6,
    k_shingle: int = 3,
    with_stats: bool = False,
) -> DataFrame | tuple[DataFrame, CorpusStats]:
    """The prepared corpus: gated, exact-deduped, near-dup-clustered rows
    with ``component`` + ``is_keeper`` columns; downstream training reads
    ``WHERE is_keeper`` (keeping the losers queryable for auditing — the
    standard 'soft delete' shape). ``with_stats=True`` adds per-stage
    counts (each an extra aggregation job over a cached frame)."""
    analyzed = training.analyze_documents(docs, text_col=text_col)
    gated = analyzed.where(
        F.col("lang_pred").isin(*langs)
        & (F.col("quality") >= min_quality)
        & F.col("n_tokens_ws").between(min_tokens, max_tokens)
    )
    exact = training.dedup_exact(gated, id_col=id_col, text_col=text_col)
    if with_stats:
        exact = exact.cache()
    pairs = training.minhash_near_dups(
        exact, id_col=id_col, text_col=text_col,
        k_shingle=k_shingle, jaccard_min=jaccard_min)
    if with_stats:
        pairs = pairs.cache()
    out = training.dedup_components(exact, pairs, id_col=id_col)
    if not with_stats:
        return out
    out = out.cache()
    stats = CorpusStats(
        docs_in=docs.count(),
        after_gates=gated.count(),
        after_exact=exact.count(),
        near_dup_pairs=pairs.count(),
        components=out.select("component").distinct().count(),
        kept=out.where("is_keeper").count(),
    )
    return out, stats
