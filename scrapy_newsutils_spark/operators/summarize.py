"""Summarization / caption / categorization stage (U2) — deterministic stubs.

The reference calls external seq2seq models (`newsnlp` TextSummarizer /
TitleSummarizer / Categorizer, /root/reference/src/newsutils/nlp.py:67-69,
151-183, 336-341) with a ≤1024-word input cap (nlp.py:222). The model
libraries are not in this container, so the engine ships deterministic
extractive stand-ins with the SAME Spark-side plumbing the real models use:
iterator-of-series pandas UDFs (one model load per executor python worker,
Arrow batches), truncation to the capacity limit, identical column wiring.
Swap `_summarize_batch` for a real model call in production.

The *semantics under test* are extraction order, capacity truncation, and
column routing — not model weights (SURVEY §7 step 9).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_WORDS = 1024  # summarizer capacity (nlp.py:222)


def _truncate_words(text: str, cap: int = MAX_WORDS) -> str:
    words = text.split(" ")
    return " ".join(words[:cap])


def _first_sentences(text: str, n: int) -> str:
    import re

    sents = [s.strip() for s in re.split(r"(?<=[.!?…])\s+", text) if s.strip()]
    return " ".join(sents[:n])


@F.pandas_udf(T.StringType())
def summary_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
    # iterator-of-series form: a real model would be loaded once here
    for batch in texts:
        yield batch.map(
            lambda t: _first_sentences(_truncate_words(t or ""), 3)
        )


@F.pandas_udf(T.StringType())
def caption_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
    for batch in texts:
        yield batch.map(
            lambda t: _first_sentences(_truncate_words(t or ""), 1)
        )


@F.pandas_udf(T.StringType())
def category_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
    # deterministic lexicon categorizer stand-in
    lexicon = {
        "sports": ("match", "score", "team", "league", "game", "player"),
        "economy": ("market", "trade", "energy", "price", "bank"),
        "culture": ("festival", "music", "film", "art"),
    }
    def cat(t: str) -> str:
        toks = set((t or "").lower().split())
        best, hits = "general", 0
        for c, words in sorted(lexicon.items()):
            h = sum(w in toks for w in words)
            if h > hits:
                best, hits = c, h
        return best

    for batch in texts:
        yield batch.map(cat)


def save_summary(posts: DataFrame, text_expr=None) -> DataFrame:
    """The `scrapy nlp summary` verb (nlp.py:151-183): writes summary,
    caption, category columns from the post text."""
    src = text_expr if text_expr is not None else F.col("text")
    return (
        posts.withColumn("summary", summary_udf(src))
        .withColumn("caption", caption_udf(src))
        .withColumn("category", category_udf(src))
    )
