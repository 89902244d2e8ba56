"""Post pipeline stage 1: validity + event-time window filters (F1/F2).

Reference semantics:
- validity: drop empty items / null publish_time, pluggable ``validate()``
  hook (/root/reference/src/newsutils/crawl/pipelines.py:105-151);
- FilterDate: keep a post iff ``date(publish_time) ∈ filter_dates`` where
  filter_dates = closed [days_from, days_to] range ∪ explicit day list,
  defaulting to today (/root/reference/src/newsutils/pipelines.py:38-62,
  crawl/spiders.py:163-185). In streaming terms this is the late-data
  policy: out-of-window rows are dropped (SURVEY §2.7 T3).

Both are pure Column predicates → Catalyst pushes them into the scan and
prunes ``days(publish_time)`` partitions (the engine's equivalent of the
reference's collection-per-day layout).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_dates(
    days_from: str | dt.date | None = None,
    days_to: str | dt.date | None = None,
    days: list[str | dt.date] | None = None,
    today: dt.date | None = None,
) -> list[dt.date]:
    """Expand (from, to, explicit-days) into the filter-date list (C9 —
    daily-query ``parse_dates`` semantics inferred from call sites,
    /root/reference/src/newsutils/crawl/spiders.py:163-185). Defaults to
    [today] when nothing is given."""

    def as_date(x: str | dt.date) -> dt.date:
        return x if isinstance(x, dt.date) else dt.date.fromisoformat(str(x))

    out: list[dt.date] = []
    if days_from is not None or days_to is not None:
        lo = as_date(days_from) if days_from is not None else as_date(days_to)
        hi = as_date(days_to) if days_to is not None else (today or dt.date.today())
        d = lo
        while d <= hi:
            out.append(d)
            d += dt.timedelta(days=1)
    for d in days or []:
        out.append(as_date(d))
    if not out:
        out = [today or dt.date.today()]
    return sorted(set(out))


def valid_predicate(extra: Column | None = None) -> Column:
    """F1: non-null publish_time AND a non-empty identity (short_link).
    ``extra`` is the pluggable validate() hook as a Column predicate."""
    p = (
        F.col("publish_time").isNotNull()
        & F.col("short_link").isNotNull()
        & (F.length(F.col("short_link")) > 0)
    )
    return p & extra if extra is not None else p


def filter_valid(posts: DataFrame, extra: Column | None = None) -> DataFrame:
    return posts.where(valid_predicate(extra))


def filter_date(posts: DataFrame, dates: list[dt.date],
                ts_col: str = "publish_time") -> DataFrame:
    """F2: event-time window filter. ``isin`` over literal dates reaches the
    parquet scan as an IN filter → partition pruning on days(publish_time)."""
    return posts.where(F.to_date(F.col(ts_col)).isin([d.isoformat() for d in dates]))


def filter_metapost(posts: DataFrame, nlp_uses_meta: bool = False) -> DataFrame:
    """F3: exclude metapost rows from NLP inputs unless configured otherwise
    (/root/reference/src/newsutils/conf/mixins.py:118-133)."""
    if nlp_uses_meta:
        return posts
    return posts.where(~F.col("type").startswith("metapost"))
