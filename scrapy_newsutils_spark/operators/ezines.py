"""E-zine (sports API) path: deterministic ids + per-sport upsert (S7/K3/J8/C8).

Reference semantics (/root/reference/src/newsutils/ezines/thesportsdb.py):
- `_id` derived deterministically from the compound key
  (idLeague, idHomeTeam, idAwayTeam, idEvent) — :691-695 (C8);
- sport × league nested loop drives rate-limited fetches — :770-780 (J8)
  at 1 request / 60 s — :698-699 (T6, shared with the crawl politeness
  machinery: a 60000 ms crawl_delay row);
- upsert per sport collection (`update_one(..., upsert=True)`) — :782-810.

Engine: the compound key becomes xxhash64(concat_ws(...)); the nested loop
becomes a crossJoin of two tiny dims feeding the politeness-scheduled fetch
stage; the sink is merge_upsert on event_pk partitioned by strSport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMPOUND_KEY = ("idLeague", "idHomeTeam", "idAwayTeam", "idEvent")


def event_pk(df: DataFrame) -> DataFrame:
    """C8: deterministic 64-bit id from the 4-part compound key."""
    return df.withColumn("event_pk", F.xxhash64(F.concat_ws("", *COMPOUND_KEY)))


def dedupe_latest(df: DataFrame, order_col: str = "dateEvent") -> DataFrame:
    """Batch-internal upsert semantics: for duplicate compound keys the last
    write wins (the reference replays update_one per row in fetch order; a
    set-wise batch keeps the max-order row per key)."""
    return (
        df.groupBy("event_pk")
        .agg(F.max_by(F.struct([c for c in df.columns if c != "event_pk"]),
                      F.col(order_col)).alias("_r"))
        .select("event_pk", "_r.*")
    )


def fetch_plan(sports: DataFrame, leagues: DataFrame) -> DataFrame:
    """J8: the sport×league fan-out as a crossJoin of tiny dims. Each row is
    one API call for the politeness-scheduled fetch stage (the reference's
    nested for-loop, thesportsdb.py:770-780)."""
    return sports.crossJoin(leagues).select(
        "sport_id", "league_id",
        F.concat_ws("", F.lit("eventsseason.php?id="), F.col("league_id")).alias("endpoint"),
    )
