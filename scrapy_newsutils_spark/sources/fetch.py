"""The fetch stage: politeness-gated lookup into the images payload table.

In production this stage is a ``mapInPandas`` batched HTTP fetch (reference:
``requests.get`` per image, /root/reference/src/newsutils/pipelines.py:208-213,
and newspaper3k article fetch, crawl/spiders.py:95-140). The sandbox has no
network, so "the web" is the synthetic ``images`` table (FIXTURES.md §1):
fetching a URL means joining its ``image_id`` against that table — a real
distributed join with the same shuffle/partitioning shape a batched fetch
stage has (hash on host for budget locality, skew-salted via AQE).

The stage is deliberately split:
  1. ``plan_fetches`` — pure DataFrame: politeness decisions + pacing;
  2. ``execute_fetches`` — the join; per-row work (decode/verify) happens
     downstream in Arrow batches, never here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas


def execute_fetches(polite: DataFrame, images: DataFrame, epoch: int) -> DataFrame:
    """Join 'ok' popped rows with the payload table → FETCHED rows.

    The images side is joined on image_id; AQE picks broadcast when the
    epoch's image slice is small, shuffle-hash otherwise. Missing payloads
    (dangling image_id / null) become status='missing' (reference drops
    undecodable images silently — pipelines.py:213-214 — but the engine
    keeps an auditable row).
    """
    ok = polite.where(F.col("polite_status") == "ok")
    joined = ok.join(images, "image_id", "left")
    return joined.select(
        F.col("url_key"),
        F.col("url"),
        F.col("host"),
        F.lit(epoch).alias("epoch"),
        F.col("image_id"),
        F.col("bytes"),
        F.col("w"),
        F.col("h"),
        F.col("fmt"),
        F.col("caption"),
        F.col("phash"),
        F.col("sim_fetch_ms").alias("fetch_ms"),
        F.when(F.col("image_id").isNull() | F.col("bytes").isNull(), F.lit("missing"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def fetch_epoch_rows(polite: DataFrame, images: DataFrame, epoch: int) -> DataFrame:
    """``execute_fetches ∪ denied_rows`` as ONE single-branch plan.

    The union form scans ``polite`` twice (two branches below the union);
    with observation-based epoch counters attached to ``polite`` a doubled
    subtree would double-count the metrics, and during the first (pre-cache)
    materialization both branches race to compute the same partitions. Here
    robots-denied rows ride the same left join with a nulled join key, so
    ``polite`` appears exactly once and the payload join shape (AQE
    broadcast vs shuffle-hash) is unchanged. Row-for-row identical output
    to the union form (asserted in tests).
    """
    attempted = polite.where(F.col("polite_status") != "deferred")
    is_denied = F.col("polite_status") == "robots_denied"
    probe = attempted.withColumn(
        "_fetch_id",
        F.when(F.col("polite_status") == "ok", F.col("image_id")),
    )
    payload = images.select(
        F.col("image_id").alias("_fetch_id"),
        "bytes", "w", "h", "fmt", "caption", "phash",
    )
    joined = probe.join(payload, "_fetch_id", "left")
    return joined.select(
        F.col("url_key"),
        F.col("url"),
        F.col("host"),
        F.lit(epoch).alias("epoch"),
        F.when(is_denied, F.lit(None).cast("string"))
        .otherwise(F.col("image_id")).alias("image_id"),
        F.col("bytes"),
        F.col("w"),
        F.col("h"),
        F.col("fmt"),
        F.col("caption"),
        F.col("phash"),
        # sim_fetch_ms is already null for non-ok rows (politeness sets it
        # only on status='ok'), so no branch is needed here
        F.col("sim_fetch_ms").alias("fetch_ms"),
        F.when(is_denied, F.lit("robots_denied"))
        .when(F.col("image_id").isNull() | F.col("bytes").isNull(), F.lit("missing"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def denied_rows(polite: DataFrame, epoch: int) -> DataFrame:
    """robots-denied rows as auditable FETCHED rows (no payload)."""
    return polite.where(F.col("polite_status") == "robots_denied").select(
        "url_key",
        "url",
        "host",
        F.lit(epoch).alias("epoch"),
        F.lit(None).cast("string").alias("image_id"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.lit(None).cast("string").alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
        F.lit(None).cast("long").alias("fetch_ms"),
        F.lit("robots_denied").alias("status"),
    )


def fetched_schema_cols() -> list[str]:
    return [f.name for f in schemas.FETCHED.fields]
