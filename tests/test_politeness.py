"""Politeness gate: robots disallow + token-bucket allowance (T6).

Reference budget: ROBOTSTXT_OBEY=True, 16/domain
(/root/reference/demo/default_settings.py:22-32); 1-req/60s extreme
(/root/reference/src/newsutils/ezines/thesportsdb.py:698-699).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scrapy_newsutils_spark.operators import frontier as fr
from scrapy_newsutils_spark.operators import politeness as pol


def _mk_popped(spark, host, n, path="/p/"):
    base = dt.datetime(2024, 3, 1)
    rows = [
        (f"https://{host}{path}{i}", f"x){path}{i}", i + 1, host, 0.5, 1,
         base + dt.timedelta(seconds=i), None, 0, i + 1)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "url string, url_surt string, url_key long, host string, priority double,"
        "depth int, discovered_ts timestamp, image_id string, epoch_added int,"
        "pop_rank int",
    )


def _mk_robots(spark, host, delay_ms, disallow=None, conc=16):
    return spark.createDataFrame(
        [(host, delay_ms, disallow or [], conc)],
        "host string, crawl_delay_ms int, disallow_prefixes array<string>,"
        "max_concurrency int",
    )


def test_zero_delay_allows_all(spark):
    popped = _mk_popped(spark, "a.com", 50)
    out = pol.with_politeness(popped, _mk_robots(spark, "a.com", 0))
    assert out.where(F.col("polite_status") == "ok").count() == 50


def test_60s_delay_allows_one_per_minute_budget(spark):
    """delay=60000ms, budget=60000ms → allowance 1: the e-zine extreme."""
    popped = _mk_popped(spark, "slow.com", 10)
    out = pol.with_politeness(popped, _mk_robots(spark, "slow.com", 60_000),
                              epoch_budget_ms=60_000)
    ok = out.where(F.col("polite_status") == "ok")
    assert ok.count() == 1
    assert ok.first()["pop_rank"] == 1
    assert out.where(F.col("polite_status") == "deferred").count() == 9


def test_500ms_delay_budget_arithmetic(spark):
    popped = _mk_popped(spark, "b.com", 200)
    out = pol.with_politeness(popped, _mk_robots(spark, "b.com", 500),
                              epoch_budget_ms=10_000)
    assert out.where(F.col("polite_status") == "ok").count() == 20  # 10000/500


def test_robots_disallow_prefix(spark):
    popped = _mk_popped(spark, "c.com", 10, path="/private/")
    out = pol.with_politeness(popped, _mk_robots(spark, "c.com", 0, ["/private"]))
    assert out.where(F.col("polite_status") == "robots_denied").count() == 10


def test_unknown_host_defaults_open(spark):
    popped = _mk_popped(spark, "nobody.com", 5)
    robots = _mk_robots(spark, "other.com", 60_000)
    out = pol.with_politeness(popped, robots)
    assert out.where(F.col("polite_status") == "ok").count() == 5


def test_pacing_timestamps_respect_delay(spark):
    popped = _mk_popped(spark, "d.com", 5)
    out = pol.with_politeness(popped, _mk_robots(spark, "d.com", 2000),
                              epoch_budget_ms=60_000)
    ms = [r["sim_fetch_ms"] for r in
          out.where(F.col("polite_status") == "ok").orderBy("pop_rank").collect()]
    assert ms == [0, 2000, 4000, 6000, 8000]
