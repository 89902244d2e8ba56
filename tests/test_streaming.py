"""Structured-Streaming surface: micro-batch fetch pipeline with idempotent
per-batch commits + event-time window aggregation (T1/T2/T3/T5)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from scrapy_newsutils_spark import fixtures, schemas
from scrapy_newsutils_spark.sources.snapshot_table import SnapshotTable
from scrapy_newsutils_spark.streaming import stream as ST


def test_fetch_stream_available_now(spark, tmp_path, images_df, robots_df,
                                    frontier_df):
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)
    frontier_df.limit(300).write.mode("overwrite").parquet(drop_dir)

    q = ST.run_fetch_stream(
        spark, drop_dir, str(tmp_path / "state"), images_df, robots_df,
        checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(timeout=300)

    fetched_t = SnapshotTable(str(tmp_path / "state" / "fetched"), schemas.FETCHED)
    seen_t = SnapshotTable(str(tmp_path / "state" / "url_seen"), schemas.URL_SEEN)
    fetched = fetched_t.read(spark)
    assert fetched.count() > 0
    # no URL fetched twice even across micro-batches
    assert fetched.count() == fetched.select("url_key").distinct().count()
    # every attempted url is in the seen state
    seen = {r["url_key"] for r in seen_t.read(spark).collect()}
    for r in fetched.select("url_key").collect():
        assert r["url_key"] in seen


def test_fetch_stream_restart_is_idempotent(spark, tmp_path, images_df,
                                            robots_df, frontier_df):
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)
    frontier_df.limit(200).write.mode("overwrite").parquet(drop_dir)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    q = ST.run_fetch_stream(spark, drop_dir, state, images_df, robots_df,
                            checkpoint=ckpt, available_now=True)
    q.awaitTermination(timeout=300)
    fetched_t = SnapshotTable(os.path.join(state, "fetched"), schemas.FETCHED)
    n1 = fetched_t.read(spark).count()

    # restart over the same checkpoint: no new files → no duplicate commits
    q2 = ST.run_fetch_stream(spark, drop_dir, state, images_df, robots_df,
                             checkpoint=ckpt, available_now=True)
    q2.awaitTermination(timeout=300)
    assert fetched_t.read(spark).count() == n1


def test_crash_between_appends_replays_url_seen(spark, tmp_path, images_df,
                                                robots_df, frontier_df):
    """T5 exactly-once gap (round-1 VERDICT): fetched commits before
    url_seen; a crash between the two must NOT lose the batch's url_seen
    keys on replay. Each append is guarded on its own table's last_batch."""
    state = tmp_path / "state"
    url_seen_t = SnapshotTable(str(state / "url_seen"), schemas.URL_SEEN)
    fetched_t = SnapshotTable(str(state / "fetched"), schemas.FETCHED)
    batch = frontier_df.limit(150)

    # batch 0 commits fully
    ST.process_fetch_batch(batch, 0, url_seen_t, fetched_t, images_df, robots_df)
    n_fetched_0 = fetched_t.read(spark).count()
    n_seen_0 = url_seen_t.read(spark).count()
    assert n_fetched_0 > 0 and n_seen_0 > 0

    # batch 1: simulate a crash AFTER the fetched append, BEFORE url_seen —
    # run the real code but with url_seen_t.append rigged to die
    batch1 = frontier_df.limit(250).subtract(batch)

    class Boom(RuntimeError):
        pass

    real_append = SnapshotTable.append

    def dying_append(self, df, meta=None, expected_version=None):
        if self.path == url_seen_t.path:
            raise Boom()
        return real_append(self, df, meta, expected_version)

    SnapshotTable.append = dying_append
    try:
        with pytest.raises(Boom):
            ST.process_fetch_batch(batch1, 1, url_seen_t, fetched_t,
                                   images_df, robots_df)
    finally:
        SnapshotTable.append = real_append

    n_fetched_crash = fetched_t.read(spark).count()
    assert n_fetched_crash > n_fetched_0          # fetched committed
    assert url_seen_t.read(spark).count() == n_seen_0  # url_seen did not

    # restart replays batch 1: url_seen catches up, fetched is NOT duplicated
    ST.process_fetch_batch(batch1, 1, url_seen_t, fetched_t, images_df, robots_df)
    fetched = fetched_t.read(spark)
    assert fetched.count() == n_fetched_crash
    assert fetched.count() == fetched.select("url_key").distinct().count()
    seen = {r["url_key"] for r in url_seen_t.read(spark).collect()}
    attempted = {r["url_key"] for r in
                 fetched.where(F.col("status") != "robots_denied")
                 .select("url_key").collect()}
    assert attempted <= seen  # every attempted url recorded as seen


def test_windowed_post_counts_batch_semantics(spark):
    """Window aggregation logic verified in batch mode (same expression)."""
    posts = fixtures.posts_batch(spark)
    out = ST.windowed_post_counts(posts.where(F.col("publish_time").isNotNull()))
    rows = out.collect()
    assert sum(r["n_posts"] for r in rows) == \
        posts.where(F.col("publish_time").isNotNull()).count()
    days = {r["day"] for r in rows}
    assert dt.date(2024, 3, 1) in days
