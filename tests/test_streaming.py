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

    def dying_append(self, df, meta=None, expected_version=None, **kw):
        if self.path == url_seen_t.path:
            raise Boom()
        return real_append(self, df, meta, expected_version, **kw)

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


# -- chained crawl→posts streaming composition (VERDICT r3 #8) -----------------

_SRC = "https://news.example.com"


def _article_world(spark, n):
    """Payload table of fmt='html' article pages: title, published_time on a
    5-day cycle (inside the pipeline's date window), story text, one link."""
    import pandas as pd

    rows = []
    for i in range(n):
        html = (
            f"<html><head><title>Story {i}</title>"
            f'<meta property="article:published_time" '
            f'content="2024-03-{i % 5 + 1:02d}T08:00:00"/></head>'
            '<body><div class="story"><p>'
            + " ".join(f"word{i}x{j}" for j in range(30))
            + f'</p><a href="/post/{(i + 1) % n}">next</a></div></body></html>'
        )
        rows.append({"image_id": f"pg-{i}", "bytes": html.encode(),
                     "w": None, "h": None, "fmt": "html",
                     "caption": f"caption {i}", "phash": i})
    return spark.createDataFrame(pd.DataFrame(rows), schema=schemas.IMAGES)


def _article_frontier(spark, n):
    import pandas as pd

    from scrapy_newsutils_spark.functions import urls as url_fns

    pdf = pd.DataFrame([{"url": f"{_SRC}/post/{i}", "image_id": f"pg-{i}"}
                        for i in range(n)])
    return url_fns.with_url_identity(spark.createDataFrame(pdf)).select(
        "url", "url_surt", "url_key", "host",
        F.lit(1.0).alias("priority"), F.lit(0).alias("depth"),
        F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("discovered_ts"),
        "image_id", F.lit(0).alias("epoch_added"),
    ).select([f.name for f in schemas.FRONTIER.fields])


def _article_robots(spark):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame([{"host": "news.example.com", "crawl_delay_ms": 0,
                       "disallow_prefixes": [], "max_concurrency": 64}]),
        schema=schemas.ROBOTS)


def _run_crawl_stream(spark, root, images, robots, posts_t, n):
    import scrapy_newsutils_spark.operators.pipeline as P

    drop_dir = os.path.join(root, "drops")
    if not os.path.isdir(drop_dir):
        os.makedirs(drop_dir)
        _article_frontier(spark, n).repartition(10) \
            .write.mode("overwrite").parquet(drop_dir)
    dates = P.parse_dates("2024-03-01", "2024-03-06")
    return ST.run_crawl_stream(
        spark, drop_dir, os.path.join(root, "state"), images, robots,
        posts_t, dates, _SRC, checkpoint=os.path.join(root, "ckpt"),
        available_now=True)


def test_crawl_stream_lands_posts(spark, tmp_path):
    """Posts pipeline chained inside foreachBatch: streamed URL drops end as
    MERGEd POSTS rows (parse → mk_post → F1/F2/J2 → partitioned MERGE)."""
    n = 20
    images, robots = _article_world(spark, n), _article_robots(spark)
    posts_t = SnapshotTable(str(tmp_path / "posts"), schemas.POSTS)
    q = _run_crawl_stream(spark, str(tmp_path / "run"), images, robots,
                          posts_t, n)
    q.awaitTermination(timeout=300)

    posts = posts_t.read(spark)
    assert posts.count() == n
    assert posts.select("post_id").distinct().count() == n
    titles = {r["title"] for r in posts.select("title").collect()}
    assert titles == {f"Story {i}" for i in range(n)}
    # landed through the partitioned MERGE (day partitions in the manifest)
    assert len(posts_t.partition_layout()) == 5


def test_crawl_stream_kill_before_posts_merge_exactly_once(spark, tmp_path):
    """Mid-stream kill between the fetch-stage commits and the posts MERGE:
    the restarted stream must land the batch's posts exactly once (the
    replay reads pages from the COMMITTED fetched table — recomputing the
    batch plan would see its own keys as seen and lose the posts)."""
    n = 20
    images, robots = _article_world(spark, n), _article_robots(spark)

    # uninterrupted reference run
    ref_t = SnapshotTable(str(tmp_path / "posts_ref"), schemas.POSTS)
    qr = _run_crawl_stream(spark, str(tmp_path / "ref"), images, robots,
                           ref_t, n)
    qr.awaitTermination(timeout=300)

    posts_t = SnapshotTable(str(tmp_path / "posts_b"), schemas.POSTS)

    class Boom(RuntimeError):
        pass

    real_merge = SnapshotTable.merge_upsert_partitioned
    state = {"armed": True}

    def dying_merge(self, *a, **k):
        if state["armed"] and self.path == posts_t.path:
            state["armed"] = False
            raise Boom()  # crash AFTER fetched+url_seen committed
        return real_merge(self, *a, **k)

    SnapshotTable.merge_upsert_partitioned = dying_merge
    try:
        q = _run_crawl_stream(spark, str(tmp_path / "b"), images, robots,
                              posts_t, n)
        with pytest.raises(Exception):
            q.awaitTermination(timeout=300)
            raise RuntimeError("stream did not fail")  # pragma: no cover
    finally:
        SnapshotTable.merge_upsert_partitioned = real_merge

    fetched_t = SnapshotTable(str(tmp_path / "b" / "state" / "fetched"),
                              schemas.FETCHED)
    assert fetched_t.read(spark).count() > 0   # fetch stage committed
    assert posts_t.read(spark).count() == 0    # posts did not

    # restart over the same checkpoint: failed batch replays, then the rest
    q2 = _run_crawl_stream(spark, str(tmp_path / "b"), images, robots,
                           posts_t, n)
    q2.awaitTermination(timeout=300)

    posts, ref = posts_t.read(spark), ref_t.read(spark)
    key = lambda df: sorted(
        (r["post_id"], r["title"], str(r["publish_time"]), r["version"])
        for r in df.select("post_id", "title", "publish_time",
                           "version").collect())
    assert key(posts) == key(ref)
    assert posts.count() == posts.select("post_id").distinct().count()
    fetched = fetched_t.read(spark)
    assert fetched.count() == fetched.select("url_key").distinct().count()


def test_crawl_stream_posts_stage_prunes_fetched_partitions(spark, tmp_path):
    """VERDICT r4 #8: the streaming fetched table is partitioned on epoch,
    so the posts stage's committed-pages read lists ONLY the batch's own
    dirs (manifest partition pruning), never the whole append-mostly
    table."""
    n = 40
    images, robots = _article_world(spark, n), _article_robots(spark)
    posts_t = SnapshotTable(str(tmp_path / "posts"), schemas.POSTS)
    q = _run_crawl_stream(spark, str(tmp_path / "run"), images, robots,
                          posts_t, n)
    q.awaitTermination(timeout=300)

    fetched_t = SnapshotTable(str(tmp_path / "run" / "state" / "fetched"),
                              schemas.FETCHED)
    layout = fetched_t.partition_layout()
    assert len(layout) > 1, "drops should span several micro-batches"
    bid = sorted(layout, key=int)[0]
    own = set(layout[bid])
    other = {d for pv, ds in layout.items() if pv != bid for d in ds}
    df = fetched_t.read(spark, partitions=[bid])
    files = df.inputFiles()
    assert files
    for f in files:
        assert any(f"/{d}/" in f for d in own), f
        assert not any(f"/{dd}/" in f for dd in other), f
    # pruned read == full read filtered on epoch
    full = fetched_t.read(spark).where(F.col("epoch") == int(bid))
    assert df.count() == full.count() > 0
