"""Structured-Streaming surface (SURVEY §2.7): the epoch pipeline as a
micro-batch stream, plus event-time windowing with a late-data watermark.

Reference mapping:
- T1 micro-batching: Scrapy pushes items one-at-a-time through pipeline
  priorities (/root/reference/src/newsutils/conf/posts.py:86-91); here each
  micro-batch runs the same ordered stages set-wise inside ``foreachBatch``.
- T2 event-time windows: collection-per-day (crawl/day.py:27-43) becomes
  ``window(publish_time, '1 day')``.
- T3 late data: FilterDate drops out-of-window posts (pipelines.py:46-57)
  → ``withWatermark`` + windowed aggregation drops late rows the same way.
- T5 checkpoint/resume: ``checkpointLocation`` + the snapshot tables give
  at-least-once per micro-batch with idempotent MERGE keyed on epoch
  (exactly-once at the table level).

The streaming source in this sandbox is a file source over a directory of
discovered-URL parquet drops (a real deployment points the same code at
Kafka or an Iceberg CDC stream — only ``readStream`` options change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators import dedup, politeness
from ..sources import fetch as fetch_ops
from ..sources.snapshot_table import SnapshotTable


def read_url_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    """Streaming source of discovered URLs (FRONTIER-schema parquet drops)."""
    return (
        spark.readStream.schema(schemas.FRONTIER)
        .option("maxFilesPerTrigger", 8)
        .parquet(drop_dir)
    )


def process_fetch_batch(batch: DataFrame, batch_id: int,
                        url_seen_t: SnapshotTable, fetched_t: SnapshotTable,
                        images: DataFrame, robots: DataFrame) -> None:
    """One micro-batch of the crawl stream: dedup vs the url_seen state
    table → politeness → fetch join → commit fetched + url_seen.

    Replay safety (T5): batch ids are monotonic and the batch computation
    is deterministic, so EACH table's append is guarded on that table's OWN
    ``last_batch`` watermark. A crash between the two appends (fetched
    committed, url_seen not) replays the batch on restart: the fetched
    append is skipped (already at batch_id) while the url_seen append still
    runs — no lost url_seen keys, no duplicate fetched rows. A single
    whole-batch guard on the first-committed table would skip the replay
    entirely and permanently drop the second table's rows."""
    fetched_done = int(fetched_t.manifest()["meta"].get("last_batch", -1)) >= batch_id
    seen_done = int(url_seen_t.manifest()["meta"].get("last_batch", -1)) >= batch_id
    if fetched_done and seen_done:
        return  # fully committed — idempotent skip
    seen = url_seen_t.read(batch.sparkSession)
    from pyspark.sql import Window

    from ..operators import frontier as fr_ops

    # NB: commit ORDER is load-bearing even with per-table guards: fetched
    # must commit before url_seen. If url_seen committed first and the job
    # died before the fetched append, the replay would read its own batch's
    # keys as already-seen and compute fresh = ∅, losing the fetched rows.
    fresh = dedup.exact_new_urls(batch, seen).withColumn(
        "pop_rank",
        F.row_number().over(
            Window.partitionBy("host").orderBy(*fr_ops.pop_order())
        ),
    )
    polite = politeness.with_politeness(fresh, robots)
    if not fetched_done:
        fetched = fetch_ops.execute_fetches(polite, images, epoch=batch_id) \
            .unionByName(fetch_ops.denied_rows(polite, epoch=batch_id))
        # partition on epoch so the composition's posts stage reads ONE
        # epoch dir via manifest pruning instead of filtering the whole
        # (append-mostly, ever-growing) table — the same treatment the
        # day-partitioned posts table got in round 4 (VERDICT r4 #8)
        fetched_t.append(fetched, meta={"last_batch": batch_id},
                         part_expr="epoch")
    if not seen_done:
        url_seen_t.append(
            dedup.seen_updates(
                polite.where(F.col("polite_status") != "deferred"), batch_id),
            meta={"last_batch": batch_id},
        )


def run_fetch_stream(spark: SparkSession, drop_dir: str, state_root: str,
                     images: DataFrame, robots: DataFrame,
                     checkpoint: str, available_now: bool = True):
    """The crawl pipeline as a stream (see ``process_fetch_batch`` for the
    per-batch semantics and replay guarantees). Returns the started
    StreamingQuery."""
    import os

    url_seen_t = SnapshotTable(os.path.join(state_root, "url_seen"), schemas.URL_SEEN)
    fetched_t = SnapshotTable(os.path.join(state_root, "fetched"), schemas.FETCHED)

    def process(batch: DataFrame, batch_id: int) -> None:
        process_fetch_batch(batch, batch_id, url_seen_t, fetched_t,
                            images, robots)

    writer = (
        read_url_stream(spark, drop_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def process_crawl_stream_batch(batch: DataFrame, batch_id: int,
                               url_seen_t: SnapshotTable,
                               fetched_t: SnapshotTable,
                               images: DataFrame, robots: DataFrame,
                               posts_table: SnapshotTable,
                               dates, source_url: str,
                               papers: DataFrame | None = None,
                               post_sections: dict[str, str] | None = None,
                               settings=None) -> None:
    """Full crawl→posts composition per micro-batch: the fetch stage
    (``process_fetch_batch`` — dedup → politeness → fetch → commit fetched
    + url_seen with per-table replay guards), then this batch's fetched
    HTML pages through parse → posts pipeline → partitioned MERGE, all
    inside ONE ``foreachBatch`` (VERDICT r3 #8: streaming parity with
    ``run_crawl_day``; reference: spiders parse + item pipeline run in the
    same Scrapy process, crawl/spiders.py:95-140 → conf/posts.py:86-91).

    Replay safety: commit order is fetched → url_seen → posts MERGE. The
    posts stage reads its pages from the COMMITTED fetched table (epoch ==
    batch_id), never from the recomputed batch plan — after a crash that
    landed url_seen but not posts, the replayed plan computes fresh = ∅
    (its own keys are now seen), so deriving pages from it would silently
    lose the batch's posts; the fetched table still has them. The MERGE is
    keyed on post_id (idempotent) and stamps ``last_batch`` so a fully
    committed batch replays as a no-op. The fetched table is PARTITIONED on
    epoch, so this read lists only the batch's own dirs (manifest partition
    pruning — VERDICT r4 #8); the residual epoch predicate still reaches
    parquet as a row-group min/max prune, belt-and-braces."""
    process_fetch_batch(batch, batch_id, url_seen_t, fetched_t, images,
                        robots)
    if int(posts_table.manifest()["meta"].get("last_batch", -1)) >= batch_id:
        return
    from ..plans import crawl_compose, posts_pipeline

    spark = batch.sparkSession
    pages = (
        fetched_t.read(spark, partitions=[str(batch_id)])
        .where((F.col("epoch") == batch_id) & (F.col("status") == "ok") &
               (F.col("fmt") == "html") & F.col("bytes").isNotNull())
        .select("url", F.col("bytes").cast("string").alias("html"))
    )
    posts = crawl_compose.crawl_pages_to_posts(
        pages, source_url, papers=papers, post_sections=post_sections)
    posts_pipeline.process_crawl_batch(
        spark, posts, posts_table, dates, settings=settings,
        merge_meta={"last_batch": batch_id})


def run_crawl_stream(spark: SparkSession, drop_dir: str, state_root: str,
                     images: DataFrame, robots: DataFrame,
                     posts_table: SnapshotTable, dates, source_url: str,
                     checkpoint: str, available_now: bool = True,
                     papers: DataFrame | None = None,
                     post_sections: dict[str, str] | None = None):
    """``run_fetch_stream`` + the posts pipeline chained per micro-batch
    (see ``process_crawl_stream_batch``). Returns the StreamingQuery."""
    import os

    url_seen_t = SnapshotTable(os.path.join(state_root, "url_seen"),
                               schemas.URL_SEEN)
    fetched_t = SnapshotTable(os.path.join(state_root, "fetched"),
                              schemas.FETCHED)

    def process(batch: DataFrame, batch_id: int) -> None:
        process_crawl_stream_batch(batch, batch_id, url_seen_t, fetched_t,
                                   images, robots, posts_table, dates,
                                   source_url, papers=papers,
                                   post_sections=post_sections)

    writer = (
        read_url_stream(spark, drop_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_post_counts(posts_stream: DataFrame,
                         watermark: str = "1 day",
                         window_len: str = "1 day") -> DataFrame:
    """T2/T3: per-day tumbling-window post counts with late-data drop."""
    return (
        posts_stream.withWatermark("publish_time", watermark)
        .groupBy(F.window("publish_time", window_len).alias("day_window"),
                 F.col("type"))
        .agg(F.count("*").alias("n_posts"))
        .select(
            F.to_date(F.col("day_window.start")).alias("day"),
            "type", "n_posts",
        )
    )
