"""The reference's item pipeline as one set-oriented batch plan (§3.1).

Scrapy pushes each Post through priority-ordered stages
(/root/reference/src/newsutils/conf/posts.py:86-91):
FilterDate (100) → CheckEdits (110) → DropLowQualityImages (120) →
SaveToDb (300). Here the whole crawl batch flows through the same stages
set-wise, ending in one MERGE — and the image gate runs AFTER dedup/date
filtering, fixing the reference's known waste of scoring images for posts
later dropped (/root/reference/README.md:119-122).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators import edits, image_gate, pipeline
from ..sources.snapshot_table import SnapshotTable


@dataclass
class BatchStats:
    batch_in: int
    after_validity: int
    after_date: int
    pristine_dropped: int
    new: int
    new_version: int
    minor: int
    saved: int


def gate_post_images(posts: DataFrame, image_meta: DataFrame) -> DataFrame:
    """F4/F5 per post: explode the images array, join each URL's binary
    payload/metadata, gate, repack survivors (order-preserving) and refresh
    top_image. Posts keep an empty array when everything is gated away
    (reference drops the image, not the post — pipelines.py:151-226)."""
    exploded = posts.select(
        "post_id",
        F.posexplode_outer("images").alias("image_idx", "image_url"),
    )
    joined = exploded.join(
        image_meta.withColumnRenamed("url", "image_url"),
        "image_url", "left",
    )
    survivors = image_gate.gate_images(
        joined.where(F.col("bytes").isNotNull()), bytes_col="bytes"
    )
    repacked = image_gate.repack_post_images(survivors, "post_id", "image_url")
    return (
        posts.drop("images", "top_image")
        .join(repacked, "post_id", "left")
        .withColumn("images", F.coalesce("images", F.array().cast("array<string>")))
        .withColumn("top_image", F.col("top_image"))
    )


def process_crawl_batch(
    spark: SparkSession,
    batch: DataFrame,
    posts_table: SnapshotTable,
    dates: list[dt.date],
    image_meta: DataFrame | None = None,
    settings=None,
    merge_meta: dict | None = None,
) -> BatchStats:
    """One crawl batch through F1 → F2 → J2 → F4/F5 → K1, single MERGE.

    ``settings``: optional ``conf.AppSettings`` (the reference's layered
    Posts config) — drives the edit classification's computed
    ``edits_excluded_fields`` / ``edits_new_version_fields`` instead of the
    module constants.

    ``merge_meta``: manifest metadata recorded on the MERGE commit — the
    streaming composition stamps ``last_batch`` here so its replay guard
    can skip a micro-batch whose posts already landed."""
    n_in = batch.count()

    valid = pipeline.filter_valid(batch)
    n_valid = valid.count()

    dated = pipeline.filter_date(valid, dates).cache()
    n_dated = dated.count()

    existing = posts_table.read(spark)
    if settings is not None:
        from .. import conf

        classified = edits.classify_edits(
            dated, existing,
            new_version_fields=tuple(settings["EDITS_NEW_VERSION_FIELDS"]),
            excluded_fields=conf.settings_edits_excluded_fields(settings),
        ).cache()
    else:
        classified = edits.classify_edits(dated, existing).cache()
    by_status = {r["edit_status"]: r["n"] for r in
                 classified.groupBy("edit_status").agg(F.count("*").alias("n")).collect()}
    routed = edits.route_edits(classified)

    if image_meta is not None:
        routed = gate_post_images(routed, image_meta)

    # cache: the frame feeds the count AND the merge — recomputing it would
    # re-run the image-gate pandas UDF twice (round-1 VERDICT minor #6)
    to_save = routed.select([f.name for f in schemas.POSTS.fields]).cache()
    n_saved = to_save.count()
    # partition-scoped MERGE: only the days present in the batch are
    # rewritten; other days' data dirs stay byte-identical (K1 at scale)
    posts_table.merge_upsert_partitioned(
        spark, to_save, key_cols=["post_id"],
        part_expr=F.to_date("publish_time"), meta=merge_meta)

    dated.unpersist(); classified.unpersist(); to_save.unpersist()
    return BatchStats(
        batch_in=n_in, after_validity=n_valid, after_date=n_dated,
        pristine_dropped=by_status.get("pristine", 0),
        new=by_status.get("new", 0),
        new_version=by_status.get("new_version", 0),
        minor=by_status.get("minor", 0),
        saved=n_saved,
    )
