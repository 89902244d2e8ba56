"""Crawler/source configuration (S11, J3, J9, K4).

Reference behaviour:
- spider configs live in a Mongo ``_spiders`` collection, merged with
  module-defined spiders, duplicate names rejected
  (/root/reference/src/newsutils/spiderloader.py:53-89,73-74);
- every post gets its source's ``Paper`` attached from a per-spider cache
  (/root/reference/src/newsutils/crawl/spiders.py:217-227);
- ``scrapy crawl <spider> -O out.json`` exports a JSON feed
  (/root/reference/README.md:88-91).

Engine: sources are a tiny DataFrame — loaded from JSON/parquet, validated,
then broadcast-joined wherever posts need enrichment. No dynamic class
synthesis: a "spider" is a config row driving the generic epoch pipeline.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


class DuplicateSourceError(ValueError):
    """J9: duplicate spider/source names are a config error."""


def load_sources_json(spark: SparkSession, path: str) -> DataFrame:
    """Load source configs from a spiders.json-shaped file (demo/spiders.json)."""
    with open(path) as f:
        raw = json.load(f)
    rows = []
    for item in raw if isinstance(raw, list) else raw.get("spiders", []):
        paper = item.get("paper", {}) or {}
        rows.append({
            "name": item["name"],
            "allowed_domains": item.get("allowed_domains", []),
            "start_urls": item.get("start_urls", []),
            "country_code": item.get("country_code"),
            "language": item.get("language"),
            "paper_brand": paper.get("brand", item.get("name")),
            "paper_description": paper.get("description"),
            "paper_logo_url": paper.get("logo_url"),
        })
    return spark.createDataFrame(rows, schemas.SOURCES)


def validate_sources(sources: DataFrame) -> DataFrame:
    """J9 duplicate-name check + required-field validation (the reference
    validates country_code/post_texts at spider init —
    crawl/spiders.py:163-185)."""
    dupes = [r["name"] for r in
             sources.groupBy("name").count().where(F.col("count") > 1).collect()]
    if dupes:
        raise DuplicateSourceError(f"duplicate source names: {sorted(dupes)}")
    missing = sources.where(
        F.col("name").isNull() | (F.size(F.coalesce("start_urls", F.array())) == 0)
    ).count()
    if missing:
        raise ValueError(f"{missing} source rows lack name/start_urls")
    return sources


def attach_paper(posts: DataFrame, sources: DataFrame,
                 on: str = "source_name") -> DataFrame:
    """J3: broadcast-join the Paper dim onto posts."""
    dim = sources.select(
        F.col("name").alias(on),
        F.struct(
            F.col("paper_brand").alias("brand"),
            F.col("paper_description").alias("description"),
            F.col("paper_logo_url").alias("logo_url"),
        ).alias("paper"),
    )
    return posts.drop("paper").join(F.broadcast(dim), on, "left")


def seed_frontier(sources: DataFrame, epoch: int = 0) -> DataFrame:
    """S1: the shared seed list as initial frontier rows (priority 1.0,
    depth 0) — one row per start_url."""
    from ..functions import urls as U

    seeds = sources.select(F.explode("start_urls").alias("url"))
    return (
        U.with_url_identity(seeds)
        .withColumn("priority", F.lit(1.0))
        .withColumn("depth", F.lit(0))
        .withColumn("discovered_ts", F.current_timestamp())
        .withColumn("image_id", F.lit(None).cast("string"))
        .withColumn("epoch_added", F.lit(epoch))
        .select([f.name for f in schemas.FRONTIER.fields])
    )


def export_json_feed(df: DataFrame, path: str, coalesce: int | None = 1) -> None:
    """K4: ``scrapy crawl -O out.json`` analog (JSON-lines feed export)."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").json(path)
