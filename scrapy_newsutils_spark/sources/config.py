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


def scan_source_metadata(sources: DataFrame, homepages: DataFrame,
                         post_sections: dict[str, str] | None = None) -> DataFrame:
    """``newspaper.build`` analog (S1's second half —
    /root/reference/src/newsutils/crawl/spiders.py:211-215 ``self.source =
    build(start_urls[0])``, :229-233 ``source.articles``): parse each
    source's homepage once at init and harvest its brand metadata + the
    recent-article link list.

    ``homepages``: (name, url, html) — one fetched homepage per source.
    Returns one row per source: name, scanned brand (og:site_name, else
    <title>), description (og/meta description), logo (3-case heuristic)
    and ``recent_links`` (the page's article-typed outlinks; all links
    when no section typing is configured)."""
    from .parse import parse_pages

    parsed = parse_pages(homepages, post_sections=post_sections)
    typed = F.filter("outlinks", lambda o: o["link_type"] != "")
    links = F.when(F.size(typed) > 0, typed).otherwise(F.col("outlinks"))
    meta = parsed.select(
        "url",
        F.coalesce("site_name", "title").alias("scan_brand"),
        F.col("description").alias("scan_description"),
        F.col("logo").alias("scan_logo_url"),
        F.transform(links, lambda o: o["url"]).alias("recent_links"),
    )
    return (
        sources.select("name", F.element_at("start_urls", 1).alias("url"))
        .join(meta, "url", "left")
        .drop("url")
    )


def enrich_papers(sources: DataFrame, scanned: DataFrame) -> DataFrame:
    """Fill MISSING paper fields from the homepage scan — the reference's
    ``get_paper`` builds Paper(brand=source.brand, ...,
    logo_url=source.logo_url or parse_logo(response))
    (crawl/spiders.py:217-227): configured values win, the scan is the
    fallback."""
    return (
        sources.join(F.broadcast(scanned), "name", "left")
        .withColumn("paper_brand", F.coalesce("paper_brand", "scan_brand"))
        .withColumn("paper_description",
                    F.coalesce("paper_description", "scan_description"))
        .withColumn("paper_logo_url",
                    F.coalesce("paper_logo_url", "scan_logo_url"))
        .drop("scan_brand", "scan_description", "scan_logo_url",
              "recent_links")
    )


def seed_frontier_with_recent(sources: DataFrame, scanned: DataFrame,
                              epoch: int = 0) -> DataFrame:
    """S1 full parity: seeds = start_urls (priority 1.0, depth 0) PLUS each
    source's recent-article list from the homepage scan (priority 0.9,
    depth 1 — newspaper.build's article list enters the frontier behind the
    seeds but ahead of organically-discovered URLs)."""
    from ..functions import urls as U

    seeds = seed_frontier(sources, epoch)
    recent = (
        scanned.select(F.explode("recent_links").alias("url"))
        .join(seeds.select("url"), "url", "left_anti")
        .dropDuplicates(["url"])
    )
    recent_rows = (
        U.with_url_identity(recent)
        .withColumn("priority", F.lit(0.9))
        .withColumn("depth", F.lit(1))
        .withColumn("discovered_ts", F.current_timestamp())
        .withColumn("image_id", F.lit(None).cast("string"))
        .withColumn("epoch_added", F.lit(epoch))
        .select([f.name for f in schemas.FRONTIER.fields])
    )
    return seeds.unionByName(recent_rows)


def export_json_feed(df: DataFrame, path: str, coalesce: int | None = 1) -> None:
    """K4: ``scrapy crawl -O out.json`` analog (JSON-lines feed export)."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").json(path)
