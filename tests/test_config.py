"""Source-config loading (S11), duplicate check (J9), paper enrichment (J3),
seed frontier (S1), JSON feed export (K4)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from scrapy_newsutils_spark.sources import config as cfg

SPIDERS = [
    {"name": "gn_a", "allowed_domains": ["a.example.gn"],
     "start_urls": ["https://a.example.gn/", "https://a.example.gn/news"],
     "country_code": "gn", "language": "fr",
     "paper": {"brand": "A Paper", "description": "d", "logo_url": "https://a.example.gn/logo.png"}},
    {"name": "gn_b", "allowed_domains": ["b.example.gn"],
     "start_urls": ["https://b.example.gn/"], "country_code": "gn",
     "language": "fr", "paper": {"brand": "B"}},
]


@pytest.fixture()
def sources(spark, tmp_path):
    p = tmp_path / "spiders.json"
    p.write_text(json.dumps(SPIDERS))
    return cfg.load_sources_json(spark, str(p))


def test_load_and_validate(sources):
    cfg.validate_sources(sources)
    rows = {r["name"]: r for r in sources.collect()}
    assert rows["gn_a"]["paper_brand"] == "A Paper"
    assert rows["gn_b"]["paper_logo_url"] is None


def test_duplicate_names_rejected(spark, sources):
    doubled = sources.unionByName(sources)
    with pytest.raises(cfg.DuplicateSourceError):
        cfg.validate_sources(doubled)


def test_attach_paper_broadcast(spark, sources):
    posts = spark.createDataFrame(
        [(1, "gn_a"), (2, "gn_b"), (3, "unknown")],
        "post_id long, source_name string",
    ).withColumn("paper", F.lit(None).cast(
        "struct<brand:string,description:string,logo_url:string>"))
    out = {r["post_id"]: r["paper"] for r in
           cfg.attach_paper(posts, sources).collect()}
    assert out[1]["brand"] == "A Paper"
    assert out[3] is None


def test_seed_frontier(sources):
    fr = cfg.seed_frontier(sources)
    rows = fr.collect()
    assert len(rows) == 3
    assert all(r["priority"] == 1.0 and r["depth"] == 0 for r in rows)
    assert all(r["url_key"] is not None and r["host"] for r in rows)
    # canonicalization happened (SURT form present)
    assert any(r["url_surt"].startswith("gn,example,a)") for r in rows)


def test_export_json_feed(spark, tmp_path, sources):
    out = str(tmp_path / "feed")
    cfg.export_json_feed(sources.select("name", "language"), out)
    back = spark.read.json(out)
    assert back.count() == 2
