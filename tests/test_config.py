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


HOMEPAGE_A = """<html><head><title>A Fallback Title</title>
<meta property="og:site_name" content="A Site"/>
<meta name="description" content="A news source."/>
</head><body>
<a href="/"><img src="/static/logo-a.png"/></a>
<div class="story"><a href="/post/1">one</a><a href="/post/2">two</a></div>
<nav><a href="/about">about</a></nav>
</body></html>"""

HOMEPAGE_B = """<html><head><title>B Title</title></head>
<body><a href="/x">x</a><a href="/y">y</a></body></html>"""


@pytest.fixture()
def scanned(spark, sources):
    homepages = spark.createDataFrame(
        [("gn_a", "https://a.example.gn/", HOMEPAGE_A),
         ("gn_b", "https://b.example.gn/", HOMEPAGE_B)],
        "name string, url string, html string")
    return cfg.scan_source_metadata(sources, homepages,
                                    post_sections={"default": "story"})


def test_scan_source_metadata(scanned):
    """newspaper.build analog (S1): homepage scan harvests brand metadata +
    the recent-article list; typed sections restrict the article list."""
    rows = {r["name"]: r for r in scanned.collect()}
    a = rows["gn_a"]
    assert a["scan_brand"] == "A Site"              # og:site_name wins
    assert a["scan_description"] == "A news source."
    assert a["scan_logo_url"] == "https://a.example.gn/static/logo-a.png"
    assert sorted(a["recent_links"]) == [           # story-typed links only
        "https://a.example.gn/post/1", "https://a.example.gn/post/2"]
    b = rows["gn_b"]
    assert b["scan_brand"] == "B Title"             # <title> fallback
    assert b["scan_description"] is None
    assert sorted(b["recent_links"]) == [           # untyped page: all links
        "https://b.example.gn/x", "https://b.example.gn/y"]


def test_enrich_papers_fills_only_missing(sources, scanned):
    """get_paper parity: configured paper fields win, the scan fills gaps
    (brand kept for gn_a, logo filled for gn_b's missing fields)."""
    out = {r["name"]: r for r in cfg.enrich_papers(sources, scanned).collect()}
    assert out["gn_a"]["paper_brand"] == "A Paper"        # configured wins
    assert out["gn_a"]["paper_logo_url"] == "https://a.example.gn/logo.png"
    assert out["gn_b"]["paper_brand"] == "B"              # configured wins
    assert out["gn_b"]["paper_description"] is None       # scan had none


def test_seed_frontier_with_recent(spark, sources, scanned):
    """Seeds = start_urls at (1.0, depth 0) plus scanned recent articles at
    (0.9, depth 1), deduped against the seed list."""
    fr = cfg.seed_frontier_with_recent(sources, scanned)
    rows = fr.collect()
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://a.example.gn/"]["priority"] == 1.0
    assert by_url["https://a.example.gn/"]["depth"] == 0
    assert by_url["https://a.example.gn/post/1"]["priority"] == 0.9
    assert by_url["https://a.example.gn/post/1"]["depth"] == 1
    # 3 seeds + 2 recent (gn_a) + 2 recent (gn_b)
    assert len(rows) == 7
    assert len({r["url_key"] for r in rows}) == 7
