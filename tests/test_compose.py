"""Full crawl→NLP composition over synthetic HTML pages (plans/crawl_compose):
parse → mk_post → pipeline sink → NLP verbs, all through shipped operators,
plus edited-replay version history through the same composed path."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from scrapy_newsutils_spark import fixtures, schemas
from scrapy_newsutils_spark.operators import pipeline
from scrapy_newsutils_spark.plans import crawl_compose
from scrapy_newsutils_spark.sources.snapshot_table import SnapshotTable

SRC = "https://news.example.com"
N = 60


def _docs(spark):
    """Clusterable deterministic texts: 8 topic groups so the similarity
    verb finds siblings within a publish day."""
    i = F.col("id")
    topic = F.pmod(i, F.lit(8))
    text = F.concat(
        F.format_string("topic%d ", topic),
        F.lit("river market council storm bridge harbor trade "),
        F.format_string("group%d group%d group%d ", topic, topic, topic),
        F.format_string("doc%d tail words here", i),
    )
    return spark.range(N).select(i.alias("doc_id"), text.alias("text"))


@pytest.fixture()
def posts_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "posts"), schemas.POSTS)
    t.overwrite(spark.createDataFrame([], schemas.POSTS))
    return t


def test_crawl_day_composition_e2e(spark, posts_table):
    docs = _docs(spark)
    pages = fixtures.html_pages_from_docs(docs, N, SRC)
    dates = pipeline.parse_dates("2024-03-01", "2024-03-05")
    day1 = dt.date(2024, 3, 1)

    stats, nlp = crawl_compose.run_crawl_day(
        spark, pages, posts_table, SRC, dates, nlp_days=(day1,))
    assert stats.batch_in == N and stats.new == N and stats.saved == N
    assert nlp[day1]["similarity"] > 0 and nlp[day1]["summary"] > 0

    saved = posts_table.read(spark)
    day_rows = saved.where(F.to_date("publish_time") == day1.isoformat())
    plain = day_rows.where(~F.col("type").startswith("metapost"))
    # parse carried every S3 field into the sink
    r0 = plain.orderBy("short_link").first()
    assert r0["title"].startswith("Doc ")
    assert r0["images"] and r0["top_image"].endswith(".png")
    assert r0["authors"] and r0["authors"][0]["name"].startswith("Author")
    assert r0["keywords"] and r0["excerpt"]
    # NLP verbs landed on the same rows
    assert plain.where(F.col("summary").isNull()).count() == 0
    # topic groups cluster: some day-1 posts have siblings
    assert plain.where(F.size("siblings") > 0).count() > 0

    # -- edited replay through the SAME composed path: version history -----
    edited_docs = docs.withColumn(
        "text", F.when(F.col("doc_id") % 6 == 0,
                       F.concat(F.col("text"), F.lit(" BREAKING update")))
        .otherwise(F.col("text")))
    pages2 = fixtures.html_pages_from_docs(edited_docs, N, SRC)
    stats2, _ = crawl_compose.run_crawl_day(
        spark, pages2, posts_table, SRC, dates)
    n_edited = N // 6
    assert stats2.new_version == n_edited
    assert stats2.pristine_dropped == N - n_edited
    # v1 and v2 coexist for an edited short_link (version-qualified ids)
    versions = (posts_table.read(spark)
                .where(F.col("short_link") == "/post/0")
                .select("version").collect())
    assert sorted(r["version"] for r in versions) == [1, 2]

    # -- idempotency: replaying the edited batch again is all-pristine -----
    stats3, _ = crawl_compose.run_crawl_day(
        spark, pages2, posts_table, SRC, dates)
    assert stats3.pristine_dropped == N and stats3.saved == 0


def test_composition_with_paper_dim(spark, posts_table):
    """J3 inside the composition: the paper struct rides every post."""
    papers = spark.createDataFrame(
        [(SRC, ["https://news.example.com/"], "Example News",
          "synthetic paper", "https://news.example.com/logo.png")],
        "name string, start_urls array<string>, paper_brand string, "
        "paper_description string, paper_logo_url string")
    docs = _docs(spark).where(F.col("doc_id") < 10)
    pages = fixtures.html_pages_from_docs(docs, N, SRC)
    dates = pipeline.parse_dates("2024-03-01", "2024-03-05")
    stats, _ = crawl_compose.run_crawl_day(
        spark, pages, posts_table, SRC, dates, papers=papers)
    assert stats.saved == 10
    got = posts_table.read(spark).select("paper").first()["paper"]
    assert got is not None and got["brand"] == "Example News"
