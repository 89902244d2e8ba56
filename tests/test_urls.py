"""URL canonicalization + SURT golden pairs (SURVEY §7 step 2).

Reference key semantics: short_link = url - source prefix
(/root/reference/src/newsutils/crawl/spiders.py:106); the engine
canonicalizes (RFC 3986) then SURTs before keying.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapy_newsutils_spark.functions import urls as U

GOLDEN = [
    # (input, canonical, surt)
    ("https://News.Example.COM:443/a/../b/./c?z=1&a=2#frag",
     "https://news.example.com/b/c?a=2&z=1",
     "com,example,news)/b/c?a=2&z=1"),
    ("http://www.example.com:80/",
     "http://example.com/",
     "com,example)/"),
    ("https://example.com/p?utm_source=x&fbclid=y&id=7",
     "https://example.com/p?id=7",
     "com,example)/p?id=7"),
    ("https://example.com/%7Euser/%61bc",
     "https://example.com/~user/abc",
     "com,example)/~user/abc"),
    ("https://example.com:8080/x/",
     "https://example.com:8080/x/",
     "com,example:8080)/x/"),
    ("", "", ""),
    ("not a url", "", ""),
]


def test_canonicalize_golden():
    for raw, canon, _ in GOLDEN:
        assert U.canonicalize_url(raw) == canon, raw


def test_surt_golden():
    for raw, _, s in GOLDEN:
        assert U.surt(raw) == s, raw


def test_canonicalize_idempotent():
    for raw, canon, _ in GOLDEN:
        if canon:
            assert U.canonicalize_url(canon) == canon


def test_http_https_collapse_in_surt():
    assert U.surt("http://example.com/a") == U.surt("https://example.com/a")


def test_udf_matches_pure_function(spark):
    raws = [g[0] for g in GOLDEN if g[0]]
    df = spark.createDataFrame([(r,) for r in raws], ["url"])
    out = {r["url"]: (r["c"], r["s"]) for r in
           df.select("url", U.canonicalize_udf("url").alias("c"),
                     U.surt_udf("url").alias("s")).collect()}
    for raw in raws:
        assert out[raw] == (U.canonicalize_url(raw), U.surt(raw))


def test_fixture_surt_matches_engine(spark, frontier_df):
    """The fixture computes url_surt JVM-side; the pandas-UDF canonicalizer
    must agree on every fixture URL (golden-pair property at table scale)."""
    mismatch = (
        frontier_df.select("url", "url_surt")
        .withColumn("engine_surt", U.surt_udf(F.col("url")))
        .where(F.col("engine_surt") != F.col("url_surt"))
        .count()
    )
    assert mismatch == 0


def test_url_key_is_xxhash64_of_surt(spark, frontier_df):
    n = frontier_df.where(
        F.col("url_key") != F.xxhash64(F.col("url_surt"))
    ).count()
    assert n == 0


def test_short_link_and_link_hash(spark):
    df = spark.createDataFrame(
        [("https://paper.example.com/post/9", "https://paper.example.com")],
        ["link", "source_url"],
    ).withColumn("ts", F.to_timestamp(F.lit("2024-03-01 00:00:00")))
    row = df.select(
        U.short_link(F.col("link"), F.col("source_url")).alias("short"),
        U.link_hash(F.lit("/post/9"), F.col("ts")).alias("lh"),
    ).first()
    assert row["short"] == "/post/9"
    import hashlib
    assert row["lh"].startswith(hashlib.md5(b"/post/9").hexdigest() + ".")
