"""Explicit StructTypes for every engine table.

The reference is loosely-typed Mongo documents (scrapy.Item validates field
names only — /root/reference/src/newsutils/conf/post_item.py:44-68); the
engine is columnar with explicit schemas. Field inventory follows SURVEY.md
§1.2/§1.3 and BASELINE.json's input_hint.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# images — the payload table (authoritative shape: BASELINE.json input_hint).
# `bytes` is opaque binary; decode happens only inside Arrow/pandas UDFs.
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# frontier — one row per known-but-unfetched URL (north-rule state table).
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_surt", T.StringType(), False),
        T.StructField("url_key", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovered_ts", T.TimestampType(), True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("epoch_added", T.IntegerType(), False),
    ]
)

# url_seen — dedup state. Mirrors the reference's per-day `_ids_seen` set
# (/root/reference/src/newsutils/pipelines.py:74-84) as a partitioned table.
URL_SEEN = T.StructType(
    [
        T.StructField("url_key", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("first_seen_epoch", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)

# robots — politeness config, broadcast to executors
# (reference politeness budget: demo/default_settings.py:22-34 and the
# 1-req/60s extreme at src/newsutils/ezines/thesportsdb.py:698-699).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_ms", T.IntegerType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
        T.StructField("max_concurrency", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# posts — the article table (SURVEY §1.3). One table partitioned by
# days(publish_time) replaces the reference's collection-per-day
# (/root/reference/src/newsutils/crawl/day.py:19-43).
AUTHOR = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("profile_image", T.StringType(), True),
        T.StructField("role", T.StringType(), True),
    ]
)

PAPER = T.StructType(
    [
        T.StructField("brand", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("logo_url", T.StringType(), True),
    ]
)

SIM_REF = T.StructType(
    [
        T.StructField("post_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

POSTS = T.StructType(
    [
        T.StructField("post_id", T.LongType(), False),
        T.StructField("country", T.StringType(), True),
        T.StructField("link", T.StringType(), True),
        T.StructField("short_link", T.StringType(), True),
        T.StructField("link_hash", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("excerpt", T.StringType(), True),
        T.StructField("publish_time", T.TimestampType(), True),
        T.StructField("modified_time", T.TimestampType(), True),
        T.StructField("top_image", T.StringType(), True),
        T.StructField("images", T.ArrayType(T.StringType()), True),
        T.StructField("videos", T.ArrayType(T.StringType()), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("authors", T.ArrayType(AUTHOR), True),
        T.StructField("paper", PAPER, True),
        T.StructField("version", T.IntegerType(), True),
        T.StructField("is_draft", T.BooleanType(), True),
        T.StructField("is_scrap", T.BooleanType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("siblings", T.ArrayType(SIM_REF), True),
        T.StructField("related", T.ArrayType(SIM_REF), True),
        # event-time of row creation — replaces ObjectId.generation_time
        # (/root/reference/src/newsutils/nlp.py:244,300)
        T.StructField("created_ts", T.TimestampType(), True),
    ]
)

# sources/spider config (mirrors demo/spiders.json + PostCrawlerContext,
# /root/reference/src/newsutils/crawl/spiders.py:256-281)
SOURCES = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("allowed_domains", T.ArrayType(T.StringType()), True),
        T.StructField("start_urls", T.ArrayType(T.StringType()), True),
        T.StructField("country_code", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("paper_brand", T.StringType(), True),
        T.StructField("paper_description", T.StringType(), True),
        T.StructField("paper_logo_url", T.StringType(), True),
    ]
)

# fetched — output of one fetch epoch: image+caption rows (north rule)
FETCHED = T.StructType(
    [
        T.StructField("url_key", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("fetch_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), False),  # ok|robots_denied|missing
    ]
)

# opic_cash — pending OPIC priority contributions for already-queued URLs;
# folded into `priority` lazily at frontier compaction (updating rows in a
# 10^10-row MoR table per epoch would be an O(table) rewrite).
OPIC_CASH = T.StructType(
    [
        T.StructField("url_key", T.LongType(), False),
        T.StructField("cash", T.DoubleType(), False),
        T.StructField("epoch", T.IntegerType(), False),
    ]
)

# metrics — per-partition lineage + metrics rows (north rule)
METRICS = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("host_group", T.StringType(), True),
        T.StructField("popped", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("robots_denied", T.LongType(), False),
        T.StructField("dedup_dropped", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# sport_events — e-zine path: the FULL 45-field SportEvent item
# (/root/reference/src/newsutils/ezines/thesportsdb.py:637-686) plus the
# engine's deterministic 64-bit pk replacing the reference's ObjectId from
# the 4-part compound key (:691-695). int*/date* fields are typed (the API
# ships strings; parsing happens at ingest), everything else is string.
_SPORT_EVENT_INT_FIELDS = (
    "intAwayScore", "intRound", "intHomeScore", "intSpectators",
    "intScore", "intScoreVotes",
)
_SPORT_EVENT_STR_FIELDS = (
    "idEvent", "idSoccerXML", "idAPIfootball", "strEvent",
    "strEventAlternate", "strFilename", "strSport", "idLeague", "strLeague",
    "strSeason", "strDescriptionEN", "strHomeTeam", "strAwayTeam",
    "strOfficial", "strTimestamp", "dateEventLocal", "strTime",
    "strTimeLocal", "strTVStation", "idHomeTeam", "idAwayTeam", "strResult",
    "strVenue", "strCountry", "strCity", "strPoster", "strSquare",
    "strFanart", "strThumb", "strBanner", "strMap", "strTweet1", "strTweet2",
    "strTweet3", "strVideo", "strStatus", "strPostponed", "strLocked",
)

SPORT_EVENTS = T.StructType(
    [T.StructField("event_pk", T.LongType(), False)]
    + [T.StructField(n, T.StringType(),
                     n not in ("idEvent", "idLeague", "idHomeTeam", "idAwayTeam"))
       for n in _SPORT_EVENT_STR_FIELDS]
    + [T.StructField(n, T.IntegerType(), True) for n in _SPORT_EVENT_INT_FIELDS]
    + [T.StructField("dateEvent", T.DateType(), True)]
)
