"""PostMeta analog (configurable computed-field names) + field-default
heuristics (C14) — conf/post_item.py:24-29, conf/posts.py:46-57,
conf/utils.py:22-23,75-88."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_newsutils_spark import conf, fixtures, schemas
from scrapy_newsutils_spark.plans import nlp_job
from scrapy_newsutils_spark.sources.snapshot_table import SnapshotTable

RENAMES = {"siblings": "similar", "related": "see_also", "summary": "tldr"}


def test_build_posts_schema_renames_roles():
    sch = conf.build_posts_schema(RENAMES)
    names = [f.name for f in sch.fields]
    assert "similar" in names and "see_also" in names and "tldr" in names
    assert "siblings" not in names and "summary" not in names
    # renamed fields keep their types
    assert sch["similar"].dataType == schemas.POSTS["siblings"].dataType
    # canonical by default
    assert conf.build_posts_schema() == schemas.POSTS


def test_build_posts_schema_rejects_bad_config():
    with pytest.raises(ValueError):
        conf.build_posts_schema({"nope": "x"})
    with pytest.raises(ValueError):
        conf.build_posts_schema({"siblings": "related"})  # collision
    with pytest.raises(ValueError):
        conf.build_posts_schema({"summary": "title"})  # shadows base column


def test_default_heuristics():
    assert conf.is_plural("images") and not conf.is_plural("class")
    assert conf.is_bool("is_draft") and not conf.is_bool("disco")


def test_with_defaults_fills_missing_and_null(spark):
    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("images", T.ArrayType(T.StringType())),
        T.StructField("is_draft", T.BooleanType()),
        T.StructField("title", T.StringType()),
    ])
    df = spark.createDataFrame([(1, None, None)],
                               "k long, images array<string>, is_draft boolean")
    out = conf.with_defaults(df, sch).first()
    assert out["images"] == []          # *s → []
    assert out["is_draft"] is False     # is_* → False
    assert out["title"] is None         # plain → NULL


def test_day_job_with_renamed_computed_fields(spark, tmp_path):
    """The whole NLP day job runs against a table whose computed columns
    are user-named (the PostMeta metaclass behavior, set-wise)."""
    sch = conf.build_posts_schema(RENAMES)
    table = SnapshotTable(str(tmp_path / "posts"), sch)
    batch = fixtures.posts_batch(spark)
    for role, name in RENAMES.items():
        batch = batch.withColumnRenamed(role, name)
    table.merge_upsert_partitioned(spark, batch, key_cols=["post_id"],
                                   part_expr=F.to_date("publish_time"))

    day = dt.date(2024, 3, 1)
    n_sim = nlp_job.save_similarity(spark, table, day,
                                    siblings_threshold=0.25,
                                    related_threshold=0.1,
                                    field_names=RENAMES)
    out = nlp_job.save_day(spark, table, day, verbs=("summary", "metapost"),
                           field_names=RENAMES)
    assert n_sim > 0 and out["summary"] > 0

    day_rows = table.read(spark).where(
        F.to_date("publish_time") == day.isoformat())
    plain = day_rows.where(~F.col("type").startswith("metapost"))
    # the renamed columns carry the computed values...
    assert plain.where(F.col("tldr").isNull()).count() == 0
    n_with_sibs = plain.where(F.size("similar") > 0).count()
    assert n_with_sibs > 0
    # ...and metaposts key off the renamed sibling column (identical member
    # sets collapse onto one version hash, so count <= posts-with-siblings)
    metas = day_rows.where(F.col("type").startswith("metapost"))
    assert 0 < metas.count() <= out["metapost"] <= n_with_sibs
    assert metas.where(F.col("tldr").isNull()).count() == 0


# -- settings machinery (AppSettings analog) -----------------------------------

def test_appsettings_layering_env_project_defaults():
    from scrapy_newsutils_spark import conf

    s = conf.posts_settings(
        project={"SIMILARITY_MAX_DOCS": 5},
        env={"NEWSUTILS_SIMILARITY_SIBLINGS_THRESHOLD": "0.7",
             "NEWSUTILS_EDITS_NEW_VERSION_FIELDS": '["text"]'})
    # env wins, JSON-decoded to the right type
    assert s["SIMILARITY_SIBLINGS_THRESHOLD"] == 0.7
    assert s["EDITS_NEW_VERSION_FIELDS"] == ["text"]
    # project beats defaults
    assert s["SIMILARITY_MAX_DOCS"] == 5
    # defaults fill the rest
    assert s["SUMMARY_FIELD"] == "summary"
    with pytest.raises(KeyError):
        s["NO_SUCH_SETTING"]


def test_appsettings_required_must_be_explicit():
    from scrapy_newsutils_spark import conf

    s = conf.AppSettings({"API_KEY": None, "HOST": "x"}, "APP", env={})
    assert s["HOST"] == "x"
    with pytest.raises(conf.ImproperlyConfigured):
        s["API_KEY"]
    s2 = conf.AppSettings({"API_KEY": None}, "APP",
                          project={"API_KEY": "k"}, env={})
    assert s2["API_KEY"] == "k"


def test_settings_computed_fields_follow_renames():
    """Computed settings derive from the configurable *_FIELD names
    (reference conf/posts.py:40-64): renaming siblings->similar flows into
    field_names and the edits exclusion set."""
    from scrapy_newsutils_spark import conf

    s = conf.posts_settings(env={"NEWSUTILS_SIBLINGS_FIELD": "similar"})
    names = conf.settings_field_names(s)
    assert names["siblings"] == "similar"
    excl = conf.settings_edits_excluded_fields(s)
    assert "similar" in excl and "siblings" not in excl
    assert {"version", "post_id", "short_link", "keywords",
            "excerpt"} <= excl


def test_settings_drive_crawl_batch(spark, tmp_path):
    """A settings object layered from env drives the edit classification:
    with EDITS_NEW_VERSION_FIELDS=["title"], a text-only change is MINOR
    (update-in-place), not a new version."""
    import datetime as _dt

    from scrapy_newsutils_spark import conf, fixtures, schemas
    from scrapy_newsutils_spark.operators import pipeline as P
    from scrapy_newsutils_spark.plans import posts_pipeline
    from scrapy_newsutils_spark.sources.snapshot_table import SnapshotTable

    table = SnapshotTable(str(tmp_path / "posts"), schemas.POSTS)
    table.overwrite(spark.createDataFrame([], schemas.POSTS))
    batch = fixtures.posts_batch(spark)
    dates = P.parse_dates("2024-03-01", "2024-03-05")
    s = conf.posts_settings(env={"NEWSUTILS_EDITS_NEW_VERSION_FIELDS":
                                 '["title"]'})
    posts_pipeline.process_crawl_batch(spark, batch, table, dates, settings=s)
    edited = batch.withColumn(
        "text", F.when(F.col("post_id") == 1,
                       F.concat(F.col("text"), F.lit(" CHANGED")))
        .otherwise(F.col("text")))
    stats = posts_pipeline.process_crawl_batch(spark, edited, table, dates,
                                               settings=s)
    assert stats.new_version == 0 and stats.minor == 1  # text is not nv now
    p1 = table.read(spark).where(F.col("short_link") == "/post/1")
    assert [r["version"] for r in p1.collect()] == [1]  # updated in place
