"""Metapost group-aggregation + deterministic version hash (A2/A3).

Reference semantics (/root/reference/src/newsutils/nlp.py:185-303): for each
post with siblings, build one "metapost" summarizing the sibling cluster:

- booleans reduced over members (nlp.py:276-283). NOTE divergence, on
  purpose: the reference folds with ``&=`` starting from the heuristic
  default ``False`` (conf/utils.py:22-23), so its is_draft/is_scrap are
  always False; the engine uses a real ``bool_and`` over member values
  (SURVEY §7 "bool fold bug").
- list fields set-unioned (images/videos/keywords/tags — nlp.py:276-283);
  authors deduped as structs (uniquedicts, helpers.py:41-65 → J7);
- top_image = the highest-score member's (nlp.py:270);
- summarizer input = member texts concatenated with full stops
  (nlp.py:235-237);
- version = md5 hex of the concat of member ids sorted by their creation
  event-time (nlp.py:298-303); the pre-run variant filters members to
  created_ts <= start_time first (lookup_version, nlp.py:241-249);
- type = 'metapost.' + leader type (nlp.py:266);
- link = metapost link factory: baseurl + '/' + id (conf/mixins.py:17-37).

Engine shape: explode(siblings) → inner join members → one groupBy(leader).
All reductions are built-in aggregates (bool_and / flatten+array_distinct /
max_by) — single shuffle on the leader key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_members(posts: DataFrame) -> DataFrame:
    """(leader_id, member rows + score): the leader itself (score=1.0, the
    self-similarity) plus every sibling resolved to its full row (J4;
    dangling refs drop via inner join)."""
    leaders = posts.where(F.size("siblings") > 0).select(
        F.col("post_id").alias("leader_id"),
        F.explode("siblings").alias("ref"),
    ).select("leader_id", F.col("ref.post_id").alias("member_id"),
             F.col("ref.score").alias("score"))
    self_rows = posts.where(F.size("siblings") > 0).select(
        F.col("post_id").alias("leader_id"),
        F.col("post_id").alias("member_id"),
        F.lit(1.0).alias("score"),
    )
    edges = leaders.unionByName(self_rows)
    members = posts.withColumnRenamed("post_id", "member_id")
    return edges.join(members, "member_id", "inner")


def default_link_factory(baseurl: str):
    """U6: the default metapost link factory — baseurl + '/' + id
    (conf/mixins.py:17-37). Pluggable: pass any fn(version_hash_col) ->
    Column to ``build_metaposts`` (the engine's dotted-path-import analog)."""
    def factory(version_hash: F.Column) -> F.Column:
        return F.concat_ws("/", F.lit(baseurl), version_hash)

    return factory


def build_metaposts(posts: DataFrame, baseurl: str = "https://meta.example.com",
                    start_time=None, link_factory=None) -> DataFrame:
    """A2 + A3 over the sibling clusters of ``posts``.

    ``start_time``: when given, the version hash only covers members with
    created_ts <= start_time (the reference's lookup_version watermark —
    nlp.py:241-249) so a re-run matches pre-existing metaposts.
    ``link_factory``: U6 hook, fn(version_hash Column) -> link Column.
    """
    if link_factory is None:
        link_factory = default_link_factory(baseurl)
    m = cluster_members(posts)

    add_fullstop = F.when(
        F.col("text").rlike(r"[.!?…]\s*$"), F.col("text")
    ).otherwise(F.concat(F.col("text"), F.lit(".")))

    version_member = (
        F.when(F.lit(start_time is None), F.struct("created_ts", "member_id"))
        .otherwise(
            F.when(F.col("created_ts") <= F.lit(start_time),
                   F.struct("created_ts", "member_id"))
        )
    )

    agg = m.groupBy("leader_id").agg(
        F.bool_and("is_draft").alias("is_draft"),
        F.bool_and("is_scrap").alias("is_scrap"),
        F.array_distinct(F.flatten(F.collect_list("images"))).alias("images"),
        F.array_distinct(F.flatten(F.collect_list("videos"))).alias("videos"),
        F.array_distinct(F.flatten(F.collect_list("keywords"))).alias("keywords"),
        F.array_distinct(F.flatten(F.collect_list("tags"))).alias("tags"),
        F.array_distinct(F.flatten(F.collect_list("authors"))).alias("authors"),
        F.max_by("top_image", "score").alias("top_image"),
        F.max_by("type", "score").alias("leader_type"),
        F.max_by("country", "score").alias("country"),
        F.max_by("paper", "score").alias("paper"),
        F.max_by("publish_time", "score").alias("publish_time"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("created_ts"),
                                                     add_fullstop.alias("t")))),
                lambda s: s["t"],
            ),
        ).alias("member_text"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(version_member)),
                    lambda s: s["member_id"].cast("string"),
                ),
            )
        ).alias("version_hash"),
        F.count("*").alias("n_members"),
    )

    return agg.select(
        F.xxhash64(F.col("version_hash")).alias("post_id"),
        F.col("leader_id"),
        F.concat(F.lit("metapost."),
                 F.when(F.col("leader_type") == "featured", F.lit("featured"))
                 .otherwise(F.lit("default"))).alias("type"),
        link_factory(F.col("version_hash")).alias("link"),
        "country", "paper", "publish_time", "top_image",
        "images", "videos", "keywords", "tags", "authors",
        "is_draft", "is_scrap", "member_text", "version_hash", "n_members",
    )
