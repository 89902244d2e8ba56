"""URL-seen dedup: Bloom+anti-join must equal the plain anti-join (J1).

Reference semantics: per-day seen-set membership
(/root/reference/src/newsutils/pipelines.py:74-95). The Bloom fast path may
never produce false negatives; its false-positive rate only costs extra
exact-join work.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from scrapy_newsutils_spark.operators import dedup


def test_bloom_no_false_negatives_numpy():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    bf = dedup.PyBloom(len(keys), fpp=0.01)
    bf.add_many(keys)
    assert bool(bf.contains_many(keys).all())


def test_bloom_fpp_reasonable():
    rng = np.random.default_rng(7)
    seen = rng.integers(0, 2**62, size=50_000, dtype=np.int64)
    probe = rng.integers(-(2**62), -1, size=50_000, dtype=np.int64)  # disjoint
    bf = dedup.PyBloom(len(seen), fpp=0.01)
    bf.add_many(seen)
    fpr = bf.contains_many(probe).mean()
    assert fpr < 0.03, f"observed fpp {fpr}"


def test_bloom_path_equals_exact_antijoin(spark, frontier_df, url_seen_df):
    exact = dedup.exact_new_urls(frontier_df, url_seen_df)
    bloomed = dedup.new_urls_bloom(spark, frontier_df, url_seen_df)
    a = {r["url_key"] for r in exact.select("url_key").collect()}
    b = {r["url_key"] for r in bloomed.select("url_key").collect()}
    assert a == b
    # and the split is real: some rows were known-new without the join
    assert len(a) > 0


def test_seen_semantics_membership(spark, frontier_df, url_seen_df):
    """Every frontier key is either new or seen — partition is exact."""
    total = frontier_df.count()
    new = dedup.exact_new_urls(frontier_df, url_seen_df).count()
    dup = frontier_df.join(url_seen_df.select("url_key"), "url_key", "left_semi").count()
    assert new + dup == total


def test_seen_updates_bucketing(spark, frontier_df):
    upd = dedup.seen_updates(frontier_df.limit(100), epoch=3, buckets=64)
    rows = upd.collect()
    assert all(r["first_seen_epoch"] == 3 for r in rows)
    assert all(0 <= r["bucket"] < 64 for r in rows)
    # bucket must be pmod(url_key, 64)
    bad = upd.where(F.col("bucket") != F.pmod(F.col("url_key"), F.lit(64)).cast("int")).count()
    assert bad == 0
