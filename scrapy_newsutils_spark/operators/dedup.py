"""URL-seen dedup: Bloom pre-filter + exact LEFT ANTI join (J1).

Reference semantics (/root/reference/src/newsutils/pipelines.py:74-95): a
per-day in-memory ``set`` of short_links, lazily hydrated from the sink —
unseen URLs pass through and join the set; seen URLs take the edit-
classification slow path (operators/edits.py).

At 10^10-URL scale the seen set cannot be a set — the engine keeps it as a
bucketed state table and runs membership as a two-phase filter:

  fast path: a Bloom filter built from the seen keys rejects the
  overwhelmingly-common definitely-new URLs without shuffling the state
  table. Spark 4 does not expose ``bloom_filter_agg`` to SQL, so the filter
  is built distributed — each partition sets bits into a local bitmap
  (numpy, vectorized splitmix64 mixing), bitmaps OR-reduce to the driver —
  and probed with an Arrow-batched pandas UDF over a broadcast bitmap
  (~1.2 MB per 10^6 keys at 10 bits/key). At 10^10 keys the same class is
  used per ``bucket = pmod(url_key, P)`` so each executor holds only its
  buckets' bitmaps.

  slow path: only the Bloom *maybe-hits* (|batch|·fpp + true dupes) take
  the exact LEFT ANTI join against the state table. Bloom filters have no
  false negatives, so the two-phase result equals the plain anti-join
  (property-tested in tests/test_dedup.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_new_urls(batch: DataFrame, seen: DataFrame, key: str = "url_key") -> DataFrame:
    """Plain LEFT ANTI membership (the correctness definition)."""
    return batch.join(seen.select(key), key, "left_anti")


# ---------------------------------------------------------------------------
# numpy Bloom filter (vectorized; identical mixing on build + probe)

def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer — a well-distributed 64-bit mixer, vectorizes
    to a handful of numpy ops per batch."""
    gamma = np.uint64(((seed + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    z = x.astype(np.uint64) + gamma
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class PyBloom:
    """Fixed-size Bloom filter over int64 keys, numpy-vectorized."""

    def __init__(self, n_items: int, fpp: float = 0.01):
        n_items = max(n_items, 16)
        m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
        self.m = 1 << max(m - 1, 64).bit_length()  # pow2 → mask instead of mod
        self.k = max(1, round(self.m / n_items * math.log(2)))
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray, seed: int) -> np.ndarray:
        return (_mix64(keys.view(np.uint64), seed) & np.uint64(self.m - 1)).astype(np.int64)

    def add_many(self, keys: np.ndarray) -> None:
        for s in range(self.k):
            pos = self._positions(keys, s)
            np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        out = np.ones(len(keys), dtype=bool)
        for s in range(self.k):
            pos = self._positions(keys, s)
            out &= (self.bits[pos >> 3] >> (pos & 7) & 1).astype(bool)
        return out


class PyCuckoo:
    """Cuckoo filter over int64 keys (numpy buckets): the deletable
    alternative to Bloom the north rule names. 4-slot buckets, 16-bit
    fingerprints, partial-key cuckoo hashing (Fan et al. 2014). Supports
    ``delete_many`` — needed if URL-seen entries ever expire (recrawl TTL),
    which a Bloom filter cannot do."""

    SLOTS = 4

    def __init__(self, n_items: int, load: float = 0.8):
        n_buckets = 1 << max(int(n_items / (self.SLOTS * load)), 16).bit_length()
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)

    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix64(keys.view(np.uint64), 0xF1) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 marks empty slots

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (_mix64(keys.view(np.uint64), 0xA5)
                & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i ^ _mix64(fp.astype(np.int64), 0xC3).astype(np.int64)) \
            & (self.n_buckets - 1)

    def add_many(self, keys: np.ndarray, max_kicks: int = 200) -> int:
        """Insert; returns number of failed (dropped) inserts — callers
        treat failure as 'rebuild larger', same policy as Bloom overfill."""
        fps, i1s = self._fp(keys), self._i1(keys)
        failed = 0
        for fp, i in zip(fps, i1s):
            if not self._insert_one(np.uint16(fp), int(i), max_kicks):
                failed += 1
        return failed

    def _insert_one(self, fp: np.uint16, i: int, max_kicks: int) -> bool:
        import random

        rnd = random.Random(int(fp) ^ i)  # deterministic kicks
        for i_try in (i, int(self._alt(np.array([i]), np.array([fp]))[0])):
            row = self.table[i_try]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        cur_i, cur_fp = i, fp
        for _ in range(max_kicks):
            slot = rnd.randrange(self.SLOTS)
            cur_fp, self.table[cur_i, slot] = self.table[cur_i, slot], cur_fp
            cur_i = int(self._alt(np.array([cur_i]), np.array([cur_fp]))[0])
            row = self.table[cur_i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur_fp
                return True
        return False

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        fps, i1s = self._fp(keys), self._i1(keys)
        alts = self._alt(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[alts] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, keys: np.ndarray) -> int:
        """Remove one fingerprint copy per present key; returns #deleted."""
        fps, i1s = self._fp(keys), self._i1(keys)
        alts = self._alt(i1s, fps)
        deleted = 0
        for fp, i1, i2 in zip(fps, i1s, alts):
            for b in (int(i1), int(i2)):
                hit = np.nonzero(self.table[b] == fp)[0]
                if len(hit):
                    self.table[b, hit[0]] = 0
                    deleted += 1
                    break
        return deleted


def build_bloom(seen: DataFrame, key: str = "url_key",
                expected: int | None = None, fpp: float = 0.01) -> PyBloom | None:
    """Distributed build: per-partition bitmaps, OR-reduced to the driver."""
    if expected is None:
        expected = seen.count()
    if expected == 0:
        return None
    m_items, m_fpp = expected, fpp

    def part_bitmap(rows):
        bf = PyBloom(m_items, m_fpp)
        keys = np.fromiter((r[0] for r in rows), dtype=np.int64)
        if len(keys):
            bf.add_many(keys)
        yield bf.bits

    bits = seen.select(key).rdd.mapPartitions(part_bitmap).reduce(np.bitwise_or)
    bf = PyBloom(m_items, m_fpp)
    bf.bits = bits
    return bf


def build_cuckoo(seen: DataFrame, key: str = "url_key",
                 expected: int | None = None) -> PyCuckoo | None:
    """Driver-side cuckoo build (insertion order matters — kicks — so the
    OR-reduce trick of Bloom doesn't apply; keys come back via Arrow). At
    10^10 keys the filter is partitioned by pmod(url_key, P) like the
    Bloom sidecar, bounding any single table."""
    if expected is None:
        expected = seen.count()
    if expected == 0:
        return None
    cf = PyCuckoo(expected)
    keys = seen.select(key).toPandas()[key].to_numpy(dtype=np.int64)
    if len(keys):
        failed = cf.add_many(keys)
        if failed:
            cf = PyCuckoo(expected * 2)
            cf.add_many(keys)
    return cf


def split_by_filter(spark: SparkSession, batch: DataFrame, filt,
                    key: str = "url_key") -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) under any approximate-membership filter
    exposing ``contains_many`` (PyBloom / PyCuckoo). With no filter,
    everything is maybe.

    The probe is an Arrow-batched pandas UDF over the broadcast filter —
    a handful of numpy ops per batch, no per-row Python.
    """
    if filt is None:
        return batch.limit(0), batch
    bc = spark.sparkContext.broadcast(filt)

    @F.pandas_udf(T.BooleanType())
    def might_contain(keys: pd.Series) -> pd.Series:  # pragma: no cover
        return pd.Series(
            bc.value.contains_many(keys.to_numpy(dtype=np.int64)))

    tagged = batch.withColumn("_maybe", might_contain(F.col(key)))
    return (tagged.where(~F.col("_maybe")).drop("_maybe"),
            tagged.where(F.col("_maybe")).drop("_maybe"))


# back-compat alias
split_by_bloom = split_by_filter


def new_urls_bloom(spark: SparkSession, batch: DataFrame, seen: DataFrame,
                   key: str = "url_key", fpp: float = 0.01,
                   bloom=None) -> DataFrame:
    """Two-phase membership: approximate fast path (Bloom or cuckoo) +
    exact anti-join on maybes. Semantically identical to ``exact_new_urls``
    (neither filter has false negatives). Pass a prebuilt filter to
    amortize the build across epochs."""
    if bloom is None:
        bloom = build_bloom(seen, key=key, fpp=fpp)
    definitely_new, maybe = split_by_filter(spark, batch, bloom, key=key)
    checked = maybe.join(seen.select(key), key, "left_anti")
    return definitely_new.unionByName(checked)


def seen_updates(new_rows: DataFrame, epoch: int, buckets: int = 64) -> DataFrame:
    """Rows to append to the url_seen state table after an epoch commits."""
    return new_rows.select(
        "url_key",
        "host",
        F.lit(epoch).alias("first_seen_epoch"),
        F.pmod(F.col("url_key"), F.lit(buckets)).cast("int").alias("bucket"),
    ).dropDuplicates(["url_key"])
