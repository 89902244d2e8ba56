"""URL-seen dedup: Bloom pre-filter + exact LEFT ANTI join (J1).

Reference semantics (/root/reference/src/newsutils/pipelines.py:74-95): a
per-day in-memory ``set`` of short_links, lazily hydrated from the sink —
unseen URLs pass through and join the set; seen URLs take the edit-
classification slow path (operators/edits.py).

At 10^10-URL scale the seen set cannot be a set — the engine keeps it as a
bucketed state table and runs membership as a two-phase filter:

  fast path: a Bloom/cuckoo filter built from the seen keys rejects the
  overwhelmingly-common definitely-new URLs without shuffling the state
  table. Spark 4 does not expose ``bloom_filter_agg`` to SQL, so filters
  are built distributed (numpy, vectorized splitmix64 mixing) and probed
  with Arrow-batched pandas UDFs. The filter state is PARTITIONED by
  ``bucket = pmod(url_key, P)`` (``PartitionedFilter`` +
  ``build_partitioned``): every bucket's table is built executor-side from
  only its keys (one narrow shuffle; the driver never sees a key) and is
  individually capped, so capacity scales by adding buckets instead of
  degrading fpp — no single bitmap ever exceeds ~32 MB. Probing is either
  a broadcast of the bucket dict (fine to ~10^9 keys) or, beyond that,
  ``split_by_filter_store``: per-bucket ``.npz`` files in shared storage,
  the batch repartitioned on bucket, each task lazily loading only its own
  buckets — executor memory bounded by buckets-per-task at any seen-set
  size (the 10^10 path the north rule names).

  slow path: only the Bloom *maybe-hits* (|batch|·fpp + true dupes) take
  the exact LEFT ANTI join against the state table. Bloom filters have no
  false negatives, so the two-phase result equals the plain anti-join
  (property-tested in tests/test_dedup.py).
"""

from __future__ import annotations

import json
import math
import os
import uuid

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
        treat failure as 'rebuild larger', same policy as Bloom overfill.

        Vectorized common path: the overwhelming majority of inserts land in
        an empty slot of their primary or alt bucket with no kicks. Each
        pass fills one slot column; same-bucket collisions within a pass are
        resolved by keeping the first writer (np.unique on bucket index).
        Only the residue (both buckets full) takes the per-key kick loop."""
        fps, i1s = self._fp(keys), self._i1(keys)
        alts = self._alt(i1s, fps)
        pending = np.arange(len(keys))
        for bucket_arr in (i1s, alts):
            if not len(pending):
                break
            for slot in range(self.SLOTS):
                if not len(pending):
                    break
                b = bucket_arr[pending]
                empty = self.table[b, slot] == 0
                if not empty.any():
                    continue
                cand = pending[empty]
                # one writer per bucket this pass
                _, first = np.unique(bucket_arr[cand], return_index=True)
                winners = cand[first]
                self.table[bucket_arr[winners], slot] = fps[winners]
                placed = np.zeros(len(keys), dtype=bool)
                placed[winners] = True
                pending = pending[~placed[pending]]
        failed = 0
        for j in pending:
            if not self._insert_one(np.uint16(fps[j]), int(i1s[j]), max_kicks):
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


def _cuckoo_from_keys(keys: np.ndarray, expected: int,
                      max_doublings: int = 6) -> PyCuckoo:
    """Build a cuckoo filter that holds EVERY key: double capacity until
    add_many reports 0 failures (a dropped insert would be a false negative
    — a seen URL classified 'definitely new' — breaking the two-phase
    filter's exactness invariant). Mirrors the Bloom overfill policy."""
    cap = max(expected, len(keys), 16)
    for _ in range(max_doublings):
        cf = PyCuckoo(cap)
        if cf.add_many(keys) == 0:
            return cf
        cap *= 2
    raise RuntimeError(
        f"cuckoo build failed at capacity {cap} for {len(keys)} keys")


def build_cuckoo(seen: DataFrame, key: str = "url_key",
                 expected: int | None = None) -> PyCuckoo | None:
    """Single-table cuckoo build (small seen sets / tests). Collects keys to
    the driver — use ``build_partitioned(kind='cuckoo')`` beyond ~10^6 keys:
    it builds per-bucket tables executor-side and never funnels the key set
    through the driver."""
    if expected is None:
        expected = seen.count()
    if expected == 0:
        return None
    keys = seen.select(key).toPandas()[key].to_numpy(dtype=np.int64)
    if not len(keys):
        return PyCuckoo(expected)
    return _cuckoo_from_keys(keys, expected)


# ---------------------------------------------------------------------------
# bucketed (partitioned) filters — the 10^10-key scale path

class PartitionedFilter:
    """URL-seen membership filter partitioned by ``bucket = key mod P``.

    Each bucket holds an independent PyBloom/PyCuckoo over only its keys, so
    no single bitmap ever exceeds ``cap_per_bucket`` — the bucket count
    scales with the seen set instead of the fpp silently degrading past a
    fixed cap (the round-1 weakness: one driver bitmap hard-capped at 50M).
    At cluster scale the per-bucket tables live in a FilterStore and probe
    tasks load only their own buckets; in-memory probing routes each key to
    its bucket vectorized (np.unique over the batch's buckets)."""

    def __init__(self, buckets: int, kind: str = "bloom",
                 cap_per_bucket: int = 25_000_000, fpp: float = 0.01,
                 new_bucket_items: int = 65_536):
        self.buckets = int(buckets)
        self.kind = kind
        self.cap_per_bucket = int(cap_per_bucket)
        self.fpp = fpp
        self.new_bucket_items = int(new_bucket_items)
        self.filters: dict[int, PyBloom | PyCuckoo] = {}
        self.inserted: dict[int, int] = {}
        self.capacity: dict[int, int] = {}  # per-bucket design n_items
        self.build_rss_mb = 0.0  # max builder-task peak RSS (evidence)

    def _new_filter(self, bv: int):
        self.capacity[bv] = self.new_bucket_items
        if self.kind == "cuckoo":
            return PyCuckoo(self.new_bucket_items)
        return PyBloom(self.new_bucket_items, self.fpp)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        out = np.zeros(len(keys), dtype=bool)
        b = keys % self.buckets
        for bv in np.unique(b):
            f = self.filters.get(int(bv))
            if f is None:
                continue  # empty bucket: definitely new
            m = b == bv
            out[m] = f.contains_many(keys[m])
        return out

    def add_many(self, keys: np.ndarray) -> int:
        """Route incremental inserts per bucket. Returns the number of
        FAILED cuckoo inserts — a failed insert means the filter now lacks
        a seen key (false-negative risk), so the caller must discard the
        filter and rebuild from the state table before the next probe
        (CrawlEngine does exactly that). Bloom inserts never fail; capacity
        overrun surfaces via ``overfilled()`` instead."""
        keys = np.asarray(keys, dtype=np.int64)
        failed = 0
        b = keys % self.buckets
        for bv in np.unique(b):
            bv = int(bv)
            sub = keys[b == bv]
            f = self.filters.get(bv)
            if f is None:
                f = self.filters[bv] = self._new_filter(bv)
                self.inserted[bv] = 0
            failed += f.add_many(sub) if isinstance(f, PyCuckoo) else (f.add_many(sub) or 0)
            self.inserted[bv] = self.inserted.get(bv, 0) + len(sub)
        return failed

    def delete_many(self, keys: np.ndarray) -> int:
        """Remove keys (cuckoo buckets only — the deletable variant's whole
        point: recrawl TTL without a rebuild). Bloom buckets cannot delete;
        the caller must discard and rebuild instead. Returns #deleted."""
        keys = np.asarray(keys, dtype=np.int64)
        deleted = 0
        b = keys % self.buckets
        for bv in np.unique(b):
            bv = int(bv)
            f = self.filters.get(bv)
            if isinstance(f, PyCuckoo):
                sub = keys[b == bv]
                d = f.delete_many(sub)
                deleted += d
                self.inserted[bv] = max(0, self.inserted.get(bv, 0) - d)
        return deleted

    def n_inserted(self) -> int:
        return sum(self.inserted.values())

    def overfilled(self) -> bool:
        """Any bucket past its own design capacity (fpp degraded / cuckoo
        near full) → the owner should rebuild from the state table with
        more buckets."""
        return any(n > self.capacity.get(bv, self.new_bucket_items)
                   for bv, n in self.inserted.items())


def pick_buckets(expected: int, cap_per_bucket: int = 25_000_000) -> int:
    """Bucket count so no per-bucket filter exceeds cap_per_bucket keys
    (with 2x headroom for incremental epoch inserts)."""
    import math as _m

    return max(1, int(_m.ceil(2 * max(expected, 1) / cap_per_bucket)))


def build_partitioned(seen: DataFrame, key: str = "url_key",
                      kind: str = "bloom", expected: int | None = None,
                      buckets: int | None = None,
                      cap_per_bucket: int = 25_000_000,
                      fpp: float = 0.01,
                      collect_to_driver: bool = True,
                      store_path: str | None = None) -> PartitionedFilter | None:
    """Distributed build of a PartitionedFilter: repartition the seen keys
    by ``pmod(key, P)`` (one narrow ~16 B/row shuffle, UNCAPPED — one
    partition per bucket so per-task memory is bounded by cap_per_bucket
    regardless of P), build every bucket's filter executor-side inside
    ``mapInArrow`` — keys stream through as Arrow batches and accumulate as
    per-bucket numpy chunks (8 B/key, never boxed Python ints; the round-2
    build buffered rows in ``defaultdict(list)`` at ~28 B/key and capped the
    shuffle at 256 partitions, which OOMs at the 10^10-key north-rule
    extreme: 800 buckets / 256 tasks ≈ 78M boxed ints per task).

    Each emitted row carries the builder task's peak RSS (``rss_mb``) so
    tests can assert the fixed per-task memory budget directly.

    With ``store_path`` set, each task writes its buckets' ``.npz`` files
    straight into the FilterStore and ships only a tiny manifest row (no
    blob) — the driver never holds filter bytes at all, which is the 10^10
    path: 800 buckets x 32 MB would otherwise be ~25 GB of driver heap.
    ``collect_to_driver=False`` then skips blob reassembly and returns a
    metadata-only PartitionedFilter (probe via ``split_by_filter_store``).
    """
    if expected is None:
        expected = seen.count()
    if expected == 0:
        return None
    if buckets is None:
        buckets = pick_buckets(expected, cap_per_bucket)
    P, knd, f_fpp = int(buckets), kind, fpp
    cap = int(cap_per_bucket)
    s_path = store_path
    ship_blob = collect_to_driver

    # 2x headroom over the even-split load for incremental epoch inserts
    exp_per_bucket = max(2 * expected // P, 1024)

    # range-partition on the bucket id: b is exactly 0..P-1, so P range
    # partitions put ~one bucket per task (hash partitioning would collide
    # O(log P) buckets into one task — several GB at cap_per_bucket)
    keyed = seen.select(
        F.col(key).cast("long").alias("k"),
        F.pmod(F.col(key), F.lit(P)).cast("int").alias("b"),
    ).repartitionByRange(P, "b")

    out_schema = T.StructType([
        T.StructField("bv", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("n_hash", T.IntegerType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("n", T.LongType()),
        T.StructField("rss_mb", T.DoubleType()),
    ])

    def part_build(batches):
        import resource

        import pyarrow as pa

        # bucket -> list of int64 chunks. Chunks are compact numpy copies
        # (copy() releases the backing Arrow buffer when the batch is
        # dropped) — peak extra memory per task ≈ 8 B/key + one transient
        # concatenate, bounded by cap_per_bucket per bucket.
        chunks: dict[int, list[np.ndarray]] = {}
        for rb in batches:
            ks = rb.column(0).to_numpy(zero_copy_only=False)
            bs = rb.column(1).to_numpy(zero_copy_only=False)
            order = np.argsort(bs, kind="stable")
            ks_s, bs_s = ks[order], bs[order]
            uniq, starts = np.unique(bs_s, return_index=True)
            bounds = np.append(starts, len(bs_s))
            for i, bv in enumerate(uniq):
                sl = ks_s[bounds[i]:bounds[i + 1]].astype(np.int64, copy=True)
                chunks.setdefault(int(bv), []).append(sl)

        def emit(bv, k_kind, size, n_hash, payload, n):
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
            return pa.RecordBatch.from_pydict(
                {"bv": [bv], "kind": [k_kind], "size": [size],
                 "n_hash": [n_hash], "blob": [payload], "n": [n],
                 "rss_mb": [rss]},
                schema=pa.schema([
                    pa.field("bv", pa.int32()),
                    pa.field("kind", pa.string()),
                    pa.field("size", pa.int64()),
                    pa.field("n_hash", pa.int32()),
                    pa.field("blob", pa.binary()),
                    pa.field("n", pa.int64()),
                    pa.field("rss_mb", pa.float64()),
                ]))

        for bv, parts in chunks.items():
            arr = parts[0] if len(parts) == 1 else np.concatenate(parts)
            parts.clear()
            if knd == "cuckoo":
                f = _cuckoo_from_keys(arr, max(len(arr) * 2, exp_per_bucket))
                size, n_hash, blob = f.n_buckets, 0, f.table.tobytes()
            else:
                f = PyBloom(max(len(arr) * 2, exp_per_bucket), f_fpp)
                f.add_many(arr)
                # ship (m, k) verbatim: probe mixing must use the exact
                # build-time parameters or present keys read as absent
                size, n_hash, blob = f.m, f.k, f.bits.tobytes()
            if s_path is not None:
                st = FilterStore(s_path)
                st.save_bucket_raw(bv, knd, f)
                # exact key segment 0 (committed-state snapshot) — the
                # store probe resolves filter maybes against these instead
                # of re-scanning the url_seen table every epoch
                st.save_key_segment(bv, 0, arr)
            yield emit(bv, knd, size, n_hash,
                       blob if ship_blob else b"", len(arr))

    built = keyed.mapInArrow(part_build, out_schema)
    pf = PartitionedFilter(P, kind=kind, cap_per_bucket=cap, fpp=f_fpp)
    pf.exact_keys = store_path is not None
    rows = built.drop("blob").collect() if not collect_to_driver \
        else built.collect()
    for r in rows:
        bv, n = int(r["bv"]), int(r["n"])
        if collect_to_driver:
            if r["kind"] == "cuckoo":
                f = PyCuckoo.__new__(PyCuckoo)
                f.n_buckets = int(r["size"])
                f.table = np.frombuffer(r["blob"], dtype=np.uint16) \
                    .reshape(f.n_buckets, PyCuckoo.SLOTS).copy()
            else:
                f = PyBloom.__new__(PyBloom)
                f.m = int(r["size"])
                f.k = int(r["n_hash"])
                f.bits = np.frombuffer(r["blob"], dtype=np.uint8).copy()
            pf.filters[bv] = f
        pf.inserted[bv] = n
        pf.capacity[bv] = max(2 * n, exp_per_bucket)
    pf.build_rss_mb = max((float(r["rss_mb"]) for r in rows), default=0.0)
    if s_path is not None:
        FilterStore(s_path).save_meta(pf)
    return pf


def merge_sorted_unique(segs: list, chunk: int = 4_000_000) -> np.ndarray:
    """K-way merge of sorted-unique int64 arrays into one sorted-unique
    array, with bounded working memory: inputs stay mmap'd (compaction
    round-4 ``np.load``-ed all 16 segments of a bucket resident —
    ~3× bucket bytes peak at 25M-key buckets, GB-scale per task — ADVICE
    r4 #7), and each round materializes only the rows at or below a
    boundary key taken ``chunk`` ahead per segment. Peak = the output
    (unavoidable: np.save needs one contiguous array) + O(k·chunk)
    transient — ~1× merged bytes instead of ~3×."""
    segs = [s for s in segs if len(s)]
    if not segs:
        return np.empty(0, dtype=np.int64)
    total = sum(len(s) for s in segs)
    out = np.empty(total, dtype=np.int64)  # upper bound (pre-dedup)
    pos = [0] * len(segs)
    n = 0
    while True:
        active = [i for i in range(len(segs)) if pos[i] < len(segs[i])]
        if not active:
            break
        # boundary = min over active segments of the key `chunk` ahead —
        # every element ≤ boundary across ALL segments is mergeable now
        bound = min(segs[i][min(pos[i] + chunk, len(segs[i])) - 1]
                    for i in active)
        pieces = []
        for i in active:
            s = segs[i]
            hi = int(np.searchsorted(s, bound, side="right"))
            hi = max(hi, pos[i])
            if hi > pos[i]:
                pieces.append(np.asarray(s[pos[i]:hi], dtype=np.int64))
                pos[i] = hi
        if not pieces:  # defensive: boundary below every cursor
            break
        m = np.unique(np.concatenate(pieces))
        if n and m.size and out[n - 1] == m[0]:  # dedup across rounds
            m = m[1:]
        out[n:n + m.size] = m
        n += m.size
    return out[:n]


class FilterStore:
    """Per-bucket filter persistence: one ``.npz`` per bucket plus a JSON
    meta file under a directory (shared storage on a real cluster: HDFS/S3
    fuse mount). The point at 10^10 keys: the total filter state (~12 GB at
    10 bits/key) must never be broadcast whole — a probe task repartitioned
    on ``pmod(key, P)`` loads ONLY its own buckets' files, so executor
    memory is bounded by buckets-per-task, not by the seen-set size."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _meta_path(self) -> str:
        return os.path.join(self.path, "filter_meta.json")

    def _bucket_path(self, bv: int) -> str:
        return os.path.join(self.path, f"bucket-{bv:06d}.npz")

    def save(self, pf: PartitionedFilter) -> None:
        """Full save (rebuilds): also drops bucket files the new layout no
        longer owns — stale files are harmless for correctness (an empty
        bucket can only false-positive, never false-negative) but waste
        probe-side loads."""
        live = {f"bucket-{bv:06d}.npz" for bv in pf.filters}
        for name in os.listdir(self.path):
            if name.startswith("bucket-") and name.endswith(".npz") \
                    and name not in live:
                os.remove(os.path.join(self.path, name))
        self.save_buckets(pf, list(pf.filters))

    def save_buckets(self, pf: PartitionedFilter, buckets: list[int]) -> None:
        """Persist only the given buckets (incremental epoch updates touch
        a handful of buckets — rewriting all P files per epoch would be
        O(filter) instead of O(epoch inserts))."""
        for bv in buckets:
            f = pf.filters.get(bv)
            if f is None:
                continue
            self.save_bucket_raw(bv, "cuckoo" if isinstance(f, PyCuckoo)
                                 else "bloom", f)
        self.save_meta(pf)

    def save_bucket_raw(self, bv: int, kind: str, f) -> None:
        """Persist one bucket's filter object (also called executor-side by
        ``build_partitioned(store_path=...)`` and ``store_apply_keys`` so
        filter bytes never transit the driver). tmp+rename so a crash
        mid-write never leaves a torn bucket file."""
        path = self._bucket_path(bv)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}.npz"
        if kind == "cuckoo":
            np.savez(tmp, kind=np.array(1), table=f.table)
        else:
            np.savez(tmp, kind=np.array(0), bits=f.bits, k=np.array(f.k))
        # np.savez appends .npz when missing; our tmp already ends in it
        os.replace(tmp, path)

    # -- exact key segments ---------------------------------------------------
    # Alongside each bucket's approximate filter, the store can keep the
    # bucket's EXACT keys as sorted int64 .npy segments, one per insert
    # batch (LSM-style). A probe then resolves the filter's maybes with
    # mmap'd searchsorted — O(log n) page touches per key — instead of an
    # anti-join against the full url_seen table: the table scan that made
    # the round-3 epoch loop O(seen) per epoch at 10^10 keys. Segments are
    # stamped with the writer's epoch so crash recovery can drop exactly
    # the orphan batches (the filter files mutate in place and are NOT
    # rolled back — extra keys there are false positives the exact
    # segments then reject, never false negatives).

    SEG_COMPACT_N = 16  # merge a bucket's segments when they exceed this

    def _seg_path(self, bv: int, seq: int) -> str:
        return os.path.join(self.path, f"bucket-{bv:06d}.keys-{seq:08d}.npy")

    def seg_paths(self, bv: int) -> list[str]:
        pre = f"bucket-{bv:06d}.keys-"
        return sorted(
            os.path.join(self.path, n) for n in os.listdir(self.path)
            if n.startswith(pre) and n.endswith(".npy"))

    def save_key_segment(self, bv: int, seq: int, arr: "np.ndarray",
                         presorted: bool = False) -> None:
        """Write one sorted-unique key segment (tmp+rename). A same-(bv,
        seq) replay overwrites with identical content — idempotent.
        ``presorted=True`` (the compaction call, whose input is
        merge_sorted_unique output) skips the np.unique re-sort+copy, so
        compaction peaks at ~1× merged bytes as documented (ADVICE r5)."""
        path = self._seg_path(bv, seq)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}.npy"
        a = np.asarray(arr, dtype=np.int64)
        np.save(tmp, a if presorted else np.unique(a))
        os.replace(tmp, path)

    def contains_exact(self, bv: int, keys: "np.ndarray") -> "np.ndarray":
        """Exact membership of ``keys`` in bucket ``bv``'s segments.
        Segments load as mmaps: searchsorted touches O(log n) pages per
        key, so probing a handful of maybes never reads whole segments."""
        found = np.zeros(len(keys), dtype=bool)
        for p in self.seg_paths(bv):
            seg = np.load(p, mmap_mode="r")
            if len(seg) == 0:
                continue
            idx = np.searchsorted(seg, keys)
            ok = idx < len(seg)
            found[ok] |= seg[idx[ok]] == keys[ok]
        return found

    def apply_key_segment(self, bv: int, seq: int, arr: "np.ndarray",
                          mode: str = "add") -> None:
        """Insert (new segment, maybe compact) or delete (rewrite segments
        in place) a batch of keys for one bucket. Compaction merges every
        PRE-EXISTING segment into one stamped with their max seq — all of
        which belong to closed epochs, so recovery (which only drops the
        crashed epoch's seq) never undoes a compaction."""
        arr = np.unique(np.asarray(arr, dtype=np.int64))
        if mode == "delete":
            for p in self.seg_paths(bv):
                seg = np.load(p)
                keep = seg[~np.isin(seg, arr, assume_unique=True)]
                if len(keep) < len(seg):
                    tmp = p + f".tmp-{uuid.uuid4().hex[:8]}.npy"
                    np.save(tmp, keep)
                    os.replace(tmp, p)
            return
        old = self.seg_paths(bv)
        if len(old) >= self.SEG_COMPACT_N:
            merged = merge_sorted_unique([np.load(p, mmap_mode="r")
                                          for p in old])
            max_seq = max(int(p.rsplit("keys-", 1)[1][:-4]) for p in old)
            self.save_key_segment(bv, max_seq, merged, presorted=True)
            for p in old:
                if p != self._seg_path(bv, max_seq):
                    os.remove(p)
        self.save_key_segment(bv, seq, arr)

    def drop_segments_from(self, seq: int) -> int:
        """Crash recovery: remove every bucket's segments stamped >= seq
        (the crashed epoch's orphan inserts). Returns #files dropped."""
        n = 0
        for name in list(os.listdir(self.path)):
            if ".keys-" in name and name.endswith(".npy"):
                s = int(name.rsplit("keys-", 1)[1][:-4])
                if s >= seq:
                    os.remove(os.path.join(self.path, name))
                    n += 1
        return n

    def has_exact_keys(self) -> bool:
        try:
            return bool(self.meta().get("exact_keys"))
        except FileNotFoundError:
            return False

    def clear(self) -> None:
        """Drop all bucket files + meta (before a rebuild with a new bucket
        layout — stale files of an old P would otherwise be probed)."""
        for name in os.listdir(self.path):
            if name.endswith(".npz") or name.endswith(".npy") \
                    or name == "filter_meta.json":
                os.remove(os.path.join(self.path, name))

    def save_meta(self, pf: PartitionedFilter,
                  source_version: int | None = None) -> None:
        meta = {"buckets": pf.buckets, "kind": pf.kind,
                "exact_keys": bool(getattr(pf, "exact_keys", False)),
                "inserted": {str(b): n for b, n in pf.inserted.items()},
                "capacity": {str(b): n for b, n in pf.capacity.items()}}
        if source_version is not None:
            meta["source_version"] = int(source_version)
        tmp = self._meta_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path())

    def meta(self) -> dict:
        with open(self._meta_path()) as fh:
            return json.load(fh)

    # -- clean-resume reload (VERDICT r5 #2) ----------------------------------
    def stamp_source(self, version: int | None) -> None:
        """Record (or clear, with None) the source-table version this
        store's contents reflect. A resumed engine reloads the store when
        the stamp equals the table's current version instead of paying the
        O(table) clear+rebuild scan every process start."""
        if not os.path.exists(self._meta_path()):
            return
        m = self.meta()
        if version is None:
            m.pop("source_version", None)
        else:
            m["source_version"] = int(version)
        tmp = self._meta_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, self._meta_path())

    def source_version(self) -> int | None:
        if not os.path.exists(self._meta_path()):
            return None
        v = self.meta().get("source_version")
        return None if v is None else int(v)

    def load_meta_only(self, cap_per_bucket: int,
                       fpp: float = 0.01) -> PartitionedFilter:
        """Metadata-only PartitionedFilter over this store's persisted
        buckets (the ``collect_to_driver=False`` shape build_partitioned
        returns): probes go through the bucket files, the driver holds only
        counters. Used by the clean-resume reload path."""
        m = self.meta()
        pf = PartitionedFilter(m["buckets"], kind=m["kind"],
                               cap_per_bucket=cap_per_bucket, fpp=fpp)
        pf.exact_keys = bool(m.get("exact_keys"))
        pf.inserted = {int(b): int(n) for b, n in m.get("inserted", {}).items()}
        pf.capacity = {int(b): int(n) for b, n in m.get("capacity", {}).items()}
        return pf

    @staticmethod
    def load_bucket(path: str, bv: int):
        """Load one bucket's filter (executor-side; returns None if the
        bucket has no keys yet)."""
        fp = os.path.join(path, f"bucket-{bv:06d}.npz")
        if not os.path.exists(fp):
            return None
        z = np.load(fp)
        if int(z["kind"]) == 1:
            f = PyCuckoo.__new__(PyCuckoo)
            f.table = z["table"]
            f.n_buckets = f.table.shape[0]
            return f
        f = PyBloom.__new__(PyBloom)
        f.bits = z["bits"]
        f.m = len(f.bits) * 8
        f.k = int(z["k"])
        return f

    def load(self) -> PartitionedFilter:
        m = self.meta()
        pf = PartitionedFilter(m["buckets"], kind=m["kind"])
        for name in os.listdir(self.path):
            if name.startswith("bucket-") and name.endswith(".npz"):
                bv = int(name[len("bucket-"):-len(".npz")])
                pf.filters[bv] = self.load_bucket(self.path, bv)
        pf.inserted = {int(b): n for b, n in m.get("inserted", {}).items()}
        pf.capacity = {int(b): n for b, n in m.get("capacity", {}).items()}
        pf.exact_keys = bool(m.get("exact_keys"))
        return pf


def tag_by_filter_store(spark: SparkSession, batch: DataFrame,
                        store_path: str, key: str = "url_key",
                        exact: bool = False) -> DataFrame:
    """``batch`` + a ``_maybe`` membership column, probing a FilterStore
    WITHOUT a broadcast: repartition the batch on ``pmod(key, P)`` so each
    task sees whole buckets, then a mapInPandas probe lazily loads each
    bucket's filter file at most once per task. This is the
    executor-memory-bounded probe for seen sets too large to broadcast
    (>~10^9 keys).

    ``exact=True`` (store built with key segments): rows the approximate
    filter flags are resolved against the bucket's exact sorted-key
    segments via mmap searchsorted, so the tag is EXACT. Returning the
    tagged frame (rather than the two filtered branches) lets a caller
    cache ONE frame and derive fresh rows, duplicate keys, and batch
    counts from it without re-running the probe per branch."""
    store = FilterStore(store_path)
    meta = store.meta()
    P = int(meta["buckets"])
    if exact and not meta.get("exact_keys"):
        raise ValueError(
            f"filter store {store_path} has no exact key segments; build "
            "it via build_partitioned(store_path=...) before exact probes")
    s_path, do_exact = store_path, exact

    out_schema = T.StructType(batch.schema.fields +
                              [T.StructField("_maybe", T.BooleanType())])

    def gen(batches):
        cache: dict[int, object] = {}
        st = FilterStore(s_path)
        for pdf in batches:
            keys = pdf[key].to_numpy(dtype=np.int64)
            b = keys % P
            maybe = np.zeros(len(pdf), dtype=bool)
            for bv in np.unique(b):
                bv = int(bv)
                if bv not in cache:
                    cache[bv] = FilterStore.load_bucket(s_path, bv)
                f = cache[bv]
                if f is not None:
                    m = b == bv
                    hits = f.contains_many(keys[m])
                    if do_exact and hits.any():
                        sub = keys[m]
                        hits[hits] = st.contains_exact(bv, sub[hits])
                    maybe[m] = hits
            pdf = pdf.copy()
            pdf["_maybe"] = maybe
            yield pdf

    # partition count decoupled from the bucket count: a small store (few
    # buckets) must not force fewer tasks than cores — P=5 buckets on 4
    # cores ran a straggler wave at parallelism 2.1 in the round-4 stage
    # audit. The count is a MULTIPLE of P (round ceil(2·cores/P) up, capped
    # at 4096): pmod(key, m·P) ≡ pmod(key, P) (mod P), so every key within
    # one RESIDUE belongs to one bucket — but repartition HASH-partitions
    # the residue value, so distinct residues can still collide into one
    # task (expected ~1 bucket/task, Poisson-distributed — ADVICE r5; a
    # strict one-bucket-per-task bound would need repartitionByRange). The
    # round-4 `max(P, 2*par)` could be misaligned (P=100, 64 cores →
    # n_parts=128 → 25 buckets/task, each np.load'ing 25 full filters —
    # ADVICE r4). Any count is CORRECT (gen groups keys by bucket); the
    # alignment only bounds the EXPECTED per-task loads. P > 4096
    # degenerates to P.
    par = spark.sparkContext.defaultParallelism
    mult = -(-2 * par // P)  # ceil(2·par / P)
    n_parts = P * min(max(mult, 1), max(4096 // P, 1))
    routed = batch.repartition(n_parts, F.pmod(F.col(key), F.lit(n_parts)))
    return routed.mapInPandas(gen, out_schema)


def split_by_filter_store(spark: SparkSession, batch: DataFrame,
                          store_path: str, key: str = "url_key",
                          exact: bool = False) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) — the two branches of
    ``tag_by_filter_store``; with ``exact=True`` the second frame IS the
    seen rows (no confirming anti-join against the url_seen table needed —
    that join was O(seen table) per epoch; the segment probe touches
    O(maybes x log(bucket)) pages)."""
    tagged = tag_by_filter_store(spark, batch, store_path, key=key,
                                 exact=exact)
    return (tagged.where(~F.col("_maybe")).drop("_maybe"),
            tagged.where(F.col("_maybe")).drop("_maybe"))


def store_apply_keys(spark: SparkSession, keys_df: DataFrame,
                     store_path: str, key: str = "url_key",
                     mode: str = "add", seq: int | None = None) -> dict:
    """Apply incremental inserts (or cuckoo deletes) to a FilterStore
    ENTIRELY executor-side: the batch is repartitioned on ``pmod(key, P)``
    so each task owns whole buckets, loads each bucket's file once, mutates
    it with numpy, and writes it back atomically. The driver sees only
    per-bucket counters — never a key (the round-2 epoch loop pulled every
    epoch's new keys through ``toPandas`` and re-saved buckets driver-side).

    Returns ``{"per_bucket": {bv: n}, "failed": int}`` — ``failed`` > 0
    (cuckoo bucket full) means the store now misses seen keys and the owner
    must rebuild before the next probe. Bucket counts are folded into the
    store's meta file so ``overfilled`` stays observable across epochs.
    """
    store = FilterStore(store_path)
    meta = store.meta()
    P, knd = int(meta["buckets"]), meta["kind"]
    s_path, m_mode = store_path, mode
    # epoch-stamped exact segments ride along when the store keeps them
    # (and segment maintenance is as executor-side as the filters)
    m_seq = seq if meta.get("exact_keys") else None

    out_schema = T.StructType([
        T.StructField("bv", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("failed", T.LongType()),
    ])

    def gen(batches):
        import pyarrow as pa

        chunks: dict[int, list[np.ndarray]] = {}
        for rb in batches:
            ks = rb.column(0).to_numpy(zero_copy_only=False)
            bs = rb.column(1).to_numpy(zero_copy_only=False)
            order = np.argsort(bs, kind="stable")
            ks_s, bs_s = ks[order], bs[order]
            uniq, starts = np.unique(bs_s, return_index=True)
            bounds = np.append(starts, len(bs_s))
            for i, bv in enumerate(uniq):
                sl = ks_s[bounds[i]:bounds[i + 1]].astype(np.int64, copy=True)
                chunks.setdefault(int(bv), []).append(sl)
        st = FilterStore(s_path)
        for bv, parts in chunks.items():
            arr = parts[0] if len(parts) == 1 else np.concatenate(parts)
            f = FilterStore.load_bucket(s_path, bv)
            failed = 0
            if m_mode == "delete":
                if m_seq is not None:
                    # deleting a key a cuckoo filter never held can evict
                    # ANOTHER key's (bucket, fingerprint) entry — a false
                    # negative for a still-present key. The exact segments
                    # are the record of what was inserted: restrict the
                    # delete to segment-present keys (r6; callers may pass
                    # supersets, e.g. TTL-expired keys some of which never
                    # entered this store).
                    arr = arr[st.contains_exact(bv, arr)]
                if len(arr) and isinstance(f, PyCuckoo):
                    f.delete_many(arr)
                    st.save_bucket_raw(bv, "cuckoo", f)
                # Bloom buckets can't delete — owner rebuilds instead
                # (the EXACT segments always can, and must, so a Bloom
                # store stays exact even while its filter over-approximates)
                if m_seq is not None and len(arr):
                    st.apply_key_segment(bv, m_seq, arr, mode="delete")
            else:
                if f is None:
                    f = (PyCuckoo(max(len(arr) * 2, 65_536))
                         if knd == "cuckoo"
                         else PyBloom(max(len(arr) * 2, 65_536)))
                if isinstance(f, PyCuckoo):
                    failed = f.add_many(arr)
                else:
                    # loaded Bloom bits may be read-only (np.load mmap) —
                    # bitwise_or.at needs a writable buffer
                    if not f.bits.flags.writeable:
                        f.bits = f.bits.copy()
                    f.add_many(arr)
                st.save_bucket_raw(bv, knd, f)
                if m_seq is not None:
                    st.apply_key_segment(bv, m_seq, arr)
            yield pa.RecordBatch.from_pydict(
                {"bv": [bv], "n": [len(arr)], "failed": [failed]},
                schema=pa.schema([pa.field("bv", pa.int32()),
                                  pa.field("n", pa.int64()),
                                  pa.field("failed", pa.int64())]))

    routed = keys_df.select(
        F.col(key).cast("long").alias("k"),
        F.pmod(F.col(key), F.lit(P)).cast("int").alias("b"),
    ).repartition(min(P, 256), "b")
    rows = routed.mapInArrow(gen, out_schema).collect()
    per_bucket = {int(r["bv"]): int(r["n"]) for r in rows}
    failed = sum(int(r["failed"]) for r in rows)
    # fold counters into the meta file (tiny JSON — no keys)
    sign = -1 if mode == "delete" else 1
    ins = {int(b): n for b, n in meta.get("inserted", {}).items()}
    for bv, n in per_bucket.items():
        ins[bv] = max(0, ins.get(bv, 0) + sign * n)
    meta["inserted"] = {str(b): n for b, n in ins.items()}
    with open(os.path.join(store_path, "filter_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return {"per_bucket": per_bucket, "failed": failed}


def split_by_filter(spark: SparkSession, batch: DataFrame, filt,
                    key: str = "url_key",
                    bc_out: list | None = None) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) under any approximate-membership filter
    exposing ``contains_many`` (PyBloom / PyCuckoo). With no filter,
    everything is maybe.

    The probe is an Arrow-batched pandas UDF over the broadcast filter —
    a handful of numpy ops per batch, no per-row Python.

    ``bc_out``: optional list the created Broadcast is appended to, so a
    long-running caller (the epoch loop) can ``unpersist`` it once the
    epoch's actions have executed — each epoch re-broadcasts the mutated
    filter, and without retirement the stale copies linger until GC
    (O(epochs) executor memory on a long crawl).
    """
    if filt is None:
        return batch.limit(0), batch
    bc = spark.sparkContext.broadcast(filt)
    if bc_out is not None:
        bc_out.append(bc)

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
                   bloom=None, bc_out: list | None = None) -> DataFrame:
    """Two-phase membership: approximate fast path (Bloom or cuckoo) +
    exact anti-join on maybes. Semantically identical to ``exact_new_urls``
    (neither filter has false negatives). Pass a prebuilt filter to
    amortize the build across epochs."""
    if bloom is None:
        bloom = build_bloom(seen, key=key, fpp=fpp)
    definitely_new, maybe = split_by_filter(spark, batch, bloom, key=key,
                                            bc_out=bc_out)
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
