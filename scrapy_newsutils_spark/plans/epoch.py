"""The scheduling-epoch loop: the engine's equivalent of a Scrapy crawl.

One epoch = one micro-batch (SURVEY §2.7 T1 — the reference pushes items
one-at-a-time through pipeline priorities 100→110→120→300,
/root/reference/src/newsutils/conf/posts.py:86-91; the engine processes the
same stages set-wise):

  1. pop top-k per host from the frontier   (priority queue, skew-salted)
  2. URL-seen membership                    (Bloom fast path + anti-join)
  3. politeness gate                        (robots broadcast + token bucket)
  4. fetch                                  (payload join → image+caption rows)
  5. commit: fetched ∪ url_seen ∪ frontier' ∪ metrics — each a snapshot
     commit; the epoch's state transition is recorded in the frontier
     manifest so a killed job resumes from the last committed epoch with
     identical frontier state (north rule T5).

Atomicity note: Iceberg would give one multi-table transaction. The
emulation commits in dependency order (fetched → url_seen → frontier-last);
the frontier manifest carries ``epoch`` + the companion table versions, so
resume replays or discards any partially-committed epoch deterministically —
same guarantee, Iceberg-style (idempotent re-run keyed on epoch).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import schemas
from ..operators import dedup, frontier as frontier_ops, politeness
from ..sources import fetch as fetch_ops
from ..sources.snapshot_table import SnapshotTable


@dataclass
class EpochResult:
    epoch: int
    popped: int
    fetched_ok: int
    robots_denied: int
    dedup_dropped: int
    deferred: int
    wall_s: float
    frontier_version: int


@dataclass
class CrawlEngine:
    spark: SparkSession
    root: str
    images: DataFrame
    robots: DataFrame
    top_k: int = 10
    epoch_budget_ms: int = politeness.DEFAULT_EPOCH_BUDGET_MS
    salts: int = 16
    use_bloom: bool = True
    compact_every: int = 16  # frontier delete-deltas before MoR compaction
    history: list[EpochResult] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.frontier_t = SnapshotTable(os.path.join(self.root, "frontier"), schemas.FRONTIER)
        self.url_seen_t = SnapshotTable(os.path.join(self.root, "url_seen"), schemas.URL_SEEN)
        self.fetched_t = SnapshotTable(os.path.join(self.root, "fetched"), schemas.FETCHED)
        self.metrics_t = SnapshotTable(os.path.join(self.root, "metrics"), schemas.METRICS)
        # Bloom sidecar state: built lazily from url_seen, extended
        # incrementally per epoch (driver holds the bitmap; a fresh engine —
        # i.e. a resumed job — rebuilds it from the table).
        self._bloom: dedup.PyBloom | None = None
        self._bloom_capacity = 0
        self._bloom_inserted = 0

    # -- state ---------------------------------------------------------------
    def bootstrap(self, frontier_df: DataFrame, url_seen_df: DataFrame | None = None) -> None:
        """Initial state commit (epoch 0 = the shared seed list)."""
        self.frontier_t.overwrite(frontier_df, meta={"epoch": 0})
        if url_seen_df is not None:
            self.url_seen_t.overwrite(url_seen_df, meta={"epoch": 0})

    def last_epoch(self) -> int:
        return int(self.frontier_t.manifest()["meta"].get("epoch", 0))

    def _recover(self, epoch: int) -> None:
        """Discard partial commits from a crashed epoch.

        The frontier commit is last and carries the epoch number; any
        companion-table rows stamped with an epoch the frontier never
        reached belong to a killed run and are rolled back, so a resumed
        run replays the epoch from identical state (T5)."""
        spark = self.spark
        if int(self.fetched_t.manifest()["meta"].get("epoch", 0)) >= epoch:
            self.fetched_t.overwrite(
                self.fetched_t.read(spark).where(F.col("epoch") < epoch),
                meta={"epoch": epoch - 1, "recovered": True},
            )
        if int(self.url_seen_t.manifest()["meta"].get("epoch", 0)) >= epoch:
            self.url_seen_t.overwrite(
                self.url_seen_t.read(spark).where(F.col("first_seen_epoch") < epoch),
                meta={"epoch": epoch - 1, "recovered": True},
            )
        if int(self.metrics_t.manifest()["meta"].get("epoch", 0)) >= epoch:
            self.metrics_t.overwrite(
                self.metrics_t.read(spark).where(F.col("epoch") < epoch),
                meta={"epoch": epoch - 1, "recovered": True},
            )

    # -- bloom sidecar ---------------------------------------------------------
    def _get_bloom(self, seen: DataFrame) -> dedup.PyBloom | None:
        """Build once from url_seen, then extend incrementally per epoch.
        Rebuilt when inserts outgrow capacity (fpp would degrade)."""
        if self._bloom is not None and self._bloom_inserted <= self._bloom_capacity:
            return self._bloom
        n_seen = seen.count()
        # size for this run's growth so per-epoch inserts don't force rebuilds
        capacity = max(n_seen * 2, n_seen + 64 * self.top_k * 210, 1024)
        self._bloom = dedup.build_bloom(seen, expected=capacity)
        self._bloom_capacity = capacity
        self._bloom_inserted = n_seen
        return self._bloom

    def _bloom_add(self, keys) -> None:
        if self._bloom is not None and len(keys):
            import numpy as np

            self._bloom.add_many(np.asarray(keys, dtype=np.int64))
            self._bloom_inserted += len(keys)

    # -- one epoch -----------------------------------------------------------
    def run_epoch(self) -> EpochResult:
        spark = self.spark
        t0 = time.time()
        epoch = self.last_epoch() + 1
        self._recover(epoch)
        frontier_v = self.frontier_t.current_version()

        frontier = self.frontier_t.read(spark)
        seen = self.url_seen_t.read(spark)

        # 1. priority pop (skew-salted tree top-k)
        popped = frontier_ops.pop_top_k_per_host(frontier, self.top_k, salts=self.salts).cache()

        # 2. URL-seen membership (epoch-level: state table vs this batch)
        if self.use_bloom:
            fresh = dedup.new_urls_bloom(spark, popped, seen,
                                         bloom=self._get_bloom(seen))
        else:
            fresh = dedup.exact_new_urls(popped, seen)

        # re-rank after dedup: seen URLs must not consume politeness budget
        # (reference: Scrapy's dupefilter drops requests before the
        # scheduler, so the download budget only ever sees fresh URLs).
        # Cheap — the input is already capped at k rows/host.
        fresh = fresh.drop("pop_rank").withColumn(
            "pop_rank",
            F.row_number().over(
                Window.partitionBy("host").orderBy(*frontier_ops.pop_order())
            ),
        )

        # 3. politeness gate + 4. fetch
        polite = politeness.with_politeness(fresh, self.robots, self.epoch_budget_ms).cache()
        fetched = fetch_ops.execute_fetches(polite, self.images, epoch).unionByName(
            fetch_ops.denied_rows(polite, epoch)
        ).cache()

        # counters — one aggregation job per cached frame
        n_popped = popped.count()
        by_polite = {r["polite_status"]: r["n"] for r in
                     polite.groupBy("polite_status").agg(F.count("*").alias("n")).collect()}
        n_fresh = sum(by_polite.values())
        n_dedup_dropped = n_popped - n_fresh
        n_deferred = by_polite.get("deferred", 0)
        # per-partition lineage rows double as the status counters — one job
        part_rows = (
            fetched.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.first("host").alias("host_group"),
                F.count("*").alias("popped"),
                F.sum(F.when(F.col("status") != "robots_denied", 1).otherwise(0)).alias("fetched"),
                F.sum(F.when(F.col("status") == "robots_denied", 1).otherwise(0)).alias("robots_denied"),
            )
            .collect()
        )
        n_ok = int(sum(r["fetched"] for r in part_rows))
        n_denied = int(sum(r["robots_denied"] for r in part_rows))

        # 5. commits (dependency order; frontier last carries the epoch)
        self.fetched_t.append(fetched, meta={"epoch": epoch})

        attempted = polite.where(F.col("polite_status") != "deferred")
        seen_upd = dedup.seen_updates(attempted, epoch)
        self.url_seen_t.append(seen_upd, meta={"epoch": epoch})
        if self.use_bloom:
            # Arrow path — Row-object collect() is ~10x slower driver-side
            self._bloom_add(
                seen_upd.select("url_key").toPandas()["url_key"].to_numpy())

        # frontier': remove attempted + duplicate rows (deferred stay queued)
        # as a merge-on-read delete delta — O(popped), never O(frontier).
        remove = popped.join(
            polite.where(F.col("polite_status") == "deferred").select("url_key"),
            "url_key", "left_anti",
        )
        fv = self.frontier_t.delete_by_keys(
            remove.select("url_key"), ["url_key"],
            meta={
                "epoch": epoch,
                "url_seen_version": self.url_seen_t.current_version(),
                "fetched_version": self.fetched_t.current_version(),
            },
            expected_version=frontier_v,
        )
        if self.frontier_t.n_delete_deltas() >= self.compact_every:
            fv = self.frontier_t.compact(spark, meta={"epoch": epoch, "compaction": True})

        # per-partition lineage/metrics rows (north rule) — already collected
        wall_ms = int((time.time() - t0) * 1000)
        metrics = spark.createDataFrame(
            [
                (epoch, r["partition_id"], r["host_group"], r["popped"],
                 r["fetched"], r["robots_denied"], int(n_dedup_dropped), wall_ms)
                for r in part_rows
            ],
            schemas.METRICS,
        )
        self.metrics_t.append(metrics, meta={"epoch": epoch})

        for df in (popped, polite, fetched):
            df.unpersist()

        res = EpochResult(
            epoch=epoch, popped=n_popped, fetched_ok=n_ok, robots_denied=n_denied,
            dedup_dropped=n_dedup_dropped, deferred=n_deferred,
            wall_s=time.time() - t0, frontier_version=fv,
        )
        self.history.append(res)
        return res

    def run(self, epochs: int) -> list[EpochResult]:
        out = []
        for _ in range(epochs):
            res = self.run_epoch()
            out.append(res)
            if res.popped == 0:
                break
        return out
