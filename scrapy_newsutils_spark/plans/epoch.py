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
    history: list[EpochResult] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.frontier_t = SnapshotTable(os.path.join(self.root, "frontier"), schemas.FRONTIER)
        self.url_seen_t = SnapshotTable(os.path.join(self.root, "url_seen"), schemas.URL_SEEN)
        self.fetched_t = SnapshotTable(os.path.join(self.root, "fetched"), schemas.FETCHED)
        self.metrics_t = SnapshotTable(os.path.join(self.root, "metrics"), schemas.METRICS)

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
            fresh = dedup.new_urls_bloom(spark, popped, seen)
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

        # counters (single pass over the cached frames)
        n_popped = popped.count()
        n_fresh = polite.count()
        n_dedup_dropped = n_popped - n_fresh
        by_status = {r["status"]: r["n"] for r in
                     fetched.groupBy("status").agg(F.count("*").alias("n")).collect()}
        n_ok = by_status.get("ok", 0) + by_status.get("missing", 0)
        n_denied = by_status.get("robots_denied", 0)
        n_deferred = polite.where(F.col("polite_status") == "deferred").count()

        # 5. commits (dependency order; frontier last carries the epoch)
        self.fetched_t.append(fetched, meta={"epoch": epoch})

        attempted = polite.where(F.col("polite_status") != "deferred")
        self.url_seen_t.append(dedup.seen_updates(attempted, epoch),
                               meta={"epoch": epoch})

        # frontier': remove attempted rows; deferred + dup rows stay queued.
        # (dup rows are removed too — they are seen, never to be fetched)
        remove = popped.join(
            polite.where(F.col("polite_status") == "deferred").select("url_key"),
            "url_key", "left_anti",
        )
        new_frontier = frontier_ops.remove_popped(frontier, remove)
        fv = self.frontier_t.overwrite(
            new_frontier,
            meta={
                "epoch": epoch,
                "url_seen_version": self.url_seen_t.current_version(),
                "fetched_version": self.fetched_t.current_version(),
            },
            expected_version=frontier_v,
        )

        # per-partition lineage/metrics rows (north rule)
        metrics = (
            fetched.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.first("host").alias("host_group"),
                F.count("*").alias("popped"),
                F.sum(F.when(F.col("status") != "robots_denied", 1).otherwise(0)).alias("fetched"),
                F.sum(F.when(F.col("status") == "robots_denied", 1).otherwise(0)).alias("robots_denied"),
            )
            .withColumn("epoch", F.lit(epoch))
            .withColumn("dedup_dropped", F.lit(n_dedup_dropped).cast("long"))
            .withColumn("wall_ms", F.lit(int((time.time() - t0) * 1000)))
            .select([f.name for f in schemas.METRICS.fields])
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
