"""Snapshot-committed parquet tables: Iceberg-style semantics without the jar.

The north rule asks for Iceberg state tables (frontier, url_seen, posts,
fetched, metrics) with atomic snapshot commits so a killed job resumes from
the last committed snapshot with identical state. The Iceberg runtime jar is
not available in this sandbox, so this module provides the same *semantics*
on plain parquet:

- every commit writes a fresh data directory plus a JSON manifest
  ``_snapshots/v{N}.json``; the table's visible state flips atomically by
  renaming a tempfile onto ``_snapshots/CURRENT`` (POSIX rename atomicity);
- readers resolve CURRENT → manifest → data dirs, so a reader never sees a
  half-written commit;
- optimistic concurrency: ``commit(expected_version=...)`` refuses to commit
  over a version it did not read (replaces the reference's psutil
  ``is_running`` singleton guard — /root/reference/src/newsutils/crawl/commands.py:27-38);
- time travel: ``read(version=k)`` for resume/lineage inspection;
- MERGE INTO is emulated set-wise (anti-join + union) — the same shuffle
  shape Iceberg's copy-on-write MERGE produces.

On a real cluster, swap this class for ``spark.table("catalog.db.tbl")`` +
``MERGE INTO``; the operator code above it is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CommitConflict(RuntimeError):
    """Another writer committed since this writer read the table."""


class SnapshotTable:
    # MoR delete deltas at or under this on-disk size are broadcast in
    # read() (~12M int64 keys of snappy parquet; the JVM hash relation for
    # that is ~200 MB — inside a comfortable executor budget)
    DELETE_BROADCAST_MAX_BYTES = 96 * 1024 * 1024

    def __init__(self, path: str, schema: T.StructType):
        self.path = path
        self.schema = schema
        self._snap_dir = os.path.join(path, "_snapshots")
        os.makedirs(self._snap_dir, exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------
    def _current_file(self) -> str:
        return os.path.join(self._snap_dir, "CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._current_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._snap_dir, f"v{version:08d}.json")

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "dirs": [], "meta": {}, "deletes": [],
                    "part_dirs": {}}
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    # -- read -----------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Current table state = base data dirs minus delete deltas
        (merge-on-read: equality deletes applied as one anti-join at read
        time — Iceberg MoR semantics; see ``delete_by_keys``)."""
        m = self.manifest(version)
        dirs = list(m["dirs"]) + [d for pd in m.get("part_dirs", {}).values()
                                  for d in pd]
        if not dirs:
            return spark.createDataFrame([], self.schema)
        df = spark.read.schema(self.schema).parquet(
            *[os.path.join(self.path, d) for d in dirs]
        )
        deletes = m.get("deletes", [])
        if deletes:
            key_cols = deletes[0]["keys"]
            del_dirs = [os.path.join(self.path, d["dir"]) for d in deletes]
            keys = spark.read.parquet(*del_dirs)
            # Iceberg-style: broadcast small equality-delete sets so the MoR
            # anti-join never re-shuffles the (huge) base. Without this a
            # few-MB delta over the broadcast threshold forces a full
            # sort-merge of the base per read — measured 2x epoch pop cost.
            # Size from local file stat (cheap); cap ≈ 12M int64 keys.
            del_bytes = sum(
                os.path.getsize(os.path.join(dd, f))
                for dd in del_dirs for f in os.listdir(dd)
                if f.endswith(".parquet"))
            if del_bytes <= self.DELETE_BROADCAST_MAX_BYTES:
                keys = F.broadcast(keys)
            df = df.join(keys, key_cols, "left_anti")
        return df

    # -- write ----------------------------------------------------------------
    def _write_data(self, df: DataFrame) -> str:
        d = f"data-{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, d))
        return d

    def _commit_manifest(self, dirs: list[str], meta: dict,
                         expected_version: int | None,
                         deletes: list[dict] | None = None,
                         part_dirs: dict[str, list[str]] | None = None) -> int:
        cur = self.current_version()
        if expected_version is not None and cur != expected_version:
            raise CommitConflict(
                f"table {self.path}: version moved {expected_version} -> {cur}"
            )
        new_v = cur + 1
        manifest = {
            "version": new_v,
            "parent": cur,
            "dirs": dirs,
            "meta": meta,
            "deletes": deletes or [],
            "part_dirs": part_dirs or {},
            "committed_at": time.time(),
        }
        mpath = self._manifest_path(new_v)
        if os.path.exists(mpath):  # concurrent writer beat us to new_v
            raise CommitConflict(f"manifest v{new_v} already exists")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.rename(mpath + ".tmp", mpath)
        # atomic flip of CURRENT
        fd, tmp = tempfile.mkstemp(dir=self._snap_dir)
        with os.fdopen(fd, "w") as f:
            f.write(str(new_v))
        os.rename(tmp, self._current_file())
        return new_v

    def overwrite(self, df: DataFrame, meta: dict | None = None,
                  expected_version: int | None = None) -> int:
        """Copy-on-write full replacement (one new data dir, new snapshot)."""
        d = self._write_data(df)
        return self._commit_manifest([d], meta or {}, expected_version)

    def append(self, df: DataFrame, meta: dict | None = None,
               expected_version: int | None = None) -> int:
        """Fast append: keep previous data dirs, add one (merge-on-read
        flavour — right for high-churn append-mostly tables like metrics)."""
        d = self._write_data(df)
        m = self.manifest()
        return self._commit_manifest(m["dirs"] + [d], meta or {},
                                     expected_version, m.get("deletes", []),
                                     m.get("part_dirs", {}))

    def adopt_parquet_dir(self, src_dir: str, meta: dict | None = None,
                          expected_version: int | None = None) -> int:
        """Zero-copy bootstrap: hardlink an existing parquet directory's
        data files into a fresh data dir and commit it as this table's
        state. The cluster analog is Iceberg's add_files/register_table —
        adopting externally-written files by manifest reference instead of
        rewriting them. Requires same-filesystem src (hardlinks); falls
        back to copies otherwise."""
        d = f"data-{uuid.uuid4().hex[:12]}"
        dst = os.path.join(self.path, d)
        os.makedirs(dst, exist_ok=True)
        for name in os.listdir(src_dir):
            if not (name.endswith(".parquet") or name == "_SUCCESS"):
                continue
            sp_, dp_ = os.path.join(src_dir, name), os.path.join(dst, name)
            try:
                os.link(sp_, dp_)
            except OSError:
                shutil.copy2(sp_, dp_)
        return self._commit_manifest([d], meta or {}, expected_version)

    def delete_by_keys(self, keys: DataFrame, key_cols: list[str],
                       meta: dict | None = None,
                       expected_version: int | None = None) -> int:
        """Merge-on-read equality delete: commit a tiny delta of keys; rows
        matching any committed delete key disappear from ``read``.

        THE high-churn path at frontier scale — popping 10^5 URLs from a
        10^10-row frontier must not rewrite the frontier (copy-on-write of
        the base is O(table); this is O(delta)). NOTE: deletes apply to the
        whole table state, including later appends with the same key —
        frontier semantics guarantee popped keys are never re-inserted
        (they live in url_seen from then on). Compact with ``compact()``
        when the delete set grows past ~10% of base."""
        d = self._write_data(keys.select(*key_cols).dropDuplicates(key_cols))
        m = self.manifest()
        dels = m.get("deletes", []) + [{"dir": d, "keys": key_cols}]
        if any(e["keys"] != key_cols for e in dels):
            raise ValueError("all delete deltas of a table must share key_cols")
        return self._commit_manifest(m["dirs"], meta or {}, expected_version,
                                     dels, m.get("part_dirs", {}))

    def compact(self, spark: SparkSession, meta: dict | None = None,
                expected_version: int | None = None) -> int:
        """Materialize base − deletes into fresh base dirs (MoR compaction)."""
        return self.overwrite(self.read(spark), meta, expected_version)

    def n_delete_deltas(self) -> int:
        return len(self.manifest().get("deletes", []))

    def merge_upsert(
        self,
        spark: SparkSession,
        batch: DataFrame,
        key_cols: list[str],
        meta: dict | None = None,
        expected_version: int | None = None,
    ) -> int:
        """Emulated ``MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
        INSERT``: existing rows whose key collides with the batch are
        replaced by the batch row (batch wins), everything else is kept.

        Mirrors the reference upsert sink ``Day.save``/``update_or_create``
        (/root/reference/src/newsutils/crawl/day.py:103-156). The anti-join
        shuffles on the key — identical shape to Iceberg CoW MERGE.
        """
        existing = self.read(spark)
        batch = batch.select([f.name for f in self.schema.fields])
        keep = existing.join(
            batch.select(*key_cols).dropDuplicates(key_cols), on=key_cols, how="left_anti"
        )
        merged = keep.unionByName(batch.dropDuplicates(key_cols))
        return self.overwrite(merged, meta, expected_version)

    def merge_upsert_partitioned(
        self,
        spark: SparkSession,
        batch: DataFrame,
        key_cols: list[str],
        part_expr,
        meta: dict | None = None,
        expected_version: int | None = None,
    ) -> int:
        """Partition-scoped MERGE: rewrite ONLY the partitions the batch
        touches — Iceberg CoW MERGE with partition pruning, the fix for the
        round-1 full-table rewrite (O(table) per merge at 100 TB; a crawl
        batch touches a handful of days of a day-partitioned posts table).

        ``part_expr``: Column (or name) whose value partitions the table —
        e.g. ``F.to_date("publish_time")``. The manifest maps each partition
        value to its data dirs; a merge reads + rewrites only the dirs of
        the batch's distinct values, every other partition's files are
        byte-identical untouched (asserted in tests). The table must be
        written exclusively through this method (plus append/delete, which
        preserve partition dirs); mixing with ``overwrite``/``merge_upsert``
        resets it to unpartitioned.
        """
        if isinstance(part_expr, str):
            part_expr = F.col(part_expr)
        m = self.manifest()
        if m["dirs"]:
            # tolerate the common bootstrap pattern overwrite(empty_df):
            # empty base dirs carry no rows and can be dropped from the
            # layout; NON-empty base dirs would make the scoped merge skip
            # their rows, so those are refused.
            base = spark.read.schema(self.schema).parquet(
                *[os.path.join(self.path, d) for d in m["dirs"]])
            if base.limit(1).count() > 0:
                raise ValueError(
                    "table has non-empty unpartitioned base dirs; partition-"
                    "scoped merge requires a table written only via "
                    "merge_upsert_partitioned")
            m = {**m, "dirs": []}
        part_dirs = dict(m.get("part_dirs", {}))
        batch = batch.select([f.name for f in self.schema.fields]) \
            .withColumn("_pv", part_expr.cast("string"))
        pvals = [r["_pv"] for r in batch.select("_pv").distinct().collect()]
        for pv in pvals:
            pv_key = "NULL" if pv is None else str(pv)
            b = (batch.where(F.col("_pv").isNull() if pv is None
                             else (F.col("_pv") == pv))
                 .drop("_pv").dropDuplicates(key_cols))
            old = part_dirs.get(pv_key, [])
            if old:
                existing = spark.read.schema(self.schema).parquet(
                    *[os.path.join(self.path, d) for d in old])
                keep = existing.join(b.select(*key_cols), key_cols, "left_anti")
                merged = keep.unionByName(b)
            else:
                merged = b
            part_dirs[pv_key] = [self._write_data(merged)]
        return self._commit_manifest([], meta or {}, expected_version,
                                     m.get("deletes", []), part_dirs)

    def partition_layout(self) -> dict[str, list[str]]:
        """Current partition-value → data-dirs mapping (test/inspection)."""
        return dict(self.manifest().get("part_dirs", {}))

    def rollback(self, version: int) -> None:
        """Reset CURRENT to an earlier snapshot (data dirs are immutable, so
        this is metadata-only — used by crash recovery to discard a
        partially-applied multi-commit epoch)."""
        cur = self.current_version()
        if version > cur:
            raise ValueError("cannot roll forward")
        fd, tmp = tempfile.mkstemp(dir=self._snap_dir)
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.rename(tmp, self._current_file())
        # drop the dead-branch manifests so future commits can reuse their
        # version numbers (data dirs stay — they may be shared with live
        # snapshots; vacuum handles orphans)
        for v in range(version + 1, cur + 1):
            try:
                os.remove(self._manifest_path(v))
            except FileNotFoundError:
                pass

    def vacuum(self, keep_last: int = 3) -> None:
        """Drop data dirs unreferenced by the last ``keep_last`` snapshots."""
        cur = self.current_version()
        live: set[str] = set()
        for v in range(max(1, cur - keep_last + 1), cur + 1):
            try:
                m = self.manifest(v)
                live.update(m["dirs"])
                live.update(e["dir"] for e in m.get("deletes", []))
                live.update(d for pd in m.get("part_dirs", {}).values()
                            for d in pd)
            except FileNotFoundError:
                pass
        for entry in os.listdir(self.path):
            if entry.startswith("data-") and entry not in live:
                shutil.rmtree(os.path.join(self.path, entry), ignore_errors=True)

    # -- convenience ----------------------------------------------------------
    def count(self, spark: SparkSession) -> int:
        return self.read(spark).count()

    def empty(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame([], self.schema)


def as_rows(df: DataFrame, *cols: str) -> DataFrame:
    """Project + stable order helper for tests."""
    return df.select(*cols).orderBy(*[F.col(c) for c in cols])
