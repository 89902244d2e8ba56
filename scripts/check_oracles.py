"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() twin on DuckDB at sf0.01; compare row count,
column names, and an order-insensitive value hash (columns sorted by name).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from scrapy_newsutils_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(v):
    import datetime as dt
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(normalize(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[2:] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
               else sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark(app_name="check_oracles", master="local[8]",
                      shuffle_partitions=8)

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in sqls:
            print(f"  {name:28s} rows={len(srows):>7d}  (rows-only, no oracle)"
                  f"  {time.time()-t0:5.1f}s")
            if len(srows) == 0:
                print(f"    !! EMPTY result")
            continue
        res = con.execute(sqls[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = value_hash(scols, srows)
        dh = value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(f"  {name:28s} {status} rows={len(srows):>7d}/{len(drows):<7d}"
              f" cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'}"
              f"  {time.time()-t0:5.1f}s")
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print(f"    spark cols: {sorted(scols)}\n    duck  cols: {sorted(dcols)}")
            if not ok_hash and ok_cols and ok_count:
                # show first differing rows for debugging
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                s_set = {tuple(normalize(r[i]) for i in order) for r in srows}
                d_order = sorted(range(len(dcols)), key=lambda i: dcols[i])
                d_set = {tuple(normalize(r[i]) for i in d_order) for r in drows}
                only_s = list(s_set - d_set)[:3]
                only_d = list(d_set - s_set)[:3]
                print(f"    spark-only: {only_s}\n    duck-only:  {only_d}")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
