"""Extra bench harness (guide §1.4): time individual declared queries in
isolation with the noop sink (computes every column, discards the result) so
the measurement is the computation, not the sink or the harness loop.

Does NOT replace bench.py (frozen for measurement): numbers from here are
cited as isolation evidence in OPTIMIZATION_r06.md.

Usage:
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py [-r N] q1 q2 ...
  (no query args = all bench.py HEADLINE queries)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

from scrapy_newsutils_spark.plans import driver_queries as DQ  # noqa: E402
from scrapy_newsutils_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    repeats = 1
    if args and args[0] == "-r":
        repeats = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    names = args or [n for n in DQ.QUERIES if n != "stream_compose_stats"]
    out: dict[str, list[float]] = {}
    for name in names:
        fn, _ = DQ.QUERIES[name]
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"  {name:26s} {samples}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus),
                      "sink": "noop", "queries": out}))


if __name__ == "__main__":
    main()
