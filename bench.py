"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
plus crawl-epoch throughput, on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "crawl": {"pops_plus_fetched_per_sec": ..., ...}}

The crawl section measures the north-rule metric (frontier pops + fetched
pages per second) over a synthetic frontier; scaling-efficiency evidence
across parallelism levels is produced by scripts/scaling_bench.py (the
sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# local-mode JVM hosts driver+executors together; fetch epochs materialize
# image payloads, so give the single JVM real headroom.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

from scrapy_newsutils_spark import fixtures  # noqa: E402
from scrapy_newsutils_spark.plans import driver_queries as DQ  # noqa: E402
from scrapy_newsutils_spark.plans.epoch import CrawlEngine  # noqa: E402
from scrapy_newsutils_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "frontier_pop_topk", "url_seen_antijoin", "politeness_budget",
    "edit_classify", "crawl_compose_stats", "dedup_exact_groups",
    "minhash_band_pairs",
    "token_jaccard_pairs", "simhash_near_dups", "dedup_components",
    "embedding_topk",
    "embedding_near_dups", "ann_lsh_topk", "ann_ivf_topk",
    "similarity_pairs", "similarity_bands",
    "ezine_events", "metapost_agg", "lang_id",
    "text_quality", "pricing_summary", "nation_revenue",
    "top_orders_per_cust", "daily_events", "latest_event_per_user",
    "order_date_spine", "wordcount_filter",
]

FRONTIER_ROWS = int(os.environ.get("BENCH_FRONTIER_ROWS", "2000000"))
N_IMAGES = int(os.environ.get("BENCH_IMAGES", "1500"))
TOP_K = int(os.environ.get("BENCH_TOP_K", "200"))
EPOCHS = int(os.environ.get("BENCH_EPOCHS", "2"))


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in HEADLINE:
        fn, _ = DQ.QUERIES[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def bench_crawl(spark) -> dict:
    root = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        images = fixtures.images_table(spark, n=N_IMAGES, small=True).cache()
        images.count()
        frontier = fixtures.frontier_table(spark, n=FRONTIER_ROWS, n_images=N_IMAGES)
        robots = fixtures.robots_table(spark)
        eng = CrawlEngine(spark, root, images=images, robots=robots,
                          top_k=TOP_K, salts=16)
        eng.bootstrap(frontier, fixtures.url_seen_table(spark, frontier))
        warm = eng.run_epoch()  # JIT/code-gen warmup epoch, untimed
        t0 = time.time()
        popped = fetched = 0
        for _ in range(EPOCHS):
            r = eng.run_epoch()
            popped += r.popped
            fetched += r.fetched_ok
        wall = time.time() - t0
        return {
            "frontier_rows": FRONTIER_ROWS,
            "epochs_timed": EPOCHS,
            "popped": popped,
            "fetched": fetched,
            "wall_sec": round(wall, 2),
            "pops_plus_fetched_per_sec": round((popped + fetched) / wall, 1),
            "frontier_rows_scanned_per_sec": round(FRONTIER_ROWS * EPOCHS / wall, 0),
            "warmup_epoch_sec": round(warm.wall_s, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_crawl_parse(spark) -> dict:
    """Parse-inclusive crawl throughput (VERDICT r3 #3): discovery_mode=
    'parse' runs the REAL S2 link extractor over this epoch's fetched HTML
    payloads, so ops/s here includes parse-cost-dominated epochs — the
    regime a news crawl actually runs in."""
    root = tempfile.mkdtemp(prefix="bench_crawl_parse_")
    rows = int(os.environ.get("BENCH_PARSE_FRONTIER_ROWS", "2000000"))
    try:
        images = fixtures.html_payload_table(spark, n=N_IMAGES)
        frontier = fixtures.frontier_table(spark, n=rows, n_images=N_IMAGES)
        eng = CrawlEngine(spark, root, images=images,
                          robots=fixtures.robots_table(spark),
                          top_k=TOP_K, salts=16,
                          discovery_mode="parse",
                          discovery_images=N_IMAGES)
        eng.bootstrap(frontier, fixtures.url_seen_table(spark, frontier))
        eng.run_epoch()  # warmup
        t0 = time.time()
        popped = fetched = 0
        for _ in range(EPOCHS):
            r = eng.run_epoch()
            popped += r.popped
            fetched += r.fetched_ok
        wall = time.time() - t0
        return {
            "frontier_rows": rows,
            "epochs_timed": EPOCHS,
            "popped": popped,
            "fetched": fetched,
            "wall_sec": round(wall, 2),
            "pops_plus_fetched_per_sec": round((popped + fetched) / wall, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    # tiny warmup action (JVM/codegen)
    spark.range(1000).selectExpr("sum(id)").collect()

    queries = bench_queries(spark, sf_dir)
    skip_crawl = os.environ.get("BENCH_SKIP_CRAWL")
    crawl = {} if skip_crawl else bench_crawl(spark)
    crawl_parse = {} if skip_crawl else bench_crawl_parse(spark)

    total = round(sum(queries.values()), 3)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    def _summary(name: str):
        """Decision fields only + the artifact path — round 4 inlined the
        full scaling/IVF payloads here and the single output line outgrew
        the driver's capture buffer, truncating BENCH_r04.json mid-string
        (VERDICT r4 #2). Full payloads stay in BENCH/*.json."""
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH", name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        keep = ("scaling_efficiency", "scaling_efficiency_min", "pass",
                "target", "speedup", "rows", "recall_at_k", "fit_fraction",
                "fit_wall_sec", "probe_wall_sec", "bruteforce_wall_sec",
                "scan_fraction", "centroids")
        out = {k: d[k] for k in keep if k in d}
        for lvl in ("N", "4N"):
            if isinstance(d.get(lvl), dict):
                out[lvl] = {k: d[lvl][k] for k in
                            ("cpus", "wall_sec", "ops_per_sec")
                            if k in d[lvl]}
        out["artifact"] = f"BENCH/{name}"
        return out

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": int(cpus),
        "crawl": crawl,
        "crawl_parse_discovery": crawl_parse,
        "scaling": _summary("scaling_240m.json"),  # scripts/scaling_bench.py
        "scaling_60m": _summary("scaling_60m.json"),  # same protocol, 60M
        "ivf_scale": _summary("ivf_c4096.json"),   # scripts/ivf_bench.py
    }))


if __name__ == "__main__":
    main()
