"""IVF ANN at realistic codebook size (VERDICT r3 #5): fit C=4096 centroids
over a deterministic clustered vector table (sampled Lloyd by default —
VERDICT r4 #6), then probe — reporting fit wall, probe wall, and recall@k
vs the brute-force baseline.

The corpus is generated DISTRIBUTED (fixtures.clustered_embeddings, each
row a pure function of its id) so the same script measures the same
workload at any parallelism. The fit's per-round shape is: one Arrow
matmul assign over the corpus + one (cid, component) groupBy-mean over a
posexplode — map-side partial aggregation keeps the shuffle at C×dim
groups regardless of corpus size.

Usage: python scripts/ivf_bench.py [--rows 500000] [--centroids 4096]
       [--json BENCH/ivf_c4096.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

from pyspark.sql import functions as F  # noqa: E402

from scrapy_newsutils_spark import fixtures  # noqa: E402
from scrapy_newsutils_spark.operators import training  # noqa: E402
from scrapy_newsutils_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--centroids", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--n-probe", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--fit-fraction", type=float, default=0.1,
                    help="Lloyd rounds run over df.sample(fraction, seed=42)"
                         " — the 10^10-vector fit path (VERDICT r4 #6); the"
                         " full corpus is assigned once at probe time. Pass"
                         " 1.0 for the full-corpus fit baseline")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="ivf_bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    emb = fixtures.clustered_embeddings(spark, args.rows, dim=args.dim).cache()
    emb.count()  # materialize outside the timed window

    t0 = time.time()
    centroids = training.ivf_fit_centroids(
        emb, dim=args.dim, n_centroids=args.centroids, iters=args.iters,
        fit_fraction=args.fit_fraction if args.fit_fraction < 1.0 else None)
    fit_wall = time.time() - t0

    queries = (emb.where(F.col("vec_id") < args.n_queries)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")).cache())
    queries.count()

    t0 = time.time()
    approx = training.ann_ivf_topk(
        emb, queries, dim=args.dim, k=args.k, n_centroids=args.centroids,
        n_probe=args.n_probe, centroids=centroids)
    approx_rows = approx.collect()
    probe_wall = time.time() - t0

    t0 = time.time()
    exact_rows = training.ann_bruteforce_topk(
        emb, queries, k=args.k).collect()
    brute_wall = time.time() - t0

    ap_set = {(r["q_id"], r["neighbor_id"]) for r in approx_rows}
    ex_set = {(r["q_id"], r["neighbor_id"]) for r in exact_rows}
    recall = len(ap_set & ex_set) / max(len(ex_set), 1)

    result = {
        "rows": args.rows, "dim": args.dim, "centroids": args.centroids,
        "iters": args.iters, "n_probe": args.n_probe, "k": args.k,
        "n_queries": args.n_queries, "cpus": args.cpus,
        "fit_fraction": args.fit_fraction,
        "fit_wall_sec": round(fit_wall, 2),
        "probe_wall_sec": round(probe_wall, 2),
        "bruteforce_wall_sec": round(brute_wall, 2),
        "recall_at_k": round(recall, 4),
        "scan_fraction": round(args.n_probe / args.centroids, 5),
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
