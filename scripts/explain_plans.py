"""Dump .explain("formatted") physical plans for the headline queries into
PLANS.md, with a short automated audit: does the scan show PushedFilters /
pruned ReadSchema, are small dims broadcast, how wide are the
WholeStageCodegen spans.

Usage: python scripts/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapy_newsutils_spark.plans import driver_queries as DQ  # noqa: E402
from scrapy_newsutils_spark.session import get_spark  # noqa: E402

AUDIT_QUERIES = [
    "pricing_summary", "nation_revenue", "top_orders_per_cust",
    "frontier_pop_topk", "url_seen_antijoin", "minhash_band_pairs",
    "embedding_topk", "text_quality", "daily_events", "similarity_bands",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=4)
    out = ["# PLANS — physical plans of the headline queries",
           "",
           f"`explain('formatted')` at `{sf_dir}`, audited for: filter",
           "pushdown, column pruning, broadcast joins, codegen spans.",
           ""]
    for name in AUDIT_QUERIES:
        fn, _ = DQ.QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        n_bcast = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
        n_exchange = plan.count("Exchange ")
        audit = (f"- pushed filters: {[p for p in pushed if p] or 'none'}\n"
                 f"- read schemas: {read_schemas or 'n/a'}\n"
                 f"- joins: {n_bcast} broadcast, {n_smj} sort-merge; "
                 f"{n_exchange} exchanges; {n_codegen} codegen spans\n")
        out += [f"## {name}", "", audit, "```", plan.strip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
