"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship = one crawl scheduling step (frontier pop → URL-seen
anti-join → politeness gate → payload fetch join) over a frontier synthesized
deterministically from the sf0.001 documents table.

queries()/oracle_sql(): the full operator registry lives in
scrapy_newsutils_spark/plans/driver_queries.py — each Spark query paired with
a DuckDB-ANSI oracle producing identical values (column names aliased to
match on both sides; floats rounded; engine-internal hashes never emitted).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scrapy_newsutils_spark.plans import driver_queries as DQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one crawl scheduling step over sf0.001 (rows > 0, stable
    schema). Pure DataFrame — pop top-3 per host by priority, drop seen,
    politeness-gate, join the payload (documents stands in for the web)."""
    from pyspark.sql import Window

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = DQ._frontier(docs)
    seen = fr.where(F.col("doc_id") % 10 == 0).select("doc_id")
    fresh = fr.join(seen, "doc_id", "left_anti")
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(),
                                           F.col("doc_id").asc())
    popped = fresh.withColumn("pop_rank", F.row_number().over(w)).where(
        F.col("pop_rank") <= 3)
    payload = docs.select("doc_id", F.substring("text", 1, 80).alias("caption"),
                          "lang", "n_chars")
    return popped.join(payload, "doc_id").select(
        "host", "doc_id", "url", "pop_rank", "caption", "lang", "n_chars")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    driver_queries.py for the operator mapping in each docstring)."""
    return {name: fn for name, (fn, _) in DQ.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query. Every registered query
    currently ships one (simhash included — oracled via an md5 hash family
    since round 2); the ``is not None`` guard stays for future genuinely
    non-SQL-expressible ops."""
    return {name: sql for name, (_, sql) in DQ.QUERIES.items() if sql is not None}
