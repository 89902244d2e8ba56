"""Politeness: robots.txt gate + per-host crawl-delay token bucket.

Reference budget: ``ROBOTSTXT_OBEY=True``, 16 concurrent per domain
(demo/default_settings.py:22-32) and the 1-request/60s extreme of the e-zine
client (src/newsutils/ezines/thesportsdb.py:698-699).

Engine expression — declarative where possible:

- the robots table is tiny (one row per host) → broadcast join;
- the *token bucket* is per-epoch budget arithmetic: with epoch wall budget
  B ms and host delay d ms, a host may fetch ``floor(B/d)`` URLs this epoch
  (unlimited if d = 0, capped by max_concurrency·B/1000 in-flight slots).
  Because the popped set already carries ``pop_rank`` (1 = best), the bucket
  is just ``pop_rank <= allowance`` — a filter, not stateful Python;
- disallow prefixes: ``exists(disallow_prefixes, p -> path startswith p)``.

Rows denied by robots are dropped with status 'robots_denied'; rows beyond
the token allowance are *deferred* (stay in the frontier for the next epoch)
— exactly a token bucket observed at epoch granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_EPOCH_BUDGET_MS = 60_000


def with_politeness(popped: DataFrame, robots: DataFrame,
                    epoch_budget_ms: int = DEFAULT_EPOCH_BUDGET_MS) -> DataFrame:
    """Tag popped rows with a politeness decision.

    Adds ``polite_status`` ∈ {ok, robots_denied, deferred} and
    ``sim_fetch_ms`` (the token-bucket pacing timestamp within the epoch:
    rank·delay — used by the fetch stage's simulated clock).
    """
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    joined = popped.join(F.broadcast(robots), "host", "left")
    delay = F.coalesce(F.col("crawl_delay_ms"), F.lit(0))
    conc = F.coalesce(F.col("max_concurrency"), F.lit(16))
    allowance = (
        F.when(delay <= 0, F.lit(2_147_483_647))
        .otherwise(F.floor(F.lit(epoch_budget_ms) / delay).cast("int"))
    )
    allowance = F.least(allowance, conc * F.lit(epoch_budget_ms / 1000.0).cast("int"))
    denied = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    return (
        joined.withColumn(
            "polite_status",
            F.when(denied, F.lit("robots_denied"))
            .when(F.col("pop_rank") > allowance, F.lit("deferred"))
            .otherwise(F.lit("ok")),
        )
        .withColumn(
            "sim_fetch_ms",
            F.when(F.col("polite_status") == "ok",
                   (F.col("pop_rank").cast("long") - 1) * delay.cast("long"))
            .otherwise(F.lit(None).cast("long")),
        )
        .drop("crawl_delay_ms", "disallow_prefixes", "max_concurrency")
    )
