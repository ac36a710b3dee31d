"""Recrawl (revisit) scheduling from observed change rates.

A crawler that maintains freshness must decide *when to fetch a URL
again*. The published approach (Cho & Garcia-Molina, "Estimating
frequency of change", ACM TOIT 2003 — the estimator production crawlers
and the original Google incremental crawler papers build on) models
each page as a Poisson change process and estimates its rate from
repeated fetches: with ``n`` re-fetch intervals of which ``X`` showed a
changed content digest, the bias-corrected estimator is

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / mean_interval

The reference fleet re-crawls on a fixed scrapyd cadence
(``docker/schedule.py`` — every spider, every cycle, no per-URL
adaptivity); at a 10^10-URL frontier, fetch budget must instead follow
measured change rates. This operator turns a fetch-history table into
per-URL rates and next-due times; feeding ``next_due <= now`` into the
wave loop's admission makes the crawl incremental.

Scale shape: one window over ``(url)`` ordered by fetch time (lag of
the content digest — the same shuffle key as every other per-URL
stage, host/url-hash partitioned), then one map-side-combinable
groupBy. No self-joins, no Python. Everything is plain SQL semantics,
so the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rate_schedule(
    history: DataFrame,
    url_col: str = "url",
    time_col: str = "fetch_time",
    digest_col: str = "content_digest",
    min_interval_s: float = 3600.0,
    max_interval_s: float = 30.0 * 86400.0,
) -> DataFrame:
    """Per-URL Poisson change-rate estimate and next fetch due time.

    ``history`` has one row per completed fetch: (url, fetch_time
    [timestamp or epoch seconds], content_digest). Returns one row per
    URL:

    * ``n_fetches``, ``n_changes`` — observed sample counts (a change =
      digest differs from the previous fetch of the same URL);
    * ``lambda_per_s`` — bias-corrected Cho/Garcia-Molina estimator
      (NULL for URLs fetched once: no interval evidence yet);
    * ``revisit_interval_s`` — 1/lambda clamped to
      [min_interval_s, max_interval_s]; never-changed URLs back off to
      the max, single-fetch URLs get the min (optimistic first revisit);
    * ``next_due_s`` — last fetch epoch + interval.

    The clamp is the standard guard: lambda_hat is 0 when no change was
    ever seen (infinite interval) and unboundedly large when every
    fetch changed (interval below politeness floor).
    """
    w = Window.partitionBy("url").orderBy("t")
    per_fetch = history.select(
        F.col(url_col).alias("url"),
        F.col(time_col).cast("double").alias("t"),
        F.col(digest_col).alias("d"),
    ).withColumn("prev_d", F.lag("d").over(w))

    agg = per_fetch.groupBy("url").agg(
        F.count("*").alias("n_fetches"),
        F.sum(
            F.when(
                F.col("prev_d").isNotNull() & (F.col("d") != F.col("prev_d")), 1
            ).otherwise(0)
        ).alias("n_changes"),
        F.max("t").alias("last_t"),
        ((F.max("t") - F.min("t")) / F.greatest(F.count("*") - 1, F.lit(1))).alias(
            "mean_interval_s"
        ),
    )
    n_intervals = F.col("n_fetches") - 1
    lam = F.when(
        (n_intervals > 0) & (F.col("mean_interval_s") > 0),
        -F.log((n_intervals - F.col("n_changes") + 0.5) / (n_intervals + 0.5))
        / F.col("mean_interval_s"),
    )
    interval = F.when(lam.isNull(), F.lit(min_interval_s)).otherwise(
        F.least(
            F.lit(max_interval_s),
            F.greatest(
                F.lit(min_interval_s),
                F.when(lam > 0, F.lit(1.0) / lam).otherwise(F.lit(max_interval_s)),
            ),
        )
    )
    # Emitted at full double precision: the engine consumes next_due_s
    # in comparisons (precision-insensitive) and contract queries
    # quantize ONCE at the edge (floor(x*scale + 0.5) into integer
    # units — pure IEEE arithmetic, bit-identical across engines),
    # instead of stacking round() calls whose decimal re-quantization
    # differs between JVM BigDecimal and other engines' libm at the ulp.
    return agg.select(
        "url",
        "n_fetches",
        "n_changes",
        lam.alias("lambda_per_s"),
        interval.alias("revisit_interval_s"),
        (F.col("last_t") + interval).alias("next_due_s"),
    )


def due_urls(
    schedule: DataFrame, now_s: float, url_col: str = "url"
) -> DataFrame:
    """The admission predicate: URLs whose next_due has passed — the
    rows an incremental crawl re-enqueues into the frontier this wave."""
    return schedule.filter(F.col("next_due_s") <= F.lit(float(now_s))).select(
        url_col, "next_due_s", "lambda_per_s"
    )
