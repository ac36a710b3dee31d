"""Host-level politeness scheduler — a salted-key priority queue over DataFrames.

Reference semantics being reproduced (observable contract, SURVEY.md §2.2):

* per-host dispatch budget per wave:
  ``budget(host) = min(max_concurrency, floor(wave_seconds / crawl_delay))``
  with defaults from ``python_spiders/settings.py:24,31,76-78``
  (CONCURRENT_REQUESTS_PER_DOMAIN=16, AutoThrottle delay 0.1–2 s) and
  per-spider DOWNLOAD_DELAY overrides (``95bis_com.py:28``);
* within a host, dispatch order is (priority DESC, discovered_seq ASC) —
  Scrapy pops highest priority first; our deterministic discovery
  sequence is the tie-break (the reference's in-process LIFO is not
  reproducible across a cluster, so discovery order is the documented
  contract, cf. SURVEY.md §4 "deterministic ordering reproduction");
* robots.txt prefix rules (engine feature; the reference disables it via
  ``ROBOTSTXT_OBEY=False``, ``settings.py:21`` — so ``obey_robots``
  defaults False and the rules table is empty unless enabled).

Scale design — the two-phase salted top-k:

A single hot host (crawler honeypots, link farms) puts its entire
pending queue in one window partition. Phase 1 ranks within
``(host, salt)`` where ``salt = pmod(xxhash64(fingerprint), n_salts)``
and keeps only ``k`` rows per salt bucket — any row in the true per-host
top-k must be in its salt bucket's top-k, so this is lossless. Phase 2
ranks the surviving ``<= n_salts * k`` rows per host exactly. The heavy
shuffle is on the salted key (uniform by construction); the exact pass
touches a bounded set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import (
    DEFAULT_CRAWL_DELAY_S,
    DEFAULT_MAX_CONCURRENCY,
)
from ..functions.domains import with_registered_domain

def dispatch_order():
    """Ordering contract within a host: priority DESC, discovery ASC."""
    return [F.desc("priority"), F.asc("discovered_seq")]


def host_budget_col(wave_seconds: float) -> F.Column:
    """Per-host dispatch budget for one wave (columns from host_policy)."""
    delay = F.coalesce(F.col("crawl_delay_s"), F.lit(DEFAULT_CRAWL_DELAY_S))
    conc = F.coalesce(F.col("max_concurrency"), F.lit(DEFAULT_MAX_CONCURRENCY))
    by_delay = F.floor(F.lit(float(wave_seconds)) / delay).cast("int")
    return F.greatest(F.lit(1), F.least(conc, by_delay))


def topk_per_key_salted(
    df: DataFrame,
    key: str,
    k_col: str,
    n_salts: int = 16,
    order=None,
    salt_source: str = "fingerprint",
) -> DataFrame:
    """Exact per-key top-k with bounded skew.

    ``k_col`` is a per-row column holding that key's k (the politeness
    budget), constant within a key. Lossless two-phase reduction as
    described in the module docstring. Emits ``dispatch_rank`` (1-based
    dispatch order within the key).
    """
    order = order or dispatch_order()
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)).cast("int")
    )
    w1 = Window.partitionBy(key, "_salt").orderBy(*order)
    pre = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col(k_col))
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        pre.withColumn("dispatch_rank", F.row_number().over(w2))
        .filter(F.col("dispatch_rank") <= F.col(k_col))
    )


def robots_filter(frontier: DataFrame, host_policy: DataFrame, obey: bool) -> DataFrame:
    """Drop rows whose canonical path starts with a disallowed prefix.

    Broadcast-joins the (small) policy dim and checks prefixes with
    ``exists(robots_disallow, p -> startswith(path, p))`` — JVM-side
    higher-order function, no UDF. With ``obey=False`` (the reference's
    configuration) this is the identity.
    """
    if not obey:
        return frontier
    rules = host_policy.select("host", "robots_disallow")
    joined = frontier.join(F.broadcast(rules), on="host", how="left")
    # Empty path (http://host) means '/' per RFC 9309, so 'Disallow: /'
    # must block the root URL too (round-4 fix, mirrors robots_check).
    raw_path = F.regexp_extract(
        F.col("canonical_url"), r"^[a-z0-9+.-]+://[^/]*(/.*)$", 1
    )
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    blocked = F.exists(
        F.coalesce(F.col("robots_disallow"), F.array().cast("array<string>")),
        lambda p: path.startswith(p),
    )
    return joined.filter(~blocked).drop("robots_disallow")


#: columns that uniquely identify a frontier row (discovered_seq alone
#: is unique, the rest make the join key self-documenting)
ROW_KEY = ["crawl_id", "fingerprint", "dont_filter", "discovered_seq"]


def schedule_wave(
    pending: DataFrame,
    host_policy: DataFrame,
    wave_seconds: float = 1.0,
    n_salts: int = 16,
    obey_robots: bool = False,
    global_cap: int | None = None,
    broadcast_dispatch: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Select this wave's dispatch set from the pending frontier.

    Returns ``(dispatch, deferred)``. ``host_policy`` is broadcast (a
    per-host dim — thousands of rows, not billions).

    Shuffle shape: the default ranks the full rows directly — ONE pass
    over ``pending``, with the salted window bounding any single
    partition. ``broadcast_dispatch=True`` instead ranks a NARROW
    projection (key + host + priority) and broadcast-joins the winners
    (``sum(host budgets)`` rows) back onto ``pending`` — the wide rows
    never shuffle, at the cost of 3 scans of ``pending``. Measured
    locally: the narrow path wins when ``pending`` is a lazy pipeline
    (scan is fused, shuffle dominates); the wide path wins when
    ``pending`` is already materialized (scan ≈ free, passes dominate).
    Flip it on for frontiers with fat meta/body columns on a real
    cluster where shuffle I/O is the bottleneck.

    ``global_cap`` applies the reference's fleet-wide in-flight bound
    (CONCURRENT_REQUESTS=320, ``settings.py:24``) AFTER per-host
    budgets, ordered by (priority DESC, discovered_seq ASC); the
    sort+limit plans as TakeOrderedAndProject (per-partition top-k +
    merge — no global sort).
    """
    pending = robots_filter(pending, host_policy, obey_robots)
    policy = host_policy.select("host", "crawl_delay_s", "max_concurrency")

    base = pending.select(*ROW_KEY, "host", "priority") if broadcast_dispatch else pending
    enriched = base.join(F.broadcast(policy), on="host", how="left")
    enriched = enriched.withColumn("_budget", host_budget_col(wave_seconds))

    winners = topk_per_key_salted(enriched, key="host", k_col="_budget", n_salts=n_salts)
    winners = winners.drop("crawl_delay_s", "max_concurrency", "_budget")
    if global_cap is not None:
        winners = winners.orderBy(*dispatch_order()).limit(global_cap)

    if broadcast_dispatch:
        keys = winners.select(*ROW_KEY, "dispatch_rank")
        dispatch = pending.join(F.broadcast(keys), on=ROW_KEY, how="inner")
        deferred = pending.join(
            F.broadcast(keys.select(*ROW_KEY)), on=ROW_KEY, how="left_anti"
        )
    else:
        dispatch = winners
        deferred = pending.join(winners.select(*ROW_KEY), on=ROW_KEY, how="left_anti")
    return dispatch, deferred


def budget_by_registered_domain(
    frontier: DataFrame,
    psl: DataFrame,
    domain_budget: int,
    n_salts: int = 16,
) -> DataFrame:
    """Per-REGISTERED-DOMAIN dispatch budget on top of the per-host
    scheduler: one site operator typically owns every subdomain
    (``a.example.co.uk``, ``b.example.co.uk``, …), so per-host budgets
    undercount them — the standard crawl-budget key is eTLD+1 (the
    publicsuffix.org registered domain; IRLbot WWW'08 budgets per
    "domain" for exactly this reason). Composes the PSL extraction
    (``functions/domains.with_registered_domain`` — only the DISTINCT
    host dim explodes) with the same lossless two-phase salted top-k
    the per-host scheduler uses, keyed on the registered domain.

    Hosts on a public suffix itself (or matching no rule) have no
    registered domain; they fall back to their own host as the budget
    key — each is its own operator, the conservative reading. Emits
    ``dispatch_rank`` within the registered domain; rows past
    ``domain_budget`` are deferred exactly like per-host overflow.
    """
    fr = with_registered_domain(frontier, psl, host_col="host")
    fr = fr.withColumn(
        "_budget_key", F.coalesce(F.col("reg_domain"), F.col("host"))
    ).withColumn("_k", F.lit(int(domain_budget)))
    return (
        topk_per_key_salted(fr, key="_budget_key", k_col="_k", n_salts=n_salts)
        .drop("_k", "reg_domain")
        .withColumnRenamed("_budget_key", "budget_domain")
    )
