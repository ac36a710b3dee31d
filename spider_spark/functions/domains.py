"""Registered-domain (eTLD+1) extraction — the publicsuffix.org
algorithm, relational.

Per-host politeness, crawl budgets, and quality blocklists all want to
key on the REGISTERED domain (``shop.example.co.uk`` →
``example.co.uk``), not the raw host: one site operator typically owns
every subdomain, so budgets keyed per-host undercount them and
blocklists keyed per-host miss their mirrors. The mapping is defined
by the Public Suffix List and its published algorithm
(https://publicsuffix.org/list/ — public spec): among all rules whose
suffix matches the host, an exception (``!``) rule prevails, else the
longest match (a ``*.`` wildcard matches exactly one extra label); the
public suffix is the prevailing rule (exception rules minus their
leftmost label), and the registered domain is the public suffix plus
one more label. Hosts that match no explicit rule fall back to the
implicit ``*`` rule (public suffix = last label).

This container has no PSL data file, so the list is an injected dim —
callers pass their own snapshot (one ``rule`` string per row, list
syntax); a small builtin covering every rule SHAPE ships for tests and
synthetic crawls. The algorithm itself is complete.

Plan shape: the DISTINCT host dim explodes into its O(label-count)
suffix candidates via a JVM HOF (hosts have <10 labels), equi-joins
the broadcast PSL dim once, takes the per-host best rule, and the
result joins back onto the stream by host — no Python, no UDF, no
row-id correlation (host is its own key, so task retries are safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: minimal builtin list exercising every rule shape the algorithm has:
#: normal rules, multi-label rules, a wildcard, and its exception
#: (the real PSL is ~10k rules — inject it as the dim in production)
BUILTIN_PSL = [
    "com", "org", "net", "example",
    "uk", "co.uk", "org.uk",
    "jp", "co.jp",
    "*.ck", "!www.ck",
]


def psl_dim(spark, rules: list[str] | None = None) -> DataFrame:
    """The PSL as a broadcast-sized dim: (rule, is_wild, is_exc,
    suffix) where ``suffix`` is the literal part to equi-join on (a
    wildcard rule joins on its parent suffix and claims one extra
    label at evaluation time)."""
    rows = []
    for r in rules if rules is not None else BUILTIN_PSL:
        is_exc = r.startswith("!")
        body = r[1:] if is_exc else r
        is_wild = body.startswith("*.")
        suffix = body[2:] if is_wild else body
        rows.append((r, is_wild, is_exc, suffix))
    return spark.createDataFrame(
        rows, "rule string, is_wild boolean, is_exc boolean, suffix string"
    )


def registered_domains(
    hosts: DataFrame, psl: DataFrame, host_col: str = "host"
) -> DataFrame:
    """(host, reg_domain) for the DISTINCT hosts of ``hosts``.
    ``reg_domain`` is NULL when the host IS a public suffix (nothing
    registrable — e.g. ``co.uk`` itself, or a single label)."""
    dim = hosts.select(F.lower(F.col(host_col)).alias("_h")).distinct()
    labels = F.split(F.col("_h"), r"\.")
    n = F.size(labels)
    sufs = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            F.array_join(F.slice(labels, i + 1, n), ".").alias("s"),
            (n - i).alias("slen"),
        ),
    )
    cand = dim.select("_h", n.alias("_n"), F.explode(sufs).alias("_c")).select(
        "_h", "_n", F.col("_c.s").alias("_s"), F.col("_c.slen").alias("_slen")
    )
    j = cand.join(F.broadcast(psl), cand["_s"] == psl["suffix"], "inner").filter(
        # a wildcard's extra label must exist in the host
        (~F.col("is_wild")) | (F.col("_n") >= F.col("_slen") + 1)
    )
    scored = j.select(
        "_h",
        "_n",
        # labels the REGISTERED domain needs under this rule:
        # exception: the rule body itself (public suffix = body minus
        # leftmost label, +1 label back = body); wildcard: suffix + the
        # wildcard label + 1; normal: suffix + 1
        F.when(F.col("is_exc"), F.col("_slen"))
        .when(F.col("is_wild"), F.col("_slen") + 2)
        .otherwise(F.col("_slen") + 1)
        .alias("_reglen"),
        # prevailing rule: exception beats all, else longest public
        # suffix (wildcards count their extra label)
        F.when(F.col("is_exc"), F.lit(1000))
        .when(F.col("is_wild"), F.col("_slen") + 1)
        .otherwise(F.col("_slen"))
        .alias("_rank"),
    )
    best = scored.groupBy("_h").agg(
        F.max("_n").alias("_n"),
        F.max_by("_reglen", F.struct("_rank", "_reglen")).alias("_reglen"),
    )
    matched = best.select(
        "_h",
        F.when(
            F.col("_n") >= F.col("_reglen"),
            F.array_join(
                F.slice(
                    F.split(F.col("_h"), r"\."),
                    F.col("_n") - F.col("_reglen") + 1,
                    F.col("_reglen"),
                ),
                ".",
            ),
        ).alias("reg_domain"),
    )
    # hosts matching NO explicit rule: implicit '*' -> registered
    # domain is the last two labels (when they exist); hosts that DID
    # match but are too short (they ARE a public suffix) stay NULL
    fb_labels = F.split(F.col("_h"), r"\.")
    fallback = F.when(
        F.size(fb_labels) >= 2,
        F.array_join(F.slice(fb_labels, F.size(fb_labels) - 1, F.lit(2)), "."),
    ).otherwise(F.lit(None).cast("string"))
    return (
        dim.join(matched.withColumn("_m", F.lit(True)), "_h", "left")
        .select(
            F.col("_h").alias("host"),
            F.when(F.col("_m").isNull(), fallback)
            .otherwise(F.col("reg_domain"))
            .alias("reg_domain"),
        )
    )


def with_registered_domain(
    df: DataFrame, psl: DataFrame, host_col: str = "host", out_col: str = "reg_domain"
) -> DataFrame:
    """Adds ``out_col`` to ``df`` by joining :func:`registered_domains`
    of its distinct hosts back on the (lowercased) host — the stream
    never explodes, only the host dim does."""
    reg = registered_domains(df, psl, host_col=host_col).select(
        F.col("host").alias("_rd_host"), F.col("reg_domain").alias(out_col)
    )
    return df.join(
        reg, F.lower(F.col(host_col)) == F.col("_rd_host"), "left"
    ).drop("_rd_host")
