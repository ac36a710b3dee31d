"""Float hash-stability audit for the contract registry (round 4).

Two failure classes can flip the driver's exact value hash even when a
query is algorithmically right:

1. **Cross-engine ulp drift**: Spark (JVM libm/BigDecimal) and the
   DuckDB oracle disagree in the last ulp of a transcendental, and a
   final round()/floor() amplifies that into a different digit.
   Defense: quantize ONCE with floor(x*scale + 0.5) into integers
   (pure IEEE ops — bit-identical given the same inputs) and verify
   the MARGIN: the distance from x*scale + 0.5 to the nearest integer
   must exceed any plausible accumulated cross-engine error (we demand
   1e-6; ln/div chains accumulate ~1e-10 relative).

2. **Shuffle-order nondeterminism**: a double SUM over a shuffle
   (groupBy agg, iterative PageRank) adds in partition order, so two
   runs of the SAME query can differ in the last ulp. Defense: run
   every float-emitting query twice under different
   spark.sql.shuffle.partitions and require EXACT hash equality.

Usage: python tools/audit_float_margins.py [sf_dir]
Exit 1 on any margin below threshold or any nondeterministic query.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from check_contract import table_hash  # noqa: E402

MARGIN_THRESHOLD = 1e-6

#: (query, column, scale) triples whose contract output is
#: floor(col*scale + 0.5) of a transcendental-derived double — the
#: quantities whose boundary margin must be audited.
QUANTIZED = {
    "revisit": [
        ("lambda_per_s", 86400.0 * 10000.0, "lambda_per_day_e4"),
        ("revisit_interval_s", 1.0, "revisit_interval_s"),
        ("next_due_s", 1.0, "next_due_s"),
    ],
}


def boundary_margin(x: float, scale: float) -> float:
    """Distance of x*scale + 0.5 from the nearest integer — how far a
    cross-engine perturbation of x must push to change floor()."""
    v = x * scale + 0.5
    return abs(v - round(v))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T
    from spider_spark.operators import revisit as RV
    from spider_spark.session import get_spark

    spark = get_spark("float_audit", cpus=8)
    failures: list[str] = []

    # -- Part A: quantization margins on the raw (pre-floor) doubles --
    print("== Part A: floor-boundary margins ==")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    hist = ev.select(
        F.concat(F.lit("u"), (eid % 500).cast("string")).alias("url"),
        (F.floor(eid / 500) * 43200.0).cast("double").alias("fetch_time"),
        F.when(
            F.col("event_type").isin("purchase", "error"),
            F.concat(F.lit("c"), eid.cast("string")),
        ).otherwise(F.lit("stable")).alias("content_digest"),
    )
    raw = RV.change_rate_schedule(hist).collect()
    for col, scale, out_name in QUANTIZED["revisit"]:
        margins = [
            boundary_margin(r[col], scale) for r in raw if r[col] is not None
        ]
        m = min(margins) if margins else math.inf
        ok = m >= MARGIN_THRESHOLD
        print(
            f"revisit.{out_name}: min margin {m:.3e} over {len(margins)} "
            f"rows {'OK' if ok else 'TOO CLOSE'}"
        )
        if not ok:
            failures.append(f"revisit.{out_name} margin {m:.3e}")

    # round-4 folds: lp_e3 (text_metrics) is floor(avg_logp*1000 + 0.5)
    from spider_spark.operators import lmquality as LM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = LM.fit_unigram(docs, min_count=2, vocab_cap=4096)
    lp_rows = LM.score_unigram(docs, model).select("avg_logp").collect()
    margins = [
        boundary_margin(r["avg_logp"], 1000.0)
        for r in lp_rows
        if r["avg_logp"] is not None
    ]
    m = min(margins) if margins else math.inf
    print(
        f"text_metrics.lp_e3: min margin {m:.3e} over {len(margins)} rows "
        f"{'OK' if m >= MARGIN_THRESHOLD else 'TOO CLOSE'}"
    )
    if m < MARGIN_THRESHOLD:
        failures.append(f"text_metrics.lp_e3 margin {m:.3e}")

    # opic_ppm (pagerank fold) is round(rank*1e6, 2): the half-up
    # boundary sits where frac(rank*1e8) == 0.5
    from pyspark.sql import functions as SF
    from spider_spark.operators import graphrank as GR

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select(
        (SF.col("l_orderkey") % 300).alias("src"),
        (SF.col("l_partkey") % 300).alias("dst"),
    )
    hits_df = GR.hits(edges, n_iter=4)
    trust_seeds = spark.range(0, 300, 10).select(SF.col("id").alias("node"))
    for nm, ranks in (
        ("opic_ppm", GR.opic(edges, n_iter=6)),
        ("rank_ppm", GR.pagerank(edges, damping=0.85, n_iter=6)),
        ("hub_ppm", hits_df.select(SF.col("hub").alias("rank"))),
        ("auth_ppm", hits_df.select(SF.col("auth").alias("rank"))),
        ("trust_ppm", GR.trustrank(edges, trust_seeds, damping=0.85, n_iter=6)),
    ):
        vals = [r["rank"] for r in ranks.collect()]
        margins = [abs((v * 1e8) % 1.0 - 0.5) for v in vals]
        m = min(margins) if margins else math.inf
        print(
            f"pagerank.{nm}: min round-2dp margin {m:.3e} over "
            f"{len(margins)} rows {'OK' if m >= MARGIN_THRESHOLD else 'TOO CLOSE'}"
        )
        if m < MARGIN_THRESHOLD:
            failures.append(f"pagerank.{nm} margin {m:.3e}")

    # temp_rate_e6 (data_mix fold) is floor(rate*1e6 + 0.5) of the
    # pow/sum-derived temperature rate — and temp_kept compares the
    # (exact) md5 hash fraction against the QUANTIZED rate, so the only
    # cross-engine surface is this floor boundary plus the gate margin.
    from spider_spark.operators import mixing as MX

    trates = MX.temperature_rates(
        docs.select("doc_id", "source"), alpha=0.5, stratum_col="source"
    ).collect()
    margins = [boundary_margin(r["rate"], 1e6) for r in trates]
    m = min(margins) if margins else math.inf
    print(
        f"data_mix.temp_rate_e6: min margin {m:.3e} over {len(margins)} "
        f"strata {'OK' if m >= MARGIN_THRESHOLD else 'TOO CLOSE'}"
    )
    if m < MARGIN_THRESHOLD:
        failures.append(f"data_mix.temp_rate_e6 margin {m:.3e}")
    qrate = {
        r["source"]: math.floor(r["rate"] * 1e6 + 0.5) / 1e6 for r in trates
    }
    fracs = docs.select(
        "source",
        MX.hash_fraction(
            SF.concat(SF.lit("temp:"), SF.col("doc_id").cast("string"))
        ).alias("frac"),
    ).collect()
    gate = min(abs(r["frac"] - qrate[r["source"]]) for r in fracs)
    # the hash fraction is exact in both engines; the gate can only
    # flip if a rate's e6 unit changes, which moves it by 1e-6 — so
    # demand the nearest fraction sit further than that from the rate.
    print(
        f"data_mix.temp_kept: min gate margin {gate:.3e} over {len(fracs)} "
        f"docs {'OK' if gate >= 1e-6 else 'TOO CLOSE'}"
    )
    if gate < 1e-6:
        failures.append(f"data_mix.temp_kept gate margin {gate:.3e}")

    # -- Part B: shuffle-order determinism of float-emitting queries --
    print("== Part B: determinism under different shuffle partitioning ==")
    qs = E.queries()
    # queries whose output has no double column but whose values derive
    # from float comparisons internally (data_mix: the temp_kept gate
    # compares a hash fraction against a sum/pow-derived rate)
    force_part_b = {"data_mix"}
    for name, fn in qs.items():
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        df1 = fn(spark, sf_dir)
        if name not in force_part_b and not any(
            isinstance(f.dataType, (T.DoubleType, T.FloatType))
            for f in df1.schema.fields
        ):
            continue
        h1 = table_hash(df1.toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        h2 = table_hash(fn(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        ok = h1 == h2
        print(f"{name}: {'DETERMINISTIC' if ok else 'HASH DIVERGED'} "
              f"{h1[2][:8]} vs {h2[2][:8]}")
        if not ok:
            failures.append(f"{name} nondeterministic across partitioning")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
