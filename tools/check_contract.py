"""Dev harness: run every __spark_entry__ query against its DuckDB
oracle at a given sf dir, mimicking the driver's comparison (row count +
sorted column names + order-insensitive value hash).

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def norm_cell(v):
    """EXACT cell normalization (round-4 fix).

    The round-3 version re-rounded floats to 4dp and collapsed
    integral floats — strictly WEAKER than the driver's value hash, so
    it passed `revisit` locally while the driver failed it. Exact
    float representation (shortest round-trip repr) is strictly
    STRONGER than any deterministic driver normalization: if the local
    hash matches, the underlying values are bit-identical, so every
    function of them — including the driver's — matches too.
    Local green therefore implies driver green by construction.
    """
    if v is None or v != v:  # NaN/None
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):  # np.float64 is a float subclass
        return repr(float(v))
    return str(v)


def table_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = ["\x1f".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return len(df), cols, hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from spider_spark.session import get_spark

    spark = get_spark("contract_check", cpus=8)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            failures.append(name)
            continue
        t1 = time.monotonic()
        if name not in oracles:
            print(f"{name}: rows-only rows={len(sdf)} spark={t1-t0:.1f}s")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name}: DUCKDB ERROR {type(ex).__name__}: {str(ex)[:300]}")
            failures.append(name)
            continue
        sn, sc, sh = table_hash(sdf)
        on, oc, oh = table_hash(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK" if ok else "MISMATCH"
        print(
            f"{name}: {status} rows={sn}/{on} spark={t1-t0:.1f}s "
            f"duck={time.monotonic()-t1:.1f}s"
            + ("" if ok else f" cols={sc}|{oc} hash={sh[:8]}|{oh[:8]}")
        )
        if not ok:
            failures.append(name)
            if sc == oc and sn and on:
                s_s = sdf[sorted(sdf.columns)].copy()
                o_s = odf[sorted(odf.columns)].copy()
                s_rows = {
                    "\x1f".join(norm_cell(v) for v in r)
                    for r in s_s.itertuples(index=False)
                }
                o_rows = {
                    "\x1f".join(norm_cell(v) for v in r)
                    for r in o_s.itertuples(index=False)
                }
                print("  spark-only:", list(s_rows - o_rows)[:3])
                print("  duck-only :", list(o_rows - s_rows)[:3])

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
