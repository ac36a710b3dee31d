"""Broadcast enrichment dims: geocoding + FX — the side-channel killers.

The reference calls blocking REST APIs inside parse callbacks:
ArcGIS geocode/reverse-geocode (``helper.py:366-387``, 475 spiders) and
currency exchange rates (``helper.py:453-485``). That is a per-row RPC
on the reactor thread — the known bottleneck of the reference
(SURVEY.md §3.3). Here both become PRE-JOINED broadcast dimension
tables: the lookup is a broadcast hash join, zero RPCs in the hot path;
a production deployment refreshes the dim tables out-of-band.

The fixtures are deterministic (formula-derived) so tests and the
DuckDB oracle rebuild them bit-for-bit; lat/long stay STRINGS to match
the reference schema (``items.py:31-32``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_GEO = 200


def geo_fixture_df(spark: SparkSession, n: int = N_GEO) -> DataFrame:
    """Deterministic geocode dim: address_key -> (lat, long, zip, city).

    lat = '45.' + lpad(key*37 % 10000), long = '8.' + lpad(key*53 % 10000),
    zip = 10000 + key*7 % 89999, city = 'city' + key % 40 — pure integer
    formulas, reproducible in any engine.
    """
    return spark.range(n).select(
        F.col("id").cast("int").alias("address_key"),
        F.concat(F.lit("45."), F.lpad((F.col("id") * 37 % 10000).cast("string"), 4, "0"))
        .alias("latitude"),
        F.concat(F.lit("8."), F.lpad((F.col("id") * 53 % 10000).cast("string"), 4, "0"))
        .alias("longitude"),
        (F.lit(10000) + F.col("id") * 7 % 89999).cast("string").alias("zipcode"),
        F.concat(F.lit("city"), (F.col("id") % 40).cast("string")).alias("city"),
    )


def enrich_geocode(df: DataFrame, geo: DataFrame, on: str = "address_key") -> DataFrame:
    """Attach (latitude, longitude, zipcode, city) via broadcast join —
    the set-oriented replacement for extract_location_from_address /
    extract_location_from_coordinates (helper.py:366-387)."""
    return df.join(F.broadcast(geo), on=on, how="left")


#: deterministic FX dim (EUR base) — the currencyExchangeRates analog
#: (helper.py:453-485); production refreshes this table out-of-band.
FX_RATES_EUR: dict[str, float] = {
    "EUR": 1.0,
    "GBP": 1.17,
    "USD": 0.92,
    "AUD": 0.61,
    "TRY": 0.028,
    "CHF": 1.05,
    "QAR": 0.25,
}


def fx_rates_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(c, r) for c, r in FX_RATES_EUR.items()], "currency string, rate_eur double"
    )


def convert_to_eur(df: DataFrame, rates: DataFrame, amount_col: str = "rent") -> DataFrame:
    """amount * rate_eur via broadcast join; unknown currency -> NULL."""
    return df.join(F.broadcast(rates), on="currency", how="left").withColumn(
        f"{amount_col}_eur", F.round(F.col(amount_col) * F.col("rate_eur"), 2)
    )
