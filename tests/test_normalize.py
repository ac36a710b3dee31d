"""Golden-vector tests for the normalize-stage scalar functions.

Expected values derive from the reference helpers' semantics
(``python_spiders/helper.py``; exact line cites in each builder's
docstring). Vectors were computed by executing the reference logic by
hand on the inputs below.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.functions import normalize as N


def col_vals(spark, inputs, builder, extra=None):
    df = spark.createDataFrame([(x,) for x in inputs], "x string")
    if extra is not None:
        df = df.withColumn("src", F.lit(extra))
        out = df.select(builder(F.col("x"), F.col("src")).alias("y"))
    else:
        out = df.select(builder(F.col("x")).alias("y"))
    return [r["y"] for r in out.collect()]


def test_remove_white_spaces(spark):
    got = col_vals(spark, ["  a \t b\n\nc ", "x"], N.remove_white_spaces)
    assert got == ["a b c", "x"]


def test_extract_number_only(spark):
    # helper.py:88-102 with default separators thousand='.', scale=','
    inputs = ["€ 1.200,50 warm", "no digits", "750 EUR", "1.024"]
    got = col_vals(spark, inputs, N.extract_number_only)
    assert got == ["1200.50", "0", "750", "1024"]


def test_extract_number_only_custom_separators(spark):
    got = col_vals(
        spark,
        ["$1,200.75 pm"],
        lambda c: N.extract_number_only(c, thousand_separator=",", scale_separator="."),
    )
    assert got == ["1200.75"]


def test_extract_last_number_only(spark):
    # note: the reference regex also matches the '2' in 'm2', so use 'sqm'
    got = col_vals(spark, ["2 rooms 85 sqm", "none"], N.extract_last_number_only)
    assert got == ["85", "0"]


def test_get_price_min_of_two_parses(spark):
    # helper.py:47-61: "1.200" -> min(1200, 1) is 1 -> <10 so take max
    got = col_vals(spark, ["1.200", "450", "1,5"], N.get_price)
    assert got == [1200, 450, 15]


def test_convert_to_numeric(spark):
    got = col_vals(spark, ["12", "12.5", "abc", None], N.convert_to_numeric)
    assert got == [12.0, 12.5, None, None]


def test_currency_parser(spark):
    # helper.py:140-169 precedence, incl. the australia rule for '$'
    cases = [
        ("rent € 500", "immo_de", "EUR"),
        ("\xa3 1200 pcm", "uk_site", "GBP"),
        ("$ 300 pw", "rent_australia_site", "AUD"),
        ("$ 300", "us_site", "USD"),
        ("4.500 TL", "turkey", "TRY"),
        ("CHF 2000", "swiss", "CHF"),
        ("500 EUR", "x", "EUR"),
        ("plain", "x", None),
    ]
    df = spark.createDataFrame([(a, b) for a, b, _ in cases], "x string, src string")
    got = [
        r["y"] for r in df.select(N.currency_parser(F.col("x"), F.col("src")).alias("y")).collect()
    ]
    assert got == [c[2] for c in cases]


def test_format_date(spark):
    got = col_vals(spark, ["31/12/2021", "2021-05-01", "soon"], N.format_date)
    # parse success -> ISO; failure -> passthrough (helper.py:172-183)
    assert got == ["2021-12-31", "2021-05-01", "soon"]


def test_energy_label_bands(spark):
    vals = ["95", "85", "75", "60", "45", "30", "10", "0", "x"]
    got = col_vals(spark, vals, N.energy_label_extractor)
    assert got == ["A", "B", "C", "D", "E", "F", "G", None, None]


def test_sq_feet_to_meters(spark):
    # helper.py:36-44: int(1000 / 10.764) == 92
    got = col_vals(spark, ["1000", "107"], N.sq_feet_to_meters)
    assert got == [92, 9]


def test_string_found_word_boundary(spark):
    df = spark.createDataFrame([("Has Balcony!",), ("unbalconied",)], "x string")
    got = [
        r["y"] for r in df.select(N.string_found(["balcony"], F.col("x")).alias("y")).collect()
    ]
    assert got == [True, False]


def test_amenity_flags(spark):
    df = spark.createDataFrame(
        [("Schöne Wohnung mit Balkon und Aufzug, Haustiere erlaubt",), ("plain text",)],
        "x string",
    )
    flags = N.amenity_flags(F.col("x"))
    out = df.select(*[v.alias(k) for k, v in flags.items()]).collect()
    assert out[0]["balcony"] is True
    assert out[0]["elevator"] is True
    assert out[0]["pets_allowed"] is True
    assert out[0]["swimming_pool"] is None
    assert all(out[1][k] is None for k in N.AMENITIES)


def test_description_cleaner(spark):
    got = col_vals(
        spark,
        ["<p>Nice flat</p>  near park. Contact us at x@y.de or 030-123-456"],
        N.description_cleaner,
    )
    # tags stripped, lowercased, 'contact...' tail removed, whitespace collapsed
    assert got == ["nice flat near park."]


def test_property_type_lookup(spark):
    got = col_vals(spark, ["Wohnung", " villa ", "unknown-label"], N.property_type_lookup)
    assert got == ["apartment", "house", None]


def test_rent_sanity_filter(spark):
    df = spark.createDataFrame([("500",), ("0",), ("50000",), ("x",)], "x string")
    got = [r["k"] for r in df.select(N.rent_sanity_filter(F.col("x")).alias("k")).collect()]
    assert got == [True, False, False, False]


def test_extract_coordinates(spark):
    lat, lon = N.extract_coordinates(F.col("x"))
    df = spark.createDataFrame([("LatLng(52.52, 13.405)",)], "x string")
    row = df.select(lat.alias("a"), lon.alias("b")).collect()[0]
    assert row["a"] == "52.52"
    assert row["b"] == "13.405"


def test_weekly_to_monthly(spark):
    df = spark.createDataFrame([(250,)], "x int")
    assert df.select(N.weekly_to_monthly_rent(F.col("x")).alias("y")).collect()[0]["y"] == 1000
