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


def test_extract_date_golden(spark):
    """Golden vectors verified against the reference extract_date
    (helper.py:206-266) executed on these exact inputs; where the
    reference RAISES (strptime failure) we assert the documented NULL."""
    vec = [
        ("Frei ab 15.08.2021", "2021-08-15"),
        ("ab Oktober 2021", "2021-10"),
        ("01.05.2021", "2021-05-01"),
        ("august 2021", "2021-08"),
        # 'januar' substitution wins over the raw numeric path (dict order)
        ("1. Januar 2022", "2022-01-01"),
        # ...but raw numeric beats every OTHER month name
        ("mai 15.03.2021", "2021-03-15"),
        ("5.3.2021", "2021-03-05"),
        ("11.2021", "2021-11"),
        ("march 2021", "2021-03"),
        ("September 2023", "2023-09"),
        ("15/08/2021", "2021-08-15"),
        # invalid d/m/y -> format_date passthrough of the extracted text
        ("1.2.3.2021", "1/2/3"),
        ("soon", None),
        ("", None),
        # reference raises ValueError here ('january'->'01.y2021'->'01/');
        # we return NULL (documented divergence)
        ("january 2021", None),
    ]
    got = col_vals(spark, [x for x, _ in vec], N.extract_date)
    assert got == [y for _, y in vec]


def test_multilocale_available_date(spark):
    """dateparser-analog (helper.py:593-605) with today=2021-06-15:
    parsed < today => year := today.year+1 (NOT parsed.year+1)."""
    vec = [
        ("12/05/2021", "2022-05-12"),     # past -> shifted
        ("20/11/2021", "2021-11-20"),     # future -> kept
        ("3 march 2021", "2022-03-03"),
        ("15 ocak 2022", "2022-01-15"),
        ("december 7, 2020", "2022-12-07"),  # shift uses today.year+1
        ("1 mayıs 2021", "2022-05-01"),
        ("29/02/2024", "2024-02-29"),
        ("29/02/2020", None),             # shift lands on 2022-02-29 (invalid)
        ("15.06.2021", "2021-06-15"),     # parsed == today -> NOT shifted
        ("available soon", None),
        # round 4: it/de/pt month names (693 *_it spiders route Italian
        # dates through dateparser auto-detection)
        ("3 gennaio 2021", "2022-01-03"),
        ("luglio 20, 2021", "2021-07-20"),
        ("settembre 1, 2021", "2021-09-01"),
        ("12 dezember 2021", "2021-12-12"),
        ("5 märz 2021", "2022-03-05"),
        ("1 março 2022", "2022-03-01"),
        ("outubro 8, 2021", "2021-10-08"),
        # round 5: pl/da/sv/ro (the remaining reference locales —
        # easyrenting_pl cohort); Polish dates use the genitive form
        ("15 stycznia 2021", "2022-01-15"),
        ("3 marzec 2021", "2022-03-03"),
        ("7 października 2021", "2021-10-07"),
        ("grudnia 2, 2021", "2021-12-02"),
        ("1 marts 2022", "2022-03-01"),
        ("12 augusti 2021", "2021-08-12"),
        ("5 octombrie 2021", "2021-10-05"),
        ("iunie 20, 2021", "2021-06-20"),
        ("28 februarie 2021", "2022-02-28"),
    ]
    got = col_vals(
        spark, [x for x, _ in vec], lambda c: N.multilocale_available_date(c, "2021-06-15")
    )
    assert got == [y for _, y in vec]


def test_extract_rent_currency_and_pipeline(spark):
    """helper.py:309-323 unit + the pipeline's fractional double-parse
    quirk (pipelines.py:153-159: str(1200.5) -> '.' stripped -> 12005)."""
    df = spark.createDataFrame(
        [("€1.200,50 warm",), ("€1.200,00",), ("TL 950",), ("nothing",)], "x string"
    )
    rent, cur = N.extract_rent_currency(F.col("x"), F.lit("rent_de_com"), ".", ",")
    out = df.select(
        rent.alias("rent"),
        cur.alias("cur"),
        N.rent_string_pipeline_rent(F.col("x"), ".", ",").alias("stored"),
    ).collect()
    assert [(r["rent"], r["cur"], r["stored"]) for r in out] == [
        (1200.5, "EUR", 12005.0),
        (1200.0, "EUR", 1200.0),
        (950.0, "TRY", 950.0),
        (0.0, None, 0.0),
    ]


def test_extract_utilities(spark):
    """helper.py:492-498: 6 chars after the LAST symbol occurrence."""
    df = spark.createDataFrame(
        [
            ("rent € 100 plus € 156,50 x",),
            ("no symbol",),
            ("ends with €",),
        ],
        "x string",
    )
    out = df.select(N.extract_utilities("€", F.col("x")).alias("u")).collect()
    assert [r["u"] for r in out] == [" 156,5", None, ""]


def test_js_literal_pairs(spark):
    """js2xml-analog literal extraction (acorngroup_co_uk.py:104)."""
    df = spark.createDataFrame(
        [("var cfg = {lat: 45.12, lng: '8.4', zoom: 12, name: \"x\"} ;",)],
        "x string",
    )
    keys, vals = N.js_literal_pairs(F.col("x"))
    row = df.select(keys.alias("k"), vals.alias("v")).collect()[0]
    assert row["k"] == ["lat", "lng", "zoom", "name"]
    assert row["v"] == ["45.12", "8.4", "12", "x"]
