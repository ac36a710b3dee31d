"""Normalize-stage scalar functions (SURVEY.md §2.4).

Each reference helper (``python_spiders/helper.py``) becomes a
column-expression builder — JVM-side, codegen'd, no Python in the hot
path. Cited line numbers point at the reference implementation whose
*observable semantics* each builder reproduces; unit tests in
``tests/test_normalize.py`` pin the contract with golden vectors.

ANSI-safety: Spark 4 defaults to ANSI SQL mode, so all casts that can
fail use ``try_*`` variants (a malformed value yields NULL, matching
the reference's permissive coercions).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# whitespace / charset
# ---------------------------------------------------------------------------


def remove_white_spaces(col: Column) -> Column:
    """Collapse runs of whitespace to one space and trim (helper.py:73-78)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def remove_unicode_char(col: Column) -> Column:
    """Replace non-ASCII chars with a space, then strip (helper.py:81-85)."""
    return F.trim(F.regexp_replace(col, r"[^\x00-\x7F]", " "))


def strip_tags(col: Column) -> Column:
    """HTML tags -> removed (helper.py:25-34 uses HTMLParser; the regex
    form matches its behavior on well-formed markup)."""
    return F.regexp_replace(col, r"<[^>]*>", "")


# ---------------------------------------------------------------------------
# numbers / price / rent
# ---------------------------------------------------------------------------

_NUM_RE = r"(\d+(?:\.\d+)?)"


def extract_number_only(
    col: Column, thousand_separator: str = ".", scale_separator: str = ","
) -> Column:
    """First number after separator normalization; '0' if none
    (helper.py:88-102: strips the thousand sep, maps the scale sep to
    '.', returns the first ``\\d+(\\.\\d+)?`` match, else 0)."""
    s = F.replace(col.cast("string"), F.lit(thousand_separator), F.lit(""))
    s = F.replace(s, F.lit(scale_separator), F.lit("."))
    first = F.regexp_extract(s, _NUM_RE, 1)
    return F.when(first == "", F.lit("0")).otherwise(first)


def extract_last_number_only(
    col: Column, thousand_separator: str = ".", scale_separator: str = ","
) -> Column:
    """Last number variant (helper.py:124-138)."""
    s = F.replace(col.cast("string"), F.lit(thousand_separator), F.lit(""))
    s = F.replace(s, F.lit(scale_separator), F.lit("."))
    arr = F.regexp_extract_all(s, F.lit(_NUM_RE), 1)
    return F.coalesce(F.try_element_at(arr, F.lit(-1)), F.lit("0"))


def get_price(col: Column) -> Column:
    """min of both separator interpretations; max if the min is < 10
    (helper.py:47-61 — guards against '1.200' parsing as 1.2)."""
    a = extract_number_only(col, ",", ".").try_cast("double").cast("long")
    b = extract_number_only(col, ".", ",").try_cast("double").cast("long")
    lo, hi = F.least(a, b), F.greatest(a, b)
    return F.when(lo < 10, hi).otherwise(lo)


def convert_to_numeric(col: Column) -> Column:
    """String -> number; NULL when non-numeric (helper.py:338-357).

    The reference returns int when integral else float; a Spark column
    has one type, so this yields DoubleType with integral values exact —
    the int-vs-float distinction is applied at the sink where needed.
    """
    return col.try_cast("double")


def convert_string_to_numeric(
    col: Column, thousand_separator: str = ".", scale_separator: str = ","
) -> Column:
    """extract_number_only ∘ convert_to_numeric with per-site separators
    (helper.py:519-530; applied to rent/square_meters/deposit/... at
    pipelines.py:156-173)."""
    return convert_to_numeric(extract_number_only(col, thousand_separator, scale_separator))


def sq_feet_to_meters(col: Column) -> Column:
    """int(feet / 10.764) (helper.py:36-44; the ItemClear variant at
    helper.py:646-648 multiplies by 0.09290304 instead — the reference
    carries both constants; this is the helper-function one)."""
    return (col.try_cast("double").cast("long") / F.lit(10.764)).cast("long")


def weekly_to_monthly_rent(rent: Column) -> Column:
    """rent * 4 when quoted per week (helper.py:649-651; ~209 spiders)."""
    return rent * F.lit(4)


# ---------------------------------------------------------------------------
# currency / dates / energy
# ---------------------------------------------------------------------------


def currency_parser(col: Column, external_source: Column) -> Column:
    """Symbol -> ISO code with the reference's precedence; '$' resolves
    to AUD iff 'australia' occurs in the source name (helper.py:140-169)."""
    has = col.contains
    return (
        F.when(has("€"), "EUR")
        .when(has("\xa3"), "GBP")
        .when(has("$") & external_source.contains("australia"), "AUD")
        .when(has("$"), "USD")
        .when(has("TL") | has("TRY") | has("₺"), "TRY")
        .when(has("CHF"), "CHF")
        .when(has("QAR"), "QAR")
        .when(has("EUR"), "EUR")
        .otherwise(F.lit(None).cast("string"))
    )


def format_date(col: Column, spark_format: str = "d/M/yyyy") -> Column:
    """Parse with the format -> '%Y-%m-%d'; pass through unchanged on
    failure (helper.py:172-183). Format strings use Spark datetime
    patterns (reference default '%d/%m/%Y' == 'd/M/yyyy')."""
    parsed = F.date_format(F.try_to_date(col, spark_format), "yyyy-MM-dd")
    return F.coalesce(parsed, col)


def energy_label_extractor(value: Column) -> Column:
    """kWh/m2 -> EU label A..G by the reference's bands (helper.py:185-201,
    duplicated at 500-516 and in ItemClear at 614-632)."""
    v = value.try_cast("double")
    return (
        F.when(v >= 92, "A")
        .when(v >= 81, "B")
        .when(v >= 69, "C")
        .when(v >= 55, "D")
        .when(v >= 39, "E")
        .when(v >= 21, "F")
        .when(v >= 1, "G")
        .otherwise(F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# keyword predicates / amenities
# ---------------------------------------------------------------------------


def string_found(words: list[str], col: Column) -> Column:
    """Word-boundary OR-match, case-insensitive (helper.py:64-69)."""
    pat = "(?i)\\b(" + "|".join(_re.escape(w) for w in words) + ")\\b"
    return col.rlike(pat)


#: multilingual amenity keyword table (helper.py:390-400 ``Amenties``)
AMENITIES: dict[str, list[str]] = {
    "pets_allowed": ["pet", "haustiere"],
    "furnished": ["furnish", "möbliertes"],
    "parking": ["parking", "garage", "parcheggio", "stellplatz"],
    "elevator": ["elevator", "aufzug", "ascenseur", "lift", "aufzüg", "fahrstuhl"],
    "balcony": ["balcon", "balkon"],
    "terrace": ["terrace", "terrazz", "terras", "terrass"],
    "swimming_pool": ["pool", "piscine", "schwimmbad"],
    "washing_machine": [" washer", "laundry", "washing_machine", "waschmaschine", "laveuse", "wasch"],
    "dishwasher": ["dishwasher", "geschirrspüler", "lave-vaiselle", "lave vaiselle"],
}


def amenity_flags(text: Column) -> dict[str, Column]:
    """9 boolean columns from substring search over lowercased text
    (helper.py:402-434: True when any keyword occurs, else NULL)."""
    low = F.lower(text)
    out = {}
    for name, words in AMENITIES.items():
        hit = None
        for w in words:
            c = low.contains(w.lower())
            hit = c if hit is None else (hit | c)
        out[name] = F.when(hit, F.lit(True)).otherwise(F.lit(None).cast("boolean"))
    return out


def description_cleaner(col: Column) -> Column:
    """Strip tags, lowercase, remove contact tails / emails / phones /
    URLs, collapse whitespace (helper.py:437-451, same regex order)."""
    d = strip_tags(col)
    d = F.lower(d)
    d = F.regexp_replace(d, r"mail.+|call.+|contact.+|kontakt.+|ansprec.+|apply.+|\d+.\d+.\d+.\d+", "")
    d = F.regexp_replace(d, r"[A-Za-z0-9]*@[A-Za-z]*\.?[A-Za-z0-9]*", "")
    d = F.regexp_replace(d, r"^https?://.*[\r\n]*", "")
    d = F.regexp_replace(d, r"[0-9]+\-[0-9]+\-[0-9]+", "")
    d = F.regexp_replace(d, r"[0-9]+\.[0-9]+\.[0-9]+", "")
    d = F.regexp_replace(d, r"\([0-9]+\) [0-9]+\-[0-9]+", "")
    d = F.regexp_replace(d, r"[0-9]+\/+\ [0-9]+\ [0-9]+\ [0-9]+", "")
    d = F.regexp_replace(d, r"www\.[a-z]*-?[a-z]+\.[a-z]{2,}", "")
    return remove_white_spaces(d)


# ---------------------------------------------------------------------------
# lookups
# ---------------------------------------------------------------------------

#: multilingual property-type labels -> canonical type (helper.py:273-304)
PROPERTY_TYPE_MAP: dict[str, str] = {
    "apartment": "apartment", "appartement": "apartment", "appartamento": "apartment",
    "wohnung": "apartment", "flat": "apartment", "etagenwohnung": "apartment",
    "piso": "apartment", "daire": "apartment", "lejlighed": "apartment",
    "studio": "studio", "studios": "studio", "monolocale": "studio",
    "house": "house", "maison": "house", "huis": "house", "haus": "house",
    "villa": "house", "casa": "house", "bungalow": "house", "cottage": "house",
    "detached": "house", "semi-detached": "house", "terraced": "house",
    "townhouse": "house", "duplex": "house", "ev": "house",
    "room": "room", "chambre": "room", "zimmer": "room", "kamer": "room",
    "student": "student_apartment", "studentenwohnung": "student_apartment",
}


def property_type_lookup(col: Column) -> Column:
    """Label -> canonical {apartment,house,room,studio,...} via a literal
    map (broadcast-equivalent: the map is a constant expression)."""
    m = F.create_map(*[F.lit(x) for kv in PROPERTY_TYPE_MAP.items() for x in kv])
    return m[F.lower(remove_white_spaces(col))]


def rent_sanity_filter(rent: Column) -> Column:
    """The *intended* semantics of the template guard
    ``if int(rent) <= 0 and int(rent) > 40000: return``
    (templates/spiders/basic.tmpl:46-47) — the reference's ``and`` makes
    the predicate unsatisfiable; we implement the intended OR-exclusion
    as a keep-predicate, documented divergence (SURVEY.md §2.3)."""
    r = rent.try_cast("double")
    return r.isNotNull() & (r > 0) & (r <= 40000)


def extract_coordinates(col: Column) -> tuple[Column, Column]:
    """First two signed decimals in a script blob -> (lat, long) strings
    (helper.py:106-122,361-363; stored as strings per items.py:31-32)."""
    arr = F.regexp_extract_all(col, F.lit(r"(-?\d+\.\d+)"), 1)
    return F.try_element_at(arr, F.lit(1)), F.try_element_at(arr, F.lit(2))
