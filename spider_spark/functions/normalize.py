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


#: extract_date month tables, in the reference's exact iteration order
#: (helper.py:206-241 — dict insertion order matters: 'januar' is checked
#: before the numeric-extraction fallback, everything else after it; note
#: the reference's english list really has 'jun', not 'june').
GERMAN_MONTHS: list[tuple[str, str]] = [
    ("januar", "01"), ("februar", "02"), ("märz", "03"), ("april", "04"),
    ("mai", "05"), ("juni", "06"), ("juli", "07"), ("august", "08"),
    ("september", "09"), ("oktober", "10"), ("november", "11"), ("dezember", "12"),
]
ENGLISH_MONTHS: list[tuple[str, str]] = [
    ("january", "01"), ("february", "02"), ("march", "03"), ("april", "04"),
    ("may", "05"), ("jun", "06"), ("july", "07"), ("august", "08"),
    ("september", "09"), ("october", "10"), ("november", "11"), ("december", "12"),
]

#: the regex the reference runs over the normalized string (helper.py:252,260)
DATE_EXTRACT_RE = r"(\d+\.*\d+\.\d*)"


def _extract_date_result(s: Column, date_separator: str) -> Column:
    """Shared tail of both extract_date branches (helper.py:250-266):
    first regex match -> separator to '/' -> 2 slashes = d/m/yyyy via
    format_date (passthrough on failure), 1 slash = m/yyyy -> 'yyyy-MM'.

    Shape guards (4-digit year) keep the lenient Spark/DuckDB parsers
    from accepting strings CPython's strptime rejects (e.g. '1/2/3'
    parses to year 3 in both engines but raises in Python). Where the
    reference RAISES (strptime failure on the m/yyyy path) we yield
    NULL — documented divergence, same policy as rent_sanity_filter.
    """
    ext = F.regexp_extract(s, DATE_EXTRACT_RE, 1)
    avail = F.replace(ext, F.lit(date_separator), F.lit("/"))
    n_sep = F.length(avail) - F.length(F.replace(avail, F.lit("/"), F.lit("")))
    full_shape = avail.rlike(r"^\d{1,2}/\d{1,2}/\d{4}$")
    full = F.when(
        full_shape,
        F.coalesce(F.date_format(F.try_to_date(avail, "d/M/yyyy"), "yyyy-MM-dd"), avail),
    ).otherwise(avail)  # format_date passes through on failure (helper.py:181-183)
    ym_shape = avail.rlike(r"^\d{1,2}/\d{4}$")
    ym = F.when(
        ym_shape, F.date_format(F.try_to_date(avail, "M/yyyy"), "yyyy-MM")
    ).otherwise(F.lit(None).cast("string"))
    return (
        F.when(ext == "", F.lit(None).cast("string"))
        .when(n_sep == 2, full)
        .when(n_sep == 1, ym)
        .otherwise(F.lit(None).cast("string"))
    )


def extract_date(col: Column, date_separator: str = ".") -> Column:
    """German/English month-name date extraction (helper.py:206-266).

    Faithful to the reference's (quirky) control flow: the input is
    lowercased, spaces removed, '/' mapped to '.'; then months are
    scanned in dict order — a contained month name is replaced by
    'MM.' and the date regex runs on the substituted string, BUT the
    very first non-contained month triggers the raw-string extraction,
    so in effect: 'januar' substitution wins over everything, then raw
    numeric extraction, then the first contained month in dict order.
    Verified against the reference implementation on golden vectors
    (tests/test_normalize.py).

    Plan shape: a naive 26-branch when-chain inlines the input ~200
    times and blows the 64 KB codegen method limit (measured: 12x
    slower, interpreted fallback). Instead the first-contained month is
    selected with ONE higher-order ``filter`` over the literal month
    array, the substitution is ONE dynamic ``replace``, and the parse
    tail is evaluated once — stays inside whole-stage codegen.
    """
    months = GERMAN_MONTHS + ENGLISH_MONTHS
    d = F.replace(F.replace(F.lower(col), F.lit(" "), F.lit("")), F.lit("/"), F.lit("."))
    raw_ext = F.regexp_extract(d, DATE_EXTRACT_RE, 1)
    chosen = F.try_element_at(
        F.filter(F.array(*[F.lit(m) for m, _ in months]), lambda m: F.contains(d, m)),
        F.lit(1),
    )
    # dict() dedups the month names shared by both languages (april,
    # august, ... — same numbers) — create_map rejects duplicate keys
    num = F.create_map(*[F.lit(x) for kv in dict(months).items() for x in kv])[chosen]
    subst = F.replace(d, chosen, F.concat(num, F.lit(".")))
    s = (
        F.when(chosen == months[0][0], subst)
        .when(raw_ext != "", d)
        .when(chosen.isNotNull(), subst)
        .otherwise(F.lit(None).cast("string"))
    )
    return _extract_date_result(s, date_separator)


#: month-name -> month number across the dateparser languages the
#: reference requests (helper.py:597-598: languages=['en','es','fr','nl','tr']).
#: Full names in all five languages plus common ascii fallbacks and
#: English 3-letter abbreviations — the documented subset of dateparser's
#: fuzzy matching that the spider fleet actually exercises.
MULTILOCALE_MONTHS: dict[str, int] = {
    # en
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "jul": 7, "aug": 8, "sep": 9,
    "oct": 10, "nov": 11, "dec": 12,
    # es
    "enero": 1, "febrero": 2, "marzo": 3, "abril": 4, "mayo": 5, "junio": 6,
    "julio": 7, "agosto": 8, "septiembre": 9, "octubre": 10, "noviembre": 11,
    "diciembre": 12,
    # fr
    "janvier": 1, "février": 2, "fevrier": 2, "mars": 3, "avril": 4, "mai": 5,
    "juin": 6, "juillet": 7, "août": 8, "aout": 8, "septembre": 9,
    "octobre": 10, "novembre": 11, "décembre": 12, "decembre": 12,
    # nl
    "januari": 1, "februari": 2, "maart": 3, "mei": 5, "juni": 6, "juli": 7,
    "augustus": 8, "oktober": 10,
    # tr
    "ocak": 1, "şubat": 2, "subat": 2, "mart": 3, "nisan": 4, "mayıs": 5,
    "mayis": 5, "haziran": 6, "temmuz": 7, "ağustos": 8, "agustos": 8,
    "eylül": 9, "eylul": 9, "ekim": 10, "kasım": 11, "kasim": 11,
    "aralık": 12, "aralik": 12,
    # it (round 4: 693 *_it JSON-source spiders parse Italian dates via
    # dateparser auto-detection — helper.py available_date path)
    "gennaio": 1, "febbraio": 2, "aprile": 4, "maggio": 5, "giugno": 6,
    "luglio": 7, "settembre": 9, "ottobre": 10, "dicembre": 12,
    # de (extract_date covers numeric DE; these cover spelled months)
    "januar": 1, "februar": 2, "märz": 3, "maerz": 3, "dezember": 12,
    # pt
    "janeiro": 1, "fevereiro": 2, "março": 3, "marco": 3, "maio": 5,
    "junho": 6, "julho": 7, "setembro": 9, "outubro": 10, "novembro": 11,
    "dezembro": 12,
    # pl (round 5: easyrenting_pl cohort — nominative + the genitive
    # forms real Polish dates use, '15 stycznia 2021', plus ascii
    # fallbacks for the diacritic months)
    "styczeń": 1, "styczen": 1, "stycznia": 1, "luty": 2, "lutego": 2,
    "marzec": 3, "marca": 3, "kwiecień": 4, "kwiecien": 4, "kwietnia": 4,
    "maj": 5, "maja": 5, "czerwiec": 6, "czerwca": 6, "lipiec": 7,
    "lipca": 7, "sierpień": 8, "sierpien": 8, "sierpnia": 8,
    "wrzesień": 9, "wrzesien": 9, "września": 9, "wrzesnia": 9,
    "październik": 10, "pazdziernik": 10, "października": 10,
    "pazdziernika": 10, "listopad": 11, "listopada": 11, "grudzień": 12,
    "grudzien": 12, "grudnia": 12,
    # da (round 5) — distinctive forms only; januar/februar/april/juni/
    # juli/august/september/oktober/november shared with de/nl/en above
    "marts": 3,
    # sv (round 5) — januari/februari shared with nl, mars with fr,
    # maj with pl/da; distinctive: augusti
    "augusti": 8,
    # ro (round 5)
    "ianuarie": 1, "februarie": 2, "martie": 3, "aprilie": 4,
    "iunie": 6, "iulie": 7, "septembrie": 9, "octombrie": 10,
    "noiembrie": 11, "decembrie": 12,
    # shared across the added locales and already present with the same
    # month value: marzo(es/it 3), agosto(es/it/pt 8), abril(es/pt 4),
    # novembre(fr/it 11), mai(fr/de/ro 5), juni/juli(nl/de/da/sv),
    # april/august/september/november(en/de/da/sv), oktober(nl/de/da/sv),
    # december(en/da/sv 12), maj(pl/da/sv 5)
}

_ML_NUMERIC_RE = r"^(\d{1,2})[./-](\d{1,2})[./-](\d{4})$"
_ML_DMY_RE = r"^(\d{1,2})(?:st|nd|rd|th)?\.?\s+([^\s\d.,]+)\.?,?\s+(\d{4})$"
_ML_MDY_RE = r"^([^\s\d.,]+)\.?\s+(\d{1,2})(?:st|nd|rd|th)?\s*,?\s*(\d{4})$"


def _ml_month_map() -> Column:
    return F.create_map(
        *[F.lit(x) for kv in MULTILOCALE_MONTHS.items() for x in (kv[0], str(kv[1]))]
    )


def multilocale_available_date(col: Column, today: str) -> Column:
    """dateparser-analog multi-locale date parse with the future-shift
    rule (helper.py:593-605, the ItemClear available_date path used by
    1,305 spiders):

    * accepts d/m/Y numeric (the date_formats=['%d/%m/%Y'] hint, with
      ./- separators), 'd monthname Y' and 'monthname d, Y' where the
      month name is en/es/fr/nl/tr (MULTILOCALE_MONTHS);
    * ``today`` is INJECTED (ISO string) for determinism — the
      reference compares against midnight-today;
    * future shift: parsed < today  =>  year := year(today) + 1
      (the reference replaces with today.year+1, NOT parsed.year+1);
    * output '%Y-%m-%d'; NULL when unparseable. Feb-29 collisions on
      the shifted year yield NULL where CPython's .replace() raises —
      documented divergence.
    """
    s = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    m = _ml_month_map()

    def try_date(y: Column, mo: Column, d: Column) -> Column:
        return F.try_to_date(
            F.concat_ws("-", y, F.lpad(mo, 2, "0"), F.lpad(d, 2, "0")), "yyyy-MM-dd"
        )

    num = F.when(
        F.regexp_extract(s, _ML_NUMERIC_RE, 3) != "",
        try_date(
            F.regexp_extract(s, _ML_NUMERIC_RE, 3),
            F.regexp_extract(s, _ML_NUMERIC_RE, 2),
            F.regexp_extract(s, _ML_NUMERIC_RE, 1),
        ),
    )
    dmy = F.when(
        F.regexp_extract(s, _ML_DMY_RE, 3) != "",
        try_date(
            F.regexp_extract(s, _ML_DMY_RE, 3),
            m[F.regexp_extract(s, _ML_DMY_RE, 2)],
            F.regexp_extract(s, _ML_DMY_RE, 1),
        ),
    )
    mdy = F.when(
        F.regexp_extract(s, _ML_MDY_RE, 3) != "",
        try_date(
            F.regexp_extract(s, _ML_MDY_RE, 3),
            m[F.regexp_extract(s, _ML_MDY_RE, 1)],
            F.regexp_extract(s, _ML_MDY_RE, 2),
        ),
    )
    parsed = F.coalesce(num, dmy, mdy)
    today_d = F.to_date(F.lit(today))
    shifted = F.when(
        parsed < today_d,
        F.try_to_date(
            F.concat_ws(
                "-",
                (F.year(today_d) + 1).cast("string"),
                F.lpad(F.month(parsed).cast("string"), 2, "0"),
                F.lpad(F.dayofmonth(parsed).cast("string"), 2, "0"),
            ),
            "yyyy-MM-dd",
        ),
    ).otherwise(parsed)
    return F.date_format(shifted, "yyyy-MM-dd")


def extract_rent_currency(
    col: Column,
    external_source: Column,
    thousand_separator: str = ".",
    scale_separator: str = ",",
) -> tuple[Column, Column]:
    """(rent, currency) from a raw rent string (helper.py:309-323):
    rent = convert_to_numeric(extract_number_only(s, seps)) — always a
    number because extract_number_only yields '0' on no-digits; currency
    from currency_parser over the SAME raw string."""
    rent = convert_to_numeric(extract_number_only(col, thousand_separator, scale_separator))
    return rent, currency_parser(col, external_source)


def rent_string_pipeline_rent(
    col: Column,
    thousand_separator: str = ".",
    scale_separator: str = ",",
) -> Column:
    """The rent value the framework pipeline actually stores for a
    ``rent_string`` item (pipelines.py:153-159): it re-runs
    ``convert_string_to_numeric`` over the ALREADY-PARSED number, whose
    ``str()`` form loses the separator context — a fractional rent like
    1200.5 restringifies to '1200.5', the '.' is then stripped as a
    thousand separator, and the stored value becomes 12005. Faithful
    reproduction (the quirk only fires when thousand_separator='.'):
    integral values round-trip via their integer string form
    (convert_to_numeric returns int when integral, helper.py:346-352).
    """
    first, _cur = extract_rent_currency(col, F.lit(""), thousand_separator, scale_separator)
    str_repr = F.when(
        first == F.floor(first), first.cast("long").cast("string")
    ).otherwise(first.cast("string"))
    return convert_string_to_numeric(str_repr, thousand_separator, scale_separator)


def extract_utilities(currency: str, description: Column) -> Column:
    """Six characters after the LAST occurrence of the currency symbol
    (helper.py:492-498: ``description[rindex+1 : rindex+7]``); NULL when
    the symbol is absent. For multi-char symbols the slice starts inside
    the symbol itself — reproduced faithfully."""
    suffix = F.substring_index(description, currency, -1)
    tail = F.concat(F.lit(currency[1:]), suffix) if len(currency) > 1 else suffix
    return F.when(
        description.contains(currency), F.substring(tail, 1, 6)
    ).otherwise(F.lit(None).cast("string"))


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


#: simple JS literal: identifier key + string/number value
_JS_PAIR_RE = r"""([A-Za-z_$][A-Za-z0-9_$]*)\s*:\s*('[^']*'|"[^"]*"|-?\d+(?:\.\d+)?)"""


def js_literal_pairs(col: Column) -> tuple[Column, Column]:
    """(keys, values) arrays of simple key:value literals in a script
    blob — the subset of js2xml tree extraction the spider fleet
    actually uses (lat/lng/config objects; ``acorngroup_co_uk.py:104``,
    ``agence_cei_fr.py:145``: parse JS, then xpath string/number
    properties out of the tree). String values are unquoted; nested
    structures are out of scope (none of the surveyed spiders read
    them). Pure JVM regex — zip the arrays or ``map_from_arrays`` as
    needed."""
    keys = F.regexp_extract_all(col, F.lit(_JS_PAIR_RE), 1)
    vals = F.transform(
        F.regexp_extract_all(col, F.lit(_JS_PAIR_RE), 2),
        lambda v: F.regexp_replace(v, """^['"]|['"]$""", ""),
    )
    return keys, vals


def extract_coordinates(col: Column) -> tuple[Column, Column]:
    """First two signed decimals in a script blob -> (lat, long) strings
    (helper.py:106-122,361-363; stored as strings per items.py:31-32)."""
    arr = F.regexp_extract_all(col, F.lit(r"(-?\d+\.\d+)"), 1)
    return F.try_element_at(arr, F.lit(1)), F.try_element_at(arr, F.lit(2))
