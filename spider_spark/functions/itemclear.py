"""Config-driven extraction/clean spec engine — the ItemClear analog.

The reference's closest thing to a DSL is ``ItemClear``
(``python_spiders/helper.py:533-653``): a declarative per-field recipe
(split_list, replace_list, get_num with word2number, true/false word
mapping, sq_ft conversion, per_week rent scaling) applied between raw
xpath extraction and the loader. 389 spiders drive their whole
``populate_item`` through it.

Here each recipe compiles to ONE column expression (JVM-side, no UDF),
so a spiders-dimension table of specs turns per-site extraction into a
plain projection — the fleet's 3,788 per-site spider files become
config rows (SURVEY.md §1.1 "Spider" row).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import normalize as N

#: small word->number table (helper.py get_num supports word2number)
WORD_NUMBERS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12,
    "ein": 1, "zwei": 2, "drei": 3, "vier": 4, "fünf": 5, "sechs": 6,
    "un": 1, "deux": 2, "trois": 3, "quatre": 4, "cinq": 5,
}


@dataclass
class FieldSpec:
    """One output field's recipe (mirrors ItemClear keyword args).

    The raw value comes either from ``source`` (a column holding the
    already-extracted string) or, like the reference's ItemClear
    ``input_value`` xpath (helper.py:533-556), directly from an HTML
    column via ``css``/``xpath`` (operators/selectors.py subset):
    ``multi=False`` takes the first match (input_type 'F'),
    ``multi=True`` keeps the whole list (input_type 'M' — images).
    """

    name: str
    source: str = ""  # input column with the raw extracted string
    css: str | None = None  # selector over the html column instead
    xpath: str | None = None
    html_source: str = "html"
    regex: str | None = None  # .re()/.re_first() over the extraction (parsel)
    multi: bool = False
    replaces: list[tuple[str, str]] = field(default_factory=list)  # replace_list
    split: tuple[str, int] | None = None  # split_list: (separator, index, 1-based; negative from end)
    lower: bool = False
    strip_html: bool = False
    get_num: bool = False  # -> double via extract_number_only
    word_num: bool = False  # word2number before get_num
    true_words: list[str] = field(default_factory=list)  # -> boolean
    false_words: list[str] = field(default_factory=list)
    sq_ft: bool = False  # ft^2 -> m^2 (helper.py:646-648 ItemClear constant)
    per_week: bool = False  # weekly rent -> monthly (helper.py:649-651)
    thousand_separator: str = "."
    scale_separator: str = ","


def compile_field(spec: FieldSpec) -> Column:
    """Compile one FieldSpec to a single column expression."""
    if not spec.source and not spec.css and not spec.xpath:
        raise ValueError(
            f"FieldSpec {spec.name!r} requires source, css, or xpath"
        )
    if spec.css or spec.xpath:
        from ..operators.selectors import css_extract, re_over, xpath_extract

        arr = (
            css_extract(F.col(spec.html_source), spec.css)
            if spec.css
            else xpath_extract(F.col(spec.html_source), spec.xpath)
        )
        if spec.regex:  # `.css(sel).re(pattern)` composition (116 spiders)
            arr = re_over(arr, spec.regex)
        if spec.multi:
            return arr.alias(spec.name)
        col = F.try_element_at(arr, F.lit(1))
    else:
        col = F.col(spec.source)
        if spec.regex:
            from ..operators.selectors import re_over

            col = F.try_element_at(re_over(F.array(col), spec.regex), F.lit(1))
    if spec.strip_html:
        col = N.strip_tags(col)
    for a, b in spec.replaces:
        col = F.replace(col, F.lit(a), F.lit(b))
    if spec.split is not None:
        sep, idx = spec.split
        # element_at is 1-based, negative = from end — same contract as
        # Python list indexing used by the reference's split_list
        col = F.try_element_at(F.split(col, _regex_escape(sep)), F.lit(idx))
    if spec.lower:
        col = F.lower(col)
    col = N.remove_white_spaces(col)

    if spec.true_words or spec.false_words:
        t = N.string_found(spec.true_words, col) if spec.true_words else F.lit(False)
        f = N.string_found(spec.false_words, col) if spec.false_words else F.lit(False)
        return (
            F.when(f, F.lit(False))
            .when(t, F.lit(True))
            .otherwise(F.lit(None).cast("boolean"))
            .alias(spec.name)
        )

    if spec.word_num:
        m = F.create_map(
            *[F.lit(x) for kv in WORD_NUMBERS.items() for x in (kv[0], str(kv[1]))]
        )
        col = F.coalesce(m[F.lower(col)], col)
    if spec.get_num:
        num = N.convert_string_to_numeric(
            col, spec.thousand_separator, spec.scale_separator
        )
        if spec.sq_ft:
            # ItemClear variant: feet^2 * 0.09290304 (helper.py:646-648;
            # note the helper-function variant divides by 10.764 instead)
            num = F.round(num * F.lit(0.09290304), 0).cast("long")
        if spec.per_week:
            num = N.weekly_to_monthly_rent(num)
        return num.alias(spec.name)

    return col.alias(spec.name)


def _regex_escape(sep: str) -> str:
    import re

    return re.escape(sep)


def apply_specs(df: DataFrame, specs: list[FieldSpec], keep: list[str] | None = None) -> DataFrame:
    """Project a raw-extraction DataFrame through a list of FieldSpecs —
    the per-site ``populate_item`` as one Catalyst projection."""
    keep_cols = [F.col(c) for c in (keep or [])]
    return df.select(*keep_cols, *[compile_field(s) for s in specs])
