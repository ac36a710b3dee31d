"""Sitemap seed-expansion source (SURVEY.md §2.1).

The reference's ``SitemapSpider`` subclasses (``athimmo_be.py:18-26``;
10 spiders, mostly vestigial — they point ``sitemap_urls`` at a
sitemap.xml and let Scrapy expand it into requests). Here that is a
PRE-WAVE-0 relational stage: seed rows whose URL looks like a sitemap
(``*.xml``) are joined against a ``sitemaps(url, xml)`` table, each
``<loc>`` becomes a seed row inheriting the parent's source/meta/
priority, and ``<sitemapindex>`` entries (locs that are themselves
``.xml``) recurse up to ``max_depth`` joins. Non-sitemap seeds pass
through untouched, so the stage is a no-op for the 3,778 non-sitemap
spiders.

Sitemap XML is machine-generated and flat, so ``<loc>`` extraction is a
JVM ``regexp_extract_all`` — no XML parser, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: a seed URL that names a sitemap document (Scrapy's sitemap_urls
#: shape) — also matches gzip-compressed sitemaps (``sitemap.xml.gz``,
#: which Scrapy inflates; our table stores the decoded XML, and a .gz
#: URL with no table row is simply an unresolved miss) and URLs
#: carrying a query string or fragment (``sitemap.xml#frag``)
SITEMAP_URL_RE = r"\.xml(\.gz)?([?#].*)?$"
_LOC_RE = r"<loc>\s*([^<]+?)\s*</loc>"


def extract_sitemap_locs(xml: Column) -> Column:
    """All ``<loc>`` payloads of a sitemap/sitemapindex document."""
    return F.regexp_extract_all(xml, F.lit(_LOC_RE), 1)


def expand_sitemap_seeds(
    seeds: DataFrame,
    sitemaps: DataFrame,
    max_depth: int = 3,
) -> DataFrame:
    """Expand sitemap seeds against a ``sitemaps(url, xml)`` table.

    Returns a seeds-shaped DataFrame: non-sitemap seeds unchanged plus
    one seed per ``<loc>`` found, recursing through sitemap-index
    levels at most ``max_depth`` times (real sitemap trees are depth
    <= 2: index -> leaf). Sitemap URLs with no row in the table, or
    still unresolved at max_depth, are dropped — the crawl analog of a
    404'd sitemap fetch.
    """
    maps = sitemaps.select(
        F.col("url").alias("_map_url"), extract_sitemap_locs(F.col("xml")).alias("_locs")
    )
    is_map = F.col("url").rlike(SITEMAP_URL_RE)
    out = seeds.filter(~is_map)
    pending = seeds.filter(is_map)
    for _ in range(max_depth):
        expanded = (
            pending.join(maps, pending["url"] == maps["_map_url"], "inner")
            .select(
                F.explode("_locs").alias("url"),
                "source",
                "meta",
                "priority",
            )
        )
        out = out.unionByName(expanded.filter(~is_map))
        pending = expanded.filter(is_map)
    return out


#: per-entry block patterns for the freshness path (same two-step
#: convention as sources/feeds.py: slice into <url> bodies FIRST so an
#: entry missing <lastmod> can never borrow its neighbor's)
_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_LOC_IN_URL_RE = r"<loc>\s*([^<]+?)\s*</loc>"
_LASTMOD_IN_URL_RE = r"<lastmod>\s*([^<]+?)\s*</lastmod>"


def sitemap_entries(
    sitemaps: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """``sitemaps(url, xml)`` -> (sitemap_url, pos, loc, lastmod) — the
    freshness-aware discovery surface (sitemaps.org protocol, public):
    ``lastmod`` is the raw W3C-datetime payload (NULL when the entry
    omits it) that a change-rate recrawl scheduler
    (operators/revisit.py) can seed its interval estimate from, the
    same way feed pubDates do. Entries with no <loc> (malformed) drop.
    """
    bodies = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), 1)
    entries = F.filter(
        F.transform(
            bodies,
            lambda b: F.struct(
                F.regexp_extract(b, _LOC_IN_URL_RE, 1).alias("loc"),
                F.nullif(F.regexp_extract(b, _LASTMOD_IN_URL_RE, 1), F.lit("")).alias(
                    "lastmod"
                ),
            ),
        ),
        lambda s: s["loc"] != "",
    )
    return sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        F.posexplode(entries).alias("pos", "e"),
    ).select(
        "sitemap_url",
        "pos",
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
    )
