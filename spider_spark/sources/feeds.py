"""RSS/Atom feed seed-expansion source (SURVEY.md §2.1 family).

The reference fleet crawls listing indexes; a web-scale frontier also
ingests syndication feeds — the cheapest fresh-URL discovery channel a
recrawl scheduler has (RSS 2.0 ``<item><link>`` / Atom ``<entry><link
href>``, both public formats). Mirrors ``sources/sitemap.py``: seeds
whose URL names a feed join a ``feeds(url, xml)`` table, every entry
link becomes a seed row inheriting the parent's source/meta/priority,
and ``<pubDate>``/``<updated>`` ride along so the change-rate recrawl
estimator (operators/revisit.py) can seed its interval from the feed's
own cadence instead of waiting for two fetch observations.

Feed XML is machine-generated, so extraction is JVM
``regexp_extract_all`` with lazy ``(?s)`` item-scoped patterns — no
XML parser, no Python in the path. Feeds don't nest (unlike sitemap
indexes), so expansion is a single join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: a seed URL that names a syndication feed (WordPress /feed/, .rss,
#: .atom, feed.xml conventions), optionally with query/fragment
FEED_URL_RE = r"(\.rss|\.atom|/feed/?|/rss/?)([?#].*)?$"

#: one capture per <item>: RSS 2.0 puts the canonical entry URL in a
#: text-content <link>; the lazy (?s) scope keeps each match inside one
#: item even across newlines
_RSS_LINK_RE = r"(?s)<item>.*?<link>\s*([^<]+?)\s*</link>"
#: Atom entries carry the URL as <link href="..."/>
_ATOM_LINK_RE = r'(?s)<entry>.*?<link[^>]*href="([^"]+)"'


def extract_rss_links(xml: Column) -> Column:
    """Entry URLs of an RSS 2.0 document, in document order."""
    return F.regexp_extract_all(xml, F.lit(_RSS_LINK_RE), 1)


def extract_atom_links(xml: Column) -> Column:
    """Entry URLs of an Atom document, in document order."""
    return F.regexp_extract_all(xml, F.lit(_ATOM_LINK_RE), 1)


def extract_feed_links(xml: Column) -> Column:
    """Entry URLs of either feed dialect (a document is one or the
    other; concatenating the two extractions costs nothing on the
    non-matching dialect)."""
    return F.concat(extract_rss_links(xml), extract_atom_links(xml))


#: per-entry block patterns for the date-pairing path: slicing the
#: document into entry bodies FIRST means a missing date can never
#: steal the next entry's (the lazy one-step patterns above would)
_RSS_ITEM_RE = r"(?s)<item>(.*?)</item>"
_ATOM_ENTRY_RE = r"(?s)<entry>(.*?)</entry>"
_LINK_IN_ITEM_RE = r"<link>\s*([^<]+?)\s*</link>"
_PUB_IN_ITEM_RE = r"<pubDate>\s*([^<]+?)\s*</pubDate>"
_HREF_IN_ENTRY_RE = r'<link[^>]*href="([^"]+)"'
_UPD_IN_ENTRY_RE = r"<updated>\s*([^<]+?)\s*</updated>"


def feed_entries(feeds: DataFrame, url_col: str = "url", xml_col: str = "xml") -> DataFrame:
    """``feeds(url, xml)`` -> one row per entry: (feed_url, pos, link,
    published). ``published`` is the raw <pubDate>/<updated> payload
    (RFC 822 / RFC 3339 text — parsing is the caller's locale concern);
    NULL when the entry omits it. Two-step extraction — entry bodies
    first, then link/date WITHIN each body via a JVM HOF — so a
    dateless entry pairs (link, NULL) instead of borrowing its
    neighbor's date; entries with no link (malformed) are dropped."""

    def entry_structs(body_re: str, link_re: str, date_re: str):
        bodies = F.regexp_extract_all(F.col(xml_col), F.lit(body_re), 1)
        return F.filter(
            F.transform(
                bodies,
                lambda b: F.struct(
                    F.regexp_extract(b, link_re, 1).alias("link"),
                    F.nullif(F.regexp_extract(b, date_re, 1), F.lit("")).alias(
                        "published"
                    ),
                ),
            ),
            lambda s: s["link"] != "",
        )

    rss = entry_structs(_RSS_ITEM_RE, _LINK_IN_ITEM_RE, _PUB_IN_ITEM_RE)
    atom = entry_structs(_ATOM_ENTRY_RE, _HREF_IN_ENTRY_RE, _UPD_IN_ENTRY_RE)
    return feeds.select(
        F.col(url_col).alias("feed_url"),
        F.posexplode(F.concat(rss, atom)).alias("pos", "e"),
    ).select(
        "feed_url",
        "pos",
        F.col("e.link").alias("link"),
        F.col("e.published").alias("published"),
    )


def expand_feed_seeds(seeds: DataFrame, feeds: DataFrame) -> DataFrame:
    """Expand feed seeds against a ``feeds(url, xml)`` table.

    Returns a seeds-shaped DataFrame: non-feed seeds unchanged plus one
    seed per entry link found. Feed URLs with no table row are dropped
    (the 404'd-feed analog, same convention as sitemap expansion)."""
    maps = feeds.select(
        F.col("url").alias("_feed_url"), extract_feed_links(F.col("xml")).alias("_locs")
    )
    is_feed = F.col("url").rlike(FEED_URL_RE)
    expanded = (
        seeds.filter(is_feed)
        .join(maps, F.col("url") == F.col("_feed_url"), "inner")
        .select(
            F.explode("_locs").alias("url"),
            "source",
            "meta",
            "priority",
        )
    )
    return seeds.filter(~is_feed).unionByName(expanded)
