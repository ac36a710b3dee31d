"""robots.txt parsing: raw fetched bodies -> the politeness rules dim.

The reference fleet disables robots handling (``ROBOTSTXT_OBEY=False``,
``python_spiders/settings.py:21``), but Scrapy itself ships a parser
(protego) and any production crawler needs one; this module supplies
the missing front half of the chain whose back half already exists
(``operators/politeness.robots_filter`` consumes per-host disallow
prefixes). Semantics are the RFC 9309 subset that prefix matching can
express:

* ``field: value`` lines, case-insensitive field names, ``#`` comments
  stripped, blank-line tolerant;
* consecutive ``User-agent`` lines open a group; rules that follow
  belong to every agent named;
* group selection: all groups naming the agent exactly
  (case-insensitive product token) if any exist, else all ``*`` groups
  — matching groups MERGE (RFC 9309 §2.2.1);
* ``Disallow`` / ``Allow`` values collected as path prefixes; an empty
  ``Disallow:`` means allow-all and adds no rule;
* ``Crawl-delay`` (non-standard, widely honored) parsed as seconds;
  smallest value wins if repeated;
* wildcard DISALLOW rules are CONSERVATIVELY truncated to the literal
  prefix before the first ``*`` (and a trailing ``$`` is dropped): a
  disallow that blocks a superset of the RFC wildcard meaning errs
  polite. Wildcard ALLOW rules are DROPPED (truncation would broaden
  the allow — the impolite direction). Documented approximation —
  full wildcards need per-rule regexes, which would push the hot
  check out of the JVM.

Decision semantics (:func:`robots_check`): longest matching prefix
wins; on a tie allow wins; no match = allowed (RFC 9309 §2.2.2). The
check is pure JVM array HOFs over a broadcast dim — no Python in the
per-URL path; only the per-HOST parse (a dim-building step, one text
per host) crosses into Python, Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean_rule(value: str, kind: str) -> str | None:
    """Normalize one Allow/Disallow value to a literal prefix.
    None = no rule.

    Wildcard handling is direction-aware so the approximation always
    errs POLITE (round-4 fix): truncating ``Disallow: /a*/b`` to
    ``/a`` blocks a superset — conservative. Truncating an ALLOW the
    same way would *broaden* the allow (``Allow: /private/x*/y`` ->
    ``/private/x`` would un-block URLs the robots.txt disallows), so
    wildcarded Allow rules are DROPPED instead: fewer allows can only
    make the decision stricter, never looser."""
    if not value:
        return None
    if value.endswith("$"):
        value = value[:-1]
    star = value.find("*")
    if star >= 0:
        if kind == "allow":
            return None
        value = value[:star]
    return value or None


def parse_robots(text: str | None, agent: str = "*") -> dict:
    """Parse one robots.txt body for ``agent``.

    Returns ``{"disallow": [...], "allow": [...], "crawl_delay": float
    | None}``. Missing/empty text = everything allowed (the treat-404-
    as-allow-all convention crawlers use).
    """
    agent = agent.lower()
    groups: list[dict] = []  # {"agents": [..], "disallow": [..], ...}
    current: dict | None = None
    last_was_agent = False
    for raw_line in (text or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent or current is None:
                current = {
                    "agents": [],
                    "disallow": [],
                    "allow": [],
                    "crawl_delay": None,
                }
                groups.append(current)
            current["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if current is None:
            continue  # rules before any User-agent line are ignored
        if field in ("disallow", "allow"):
            rule = _clean_rule(value, field)
            if rule is not None:
                current[field].append(rule)
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                continue
            if current["crawl_delay"] is None or delay < current["crawl_delay"]:
                current["crawl_delay"] = delay

    exact = [g for g in groups if agent in g["agents"]]
    chosen = exact or [g for g in groups if "*" in g["agents"]]
    out = {"disallow": [], "allow": [], "crawl_delay": None}
    for g in chosen:
        out["disallow"].extend(g["disallow"])
        out["allow"].extend(g["allow"])
        if g["crawl_delay"] is not None and (
            out["crawl_delay"] is None or g["crawl_delay"] < out["crawl_delay"]
        ):
            out["crawl_delay"] = g["crawl_delay"]
    return out


def parse_robots_texts(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> (host, robots_disallow, robots_allow,
    crawl_delay_s) via mapInPandas — one Arrow crossing over the HOST
    dim (not the URL stream), so Python cost is per host fetched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_robots(t, agent) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "host": pdf[host_col],
                    "robots_disallow": [p["disallow"] for p in parsed],
                    "robots_allow": [p["allow"] for p in parsed],
                    "crawl_delay_s": [p["crawl_delay"] for p in parsed],
                }
            )

    return robots.mapInPandas(
        run,
        "host string, robots_disallow array<string>, "
        "robots_allow array<string>, crawl_delay_s double",
    )


def merge_into_policy(host_policy: DataFrame, parsed: DataFrame) -> DataFrame:
    """Overlay parsed robots rules onto an existing HOST_POLICY dim:
    hosts with a parsed robots.txt get its disallow list, and its
    Crawl-delay (when present) REPLACES the static delay — the
    politeness scheduler then honors the host's own declared budget.
    Hosts without robots keep their configured policy. Left join on the
    tiny host dim; column set stays exactly HOST_POLICY."""
    p = parsed.select(
        "host",
        F.col("robots_disallow").alias("_rd"),
        F.col("crawl_delay_s").alias("_cd"),
    )
    out = host_policy.join(p, "host", "left")
    return out.select(
        *[
            c
            for c in host_policy.columns
            if c not in ("robots_disallow", "crawl_delay_s")
        ],
        F.coalesce(F.col("_rd"), F.col("robots_disallow")).alias("robots_disallow"),
        F.coalesce(F.col("_cd"), F.col("crawl_delay_s")).alias("crawl_delay_s"),
    ).select(*host_policy.columns)


def robots_check(
    urls: DataFrame,
    parsed: DataFrame,
    url_col: str = "canonical_url",
) -> DataFrame:
    """Full RFC 9309 decision over a URL stream: adds ``robots_allowed``
    (longest matching prefix wins, allow wins ties, no-match = allowed).

    The rules dim broadcasts; the per-URL work is two array HOFs
    (filter + max of matched-prefix lengths) — whole-stage JVM, no
    Python, no shuffle beyond the broadcast."""
    # RFC 9309 treats a URL with no path component (http://host) as
    # requesting '/' — coalesce the empty extract so 'Disallow: /'
    # matches the root URL (round-4 fix).
    raw_path = F.regexp_extract(F.col(url_col), r"^[a-z0-9+.-]+://[^/]*(/.*)$", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    rules = parsed.select(
        F.col("host").alias("_rhost"), "robots_disallow", "robots_allow"
    )
    joined = urls.join(
        F.broadcast(rules), urls["host"] == F.col("_rhost"), "left"
    ).drop("_rhost")

    def longest(col: str) -> F.Column:
        matched = F.filter(
            F.coalesce(F.col(col), F.array().cast("array<string>")),
            lambda p: path.startswith(p),
        )
        return F.coalesce(
            F.array_max(F.transform(matched, F.length)), F.lit(-1)
        )

    allowed = longest("robots_allow") >= longest("robots_disallow")
    return joined.withColumn("robots_allowed", allowed).drop(
        "robots_disallow", "robots_allow"
    )


#: RFC 9309 §2.3 "Sitemap" non-group line (also the sitemaps.org
#: robots.txt extension): case-insensitive key, value is an absolute
#: URL, valid ANYWHERE in the file regardless of user-agent groups
_SITEMAP_LINE_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"


def sitemap_urls_from_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, pos, sitemap_url) — the discovery
    hook that closes the loop robots.txt -> sitemap -> pages: a crawler
    that fetched a host's robots.txt learns its sitemap URLs without
    guessing /sitemap.xml. Pure JVM regex over the HOST dim (the same
    cost class as the rule parser's input); group membership is
    irrelevant per RFC 9309, so no group parsing is needed."""
    return robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(_SITEMAP_LINE_RE), 1)
        ).alias("pos", "sitemap_url"),
    )
