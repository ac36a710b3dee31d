"""Parse stage: fetched pages -> (new frontier candidates, span documents).

Reproduces the reference's 3-level callback chain observably
(``der_immo_tip.py``: parse extracts detail links + next page;
``populate_item`` builds the item): listing pages yield links, detail
pages yield one document of interleaved text+media spans.

Span assembly rules (documents table, BASELINE.json input_hint):

* page order preserved (the reference preserves it via ItemLoader
  accumulation order, ``loaders.py:14-47``);
* media deduped keeping FIRST occurrence — the reference dedups images
  via ``set()`` (``pipelines.py:127-131``) whose order is
  nondeterministic; keep-first is our documented deterministic choice;
* implemented with JVM higher-order array functions (``filter`` with
  index + ``exists`` over a ``slice``) — O(n_spans^2) per row with
  n_spans <= dozens, zero shuffle, zero Python.

Link emission keeps deterministic ordering: ``posexplode`` gives the
on-page link offset; the child's ordering key is
(parent discovered_seq, link offset) — SURVEY.md §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from ..functions.urls import resolve_udf


def dedup_media_spans(spans_col: F.Column) -> F.Column:
    """Drop media spans whose media_ref already appeared earlier in the array."""
    return F.filter(
        spans_col,
        lambda s, i: (s["kind"] != F.lit("media"))
        | ~F.exists(
            F.slice(spans_col, F.lit(1), i),
            lambda t: (t["kind"] == F.lit("media")) & (t["media_ref"] == s["media_ref"]),
        ),
    )


def _doc_key() -> F.Column:
    """Effective document id: a meta-carried ``doc_id`` (fragment of a
    multi-page item — the parent threaded it, ``15walmer.py:112``) wins
    over the page's own canonical-url-derived id."""
    return F.coalesce(
        F.element_at(F.coalesce(F.col("meta"), F.create_map()), "doc_id"),
        F.regexp_replace(F.col("canonical_url"), r"^[a-z0-9+.-]+://", ""),
    )


def page_etag(spans_col: str = "spans") -> F.Column:
    """Deterministic content validator (the ETag analog): sha1 of the
    RAW page spans' JSON. The synthetic fetch computes the same
    expression server-side, so ``If-None-Match == page_etag`` is the
    conditional-GET revalidation check; a span change implies a new
    etag by construction."""
    return F.sha1(F.to_json(F.struct(spans_col)))


def extract_documents(fetched_ok: DataFrame) -> DataFrame:
    """Detail pages -> documents rows (doc_id, spans, lineage cols).

    Emits one row per FETCHED PAGE; a multi-page item contributes one
    fragment row per page (same effective doc_id), merged downstream by
    :func:`merge_document_fragments`. ``has_continuation`` marks pages
    that emitted follow-up links, so the merge can cheaply isolate the
    fragment subset. ``attrs['__etag']`` stores the page's content
    validator so a later incremental recrawl can send it back as
    If-None-Match (engine.recrawl_candidates(conditional=True)).
    """
    details = fetched_ok.filter(
        (~F.col("is_listing_page")) & (F.size(F.coalesce(F.col("spans"), F.array())) > 0)
    )
    attrs = F.map_concat(
        F.map_filter(
            F.coalesce(F.col("meta"), F.create_map()),
            lambda k, _: ~k.isin("__etag", "if_none_match"),
        ),
        F.create_map(F.lit("__etag"), page_etag()),
    )
    return details.select(
        _doc_key().alias("doc_id"),
        dedup_media_spans(F.col("spans")).alias("spans"),
        F.col("source"),
        F.col("host"),
        F.col("wave"),
        F.col("discovered_seq").alias("position"),
        attrs.alias("attrs"),
        (F.size(F.coalesce(F.col("out_links"), F.array())) > 0).alias(
            "has_continuation"
        ),
    )


def renumber_spans(spans_col: F.Column) -> F.Column:
    """Re-assign offsets 0..n-1 in array order (after media dedup /
    fragment merge the original page offsets have gaps)."""
    return F.transform(
        spans_col,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def merge_document_fragments(raw: DataFrame) -> DataFrame:
    """Assemble multi-page items: fragments sharing a doc_id collapse
    into ONE document (the reference threads a partially built item
    across requests via meta — ``15walmer.py:112``; SURVEY.md §2.2).

    Scale shape: only rows flagged as fragments (meta-carried doc_id or
    ``has_continuation``) enter the groupBy — the overwhelming
    single-page majority takes a shuffle-free per-row projection.
    Fragments order by fetch ``position`` (the request's
    discovered_seq), media dedup re-runs ACROSS fragments keeping first
    occurrence, and offsets renumber 0..n-1.
    """
    is_frag = F.col("has_continuation") | F.element_at(
        F.coalesce(F.col("attrs"), F.create_map()), "doc_id"
    ).isNotNull()
    out_cols = ["doc_id", "spans", "source", "host", "wave", "position", "attrs"]

    plain = raw.filter(~F.coalesce(is_frag, F.lit(False))).select(
        "doc_id",
        renumber_spans(F.col("spans")).alias("spans"),
        "source", "host", "wave", "position", "attrs",
    )
    frags = raw.filter(F.coalesce(is_frag, F.lit(False)))
    merged = frags.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("position").alias("p"), F.col("spans").alias("s"))
                    )
                ),
                lambda fr: fr["s"],
            )
        ).alias("spans_raw"),
        F.min("position").alias("position"),
        F.min("wave").alias("wave"),
        F.min_by("source", "position").alias("source"),
        F.min_by("host", "position").alias("host"),
        F.min_by("attrs", "position").alias("attrs"),
    )
    merged = merged.select(
        "doc_id",
        renumber_spans(dedup_media_spans(F.col("spans_raw"))).alias("spans"),
        "source", "host", "wave", "position", "attrs",
    )
    return plain.select(out_cols).unionByName(merged.select(out_cols))


def extract_links_raw(fetched_ok: DataFrame) -> DataFrame:
    """Pages with out_links -> PRE-RESOLUTION child request rows
    (``base_url``/``href`` instead of an absolute ``url`` — pure JVM,
    no UDF; :func:`resolve_candidates` applies the one vectorized
    resolve pass after redirect candidates union in).

    Children inherit source/meta/priority from the parent (the
    reference threads these via ``meta=`` — ``aands_org_uk.py:30-49``).
    Children of a DETAIL page additionally carry the parent's effective
    doc_id in meta, so their spans merge back into the parent's
    document (multi-page item assembly, ``15walmer.py:112``).
    """
    listings = fetched_ok.filter(F.size(F.coalesce(F.col("out_links"), F.array())) > 0)
    # child requests never inherit the parent's conditional-GET
    # validator — If-None-Match is per-resource
    base_meta = F.map_filter(
        F.coalesce(F.col("meta"), F.create_map()),
        lambda k, _: k != F.lit("if_none_match"),
    )
    child_meta = F.when(
        F.col("is_listing_page"), base_meta
    ).otherwise(
        F.map_concat(
            F.map_filter(base_meta, lambda k, v: k != F.lit("doc_id")),
            F.create_map(F.lit("doc_id"), _doc_key()),
        )
    )
    exploded = listings.select(
        F.col("crawl_id"),
        F.col("url").alias("base_url"),
        F.col("source"),
        child_meta.alias("meta"),
        F.col("priority"),
        F.col("discovered_seq").alias("parent_seq"),
        F.posexplode(F.col("out_links")).alias("link_pos", "href"),
    )
    return exploded.select(
        "crawl_id",
        "base_url",
        "href",
        F.lit("GET").alias("method"),
        F.lit(None).cast("string").alias("body"),
        "source",
        "meta",
        "priority",
        F.lit(0).alias("attempt"),
        F.lit(False).alias("dont_filter"),
        "parent_seq",
        "link_pos",
    )


def resolve_candidates(raw: DataFrame) -> DataFrame:
    """(base_url, href) candidate rows -> absolute-URL request rows.

    The ONE Arrow/Python crossing of the link path. Link extraction and
    redirect following both emit the raw (base, href) shape and union
    BEFORE this resolve, so adding the redirect branch costs two cheap
    JVM projections over the fetched cache instead of a second
    vectorized-UDF plan node — one extra UDF node here measurably
    added seconds of per-wave overhead at bench scale (each consumer
    evaluation of the candidate plan pays every UDF node's Python
    round trip for all partitions, even when the redirect side holds
    zero rows)."""
    return raw.select(
        "crawl_id",
        resolve_udf(F.col("base_url"), F.col("href")).alias("url"),
        "method",
        "body",
        "source",
        "meta",
        "priority",
        "attempt",
        "dont_filter",
        "parent_seq",
        "link_pos",
    )


def extract_links(fetched_ok: DataFrame) -> DataFrame:
    """Resolved child request rows — :func:`extract_links_raw` +
    :func:`resolve_candidates` (kept as the single-call surface for
    tests and non-engine callers; the engine unions redirect
    candidates between the two stages)."""
    return resolve_candidates(extract_links_raw(fetched_ok))


def redirect_candidates_raw(
    fetched: DataFrame,
    max_times: int = schemas.REDIRECT_MAX_TIMES,
    priority_adjust: int = schemas.REDIRECT_PRIORITY_ADJUST,
) -> DataFrame:
    """RedirectMiddleware analog (Scrapy 2.3 defaults — implicit in all
    3,788 reference spiders; ``aryes_be.py:80`` opts out per-request
    with ``meta={'dont_redirect': True}``): 3xx responses with a
    Location become NEW frontier candidates in link shape.

    Faithful semantics:

    * 301/307/308 (and any HEAD request) keep method+body; 302/303
      downgrade to GET with no body (browser behavior, Scrapy
      ``_redirect_request_using_get``).
    * ``meta['dont_redirect']`` truthy, or a status admitted by the
      source's ``handle_httpstatus_list`` (``_parse_ok`` here),
      suppresses redirecting — the response goes to parse instead.
    * chain cap ``REDIRECT_MAX_TIMES`` (20) via ``meta['redirect_times']``;
      the hop trail accumulates in ``meta['redirect_urls']`` ('|'-joined).
    * priority rises by ``REDIRECT_PRIORITY_ADJUST`` (+2) per hop, so
      near-complete chains finish ahead of fresh discoveries.
    * ``dont_filter`` is inherited (Request.replace semantics); a
      redirect TARGET therefore still passes the RFPDupeFilter, which
      is also what kills redirect loops (a->b->a: the second 'a' is
      already seen).

    Scale shape: one filter + projection over the already-persisted
    fetched wave — no shuffle, no Python (PRE-RESOLUTION shape: the
    Location rides as ``href`` and the shared
    :func:`resolve_candidates` pass makes it absolute AFTER the union
    with extracted links, so the redirect branch adds no second UDF
    node to the wave plan). Emits ``link_pos = -1`` so redirect
    targets order deterministically BEFORE the page's extracted links
    under the (parent_seq, link_pos) sort — the engine also uses
    ``link_pos < 0`` as the redirect marker that bypasses
    LinkExtractor rules and the offsite filter per-row.
    """
    base_meta = F.coalesce(F.col("meta"), F.create_map())
    dont_redirect = ~F.lower(
        F.coalesce(F.element_at(base_meta, "dont_redirect"), F.lit(""))
    ).isin("", "0", "false")
    times = F.coalesce(
        F.element_at(base_meta, "redirect_times").cast("int"), F.lit(0)
    )
    parse_ok = (
        F.col("_parse_ok") if "_parse_ok" in fetched.columns
        else F.col("status") == 200
    )
    redirs = fetched.filter(
        F.col("status").isin(schemas.REDIRECT_HTTP_CODES)
        & F.col("location").isNotNull()
        & ~parse_ok
        & ~dont_redirect
        & (times < F.lit(max_times))
    )
    keep_method = F.col("status").isin(301, 307, 308) | (
        F.upper(F.col("method")) == "HEAD"
    )
    trail = F.element_at(base_meta, "redirect_urls")
    new_meta = F.map_concat(
        F.map_filter(
            base_meta, lambda k, _: ~k.isin("redirect_times", "redirect_urls")
        ),
        F.create_map(
            F.lit("redirect_times"), (times + 1).cast("string"),
            F.lit("redirect_urls"),
            F.when(trail.isNull(), F.col("url")).otherwise(
                F.concat(trail, F.lit("|"), F.col("url"))
            ),
        ),
    )
    return redirs.select(
        "crawl_id",
        F.col("url").alias("base_url"),
        F.col("location").alias("href"),
        F.when(keep_method, F.col("method")).otherwise(F.lit("GET")).alias("method"),
        F.when(keep_method, F.col("body")).otherwise(F.lit(None).cast("string")).alias("body"),
        "source",
        new_meta.alias("meta"),
        (F.col("priority") + F.lit(priority_adjust)).alias("priority"),
        F.lit(0).alias("attempt"),
        F.col("dont_filter"),
        F.col("discovered_seq").alias("parent_seq"),
        F.lit(-1).alias("link_pos"),
    )


def redirect_candidates(
    fetched: DataFrame,
    max_times: int = schemas.REDIRECT_MAX_TIMES,
    priority_adjust: int = schemas.REDIRECT_PRIORITY_ADJUST,
) -> DataFrame:
    """Resolved redirect candidates — :func:`redirect_candidates_raw`
    + :func:`resolve_candidates` (single-call surface for tests; the
    engine uses :func:`extract_candidates_raw`, which fuses links and
    redirects into one scan)."""
    return resolve_candidates(
        redirect_candidates_raw(fetched, max_times, priority_adjust)
    )


def extract_candidates_raw(
    fetched: DataFrame,
    max_times: int = schemas.REDIRECT_MAX_TIMES,
    priority_adjust: int = schemas.REDIRECT_PRIORITY_ADJUST,
) -> DataFrame:
    """Links AND redirect targets from ONE scan of the fetched wave —
    no union (requires a ``location`` column; use
    :func:`extract_links_raw` otherwise).

    Semantically identical to
    ``extract_links_raw(ok) ∪ redirect_candidates_raw(fetched)`` but
    structurally one linear plan: a 3xx row explodes
    ``array(location)`` where a parsed page explodes ``out_links``,
    and every redirect-specific transform (method/body downgrade, hop
    counter + trail meta, priority adjust, dont_filter inheritance,
    ``link_pos = -1``) is a per-row ``CASE``. Measured motivation
    (round 4): a union of the two branches made every AQE evaluation
    of the candidate plan materialize extra shuffle query stages —
    +10 jobs/+46 stages PER WAVE on the bench crawl, ~3.5 s/wave of
    pure scheduling overhead even with zero redirect rows. The fused
    scan restores the pre-redirect job count; redirect support now
    costs one CASE per column instead of a plan branch.
    """
    parse_ok = (
        F.col("_parse_ok") if "_parse_ok" in fetched.columns
        else F.col("status") == 200
    )
    base_meta = F.coalesce(F.col("meta"), F.create_map())
    dont_redirect = ~F.lower(
        F.coalesce(F.element_at(base_meta, "dont_redirect"), F.lit(""))
    ).isin("", "0", "false")
    times = F.coalesce(
        F.element_at(base_meta, "redirect_times").cast("int"), F.lit(0)
    )
    is_redir = (
        F.col("status").isin(schemas.REDIRECT_HTTP_CODES)
        & F.col("location").isNotNull()
        & ~parse_ok
        & ~dont_redirect
        & (times < F.lit(max_times))
    )
    has_links = parse_ok & (
        F.size(F.coalesce(F.col("out_links"), F.array())) > 0
    )
    # link-side meta: never inherit the conditional-GET validator;
    # detail pages thread the parent's doc key (multi-page assembly)
    link_meta_base = F.map_filter(
        base_meta, lambda k, _: k != F.lit("if_none_match")
    )
    child_meta = F.when(F.col("is_listing_page"), link_meta_base).otherwise(
        F.map_concat(
            F.map_filter(link_meta_base, lambda k, v: k != F.lit("doc_id")),
            F.create_map(F.lit("doc_id"), _doc_key()),
        )
    )
    # redirect-side meta: hop counter + '|'-joined trail
    trail = F.element_at(base_meta, "redirect_urls")
    redirect_meta = F.map_concat(
        F.map_filter(
            base_meta, lambda k, _: ~k.isin("redirect_times", "redirect_urls")
        ),
        F.create_map(
            F.lit("redirect_times"), (times + 1).cast("string"),
            F.lit("redirect_urls"),
            F.when(trail.isNull(), F.col("url")).otherwise(
                F.concat(trail, F.lit("|"), F.col("url"))
            ),
        ),
    )
    keep_method = F.col("status").isin(301, 307, 308) | (
        F.upper(F.col("method")) == "HEAD"
    )
    hrefs = F.when(is_redir, F.array(F.col("location"))).otherwise(
        F.col("out_links")
    )
    exploded = fetched.filter(has_links | is_redir).select(
        "crawl_id",
        F.col("url").alias("base_url"),
        "source",
        F.when(is_redir, redirect_meta).otherwise(child_meta).alias("meta"),
        F.when(is_redir, F.col("priority") + F.lit(priority_adjust))
        .otherwise(F.col("priority"))
        .alias("priority"),
        F.when(is_redir & keep_method, F.col("method"))
        .otherwise(F.lit("GET"))
        .alias("method"),
        F.when(is_redir & keep_method, F.col("body"))
        .otherwise(F.lit(None).cast("string"))
        .alias("body"),
        F.when(is_redir, F.col("dont_filter"))
        .otherwise(F.lit(False))
        .alias("dont_filter"),
        is_redir.alias("_redir"),
        F.col("discovered_seq").alias("parent_seq"),
        F.posexplode(hrefs).alias("pos", "href"),
    )
    return exploded.select(
        "crawl_id",
        "base_url",
        "href",
        "method",
        "body",
        "source",
        "meta",
        "priority",
        F.lit(0).alias("attempt"),
        "dont_filter",
        "parent_seq",
        F.when(F.col("_redir"), F.lit(-1))
        .otherwise(F.col("pos"))
        .alias("link_pos"),
    )


def apply_link_rules(
    links: DataFrame, rules: DataFrame | None, bypass=None
) -> DataFrame:
    """LinkExtractor ``allow``/``deny`` filter (``a_venue_be.py:7``;
    59 CrawlSpider spiders): per-source regexes applied to the ABSOLUTE
    resolved URL — NULL allow passes everything, a deny match drops.

    The rules dim is tiny (one row per site) and broadcast; the regex
    runs JVM-side (``regexp_like`` with a column pattern — patterns
    repeat per source, so at 10^10 links the cost is one compiled-regex
    match per row, no Python).
    """
    if rules is None:
        return links
    joined = links.join(F.broadcast(rules), "source", "left")
    keep = (
        F.col("link_allow").isNull()
        | F.regexp_like(F.col("url"), F.col("link_allow"))
    ) & (
        F.col("link_deny").isNull()
        | ~F.regexp_like(F.col("url"), F.col("link_deny"))
    )
    if bypass is not None:
        keep = keep | bypass
    return joined.filter(keep).drop("link_allow", "link_deny")


def offsite_filter(
    links: DataFrame, rules: DataFrame | None, bypass=None
) -> DataFrame:
    """OffsiteMiddleware analog: drop child links whose host is not one
    of the spider's ``allowed_domains`` (1,249 reference spiders set it,
    e.g. ``allowed_domains = ['2a-immo.fr']``). Scrapy semantics
    (``scrapy.utils.url.url_is_from_any_domain``): the request host
    passes when it EQUALS a domain or is a SUBDOMAIN of one
    (``host.endswith('.' + domain)``), case-insensitive; a
    ``dont_filter`` request bypasses the check; a spider with no
    allowed_domains filters nothing.

    Scale shape mirrors :func:`apply_link_rules`: the per-site dim is
    broadcast and the match is one JVM ``exists`` over a tiny array per
    row (``parse_url`` host extraction + suffix compare — whole-stage
    codegen, no Python, no shuffle).
    """
    if rules is None:
        return links
    host = F.lower(F.expr("parse_url(url, 'HOST')"))
    joined = links.join(F.broadcast(rules), "source", "left")
    no_rule = F.col("allowed_domains").isNull() | (F.size("allowed_domains") == 0)
    on_site = F.exists(
        F.col("allowed_domains"),
        lambda d: (host == d) | host.endswith(F.concat(F.lit("."), d)),
    )
    skip = (
        F.coalesce(F.col("dont_filter"), F.lit(False))
        if "dont_filter" in links.columns
        else F.lit(False)
    )
    if bypass is not None:
        skip = skip | bypass
    return joined.filter(no_rule | skip | on_site).drop("allowed_domains")


def assign_seq(df: DataFrame, order_cols: list, base: int) -> DataFrame:
    """Attach a globally ordered ``discovered_seq`` > ``base``.

    Distributed total sort (range shuffle) + ``monotonically_increasing_id``:
    after ``orderBy`` the partitions are range-ordered and sorted within,
    so the id (partitionId << 33 | offset) is order-consistent with the
    sort — sparse, but the scheduler only needs a total order, not dense
    ranks. No single-partition window, no driver collect: holds at
    10^10 rows. ``base`` keeps later waves strictly after earlier ones.
    """
    ordered = df.orderBy(*order_cols)
    return ordered.withColumn(
        "discovered_seq", F.lit(base) + F.monotonically_increasing_id() + F.lit(1)
    )
