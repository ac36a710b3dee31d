"""Deterministic synthetic web graph + frontier generators.

Replaces live HTTP in tests/benches. The graph mirrors the reference's
canonical 3-level crawl shape (``python_spiders/spiders/der_immo_tip.py:
26-43``): seed -> paginated listing pages (next-page chain, terminating
like the ``seen``-flag pattern of ``aands_org_uk.py:37-49``) -> detail
pages carrying interleaved text+media spans (``items.py`` description +
images fields). Deliberate stress features:

* relative + unsorted-query out_links (canonicalization),
* the same detail linked from multiple listing pages (dedup),
* cross-host links, dead links (404), retryable statuses (500/503),
* one hot host with many more pages than the rest (skew).

Everything is derived from ``sha256(seed || key)`` — no RNG state, so
the pure-Python golden model and the Spark engine see byte-identical
inputs, and regeneration at any scale is reproducible.

Two generators:

* :func:`gen_web` — driver-side small graph for correctness tests.
* :func:`gen_frontier_df` — ``spark.range``-based URL frontier at
  bench scale (10^6–10^8 rows locally; the same expression tree would
  materialize 10^10 rows on a cluster since nothing touches the driver).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas


def _h(*parts) -> int:
    """Deterministic 64-bit hash of the parts."""
    s = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


@dataclass
class WebSpec:
    seed: int = 42
    n_hosts: int = 6
    pages_per_host: int = 3  # listing pages per normal host
    details_per_page: int = 5
    hot_host_factor: int = 6  # hot host has factor x pages (skew)
    dup_link_rate: float = 0.34  # prob a detail is re-linked from next page
    dead_link_rate: float = 0.1
    retry_rate: float = 0.08  # listing/detail pages w/ retryable status
    cross_host_rate: float = 0.15
    #: prob a detail item SPLITS across two requests (the reference's
    #: partially-built-item-via-meta pattern, ``15walmer.py:112``):
    #: part 1 carries the leading spans plus a continuation link; the
    #: engine must merge both fragments into one document
    split_item_rate: float = 0.25
    #: prob a detail page sits behind a 3xx alias (`/go/{id}` ->
    #: `/detail/{id}`): listings link the ALIAS, whose page carries a
    #: redirect status + Location; a third of aliased details chain
    #: through a second hop (`/go/{id}` -> `/go2/{id}` -> detail).
    #: Default 0 keeps pre-redirect fixtures byte-identical.
    redirect_rate: float = 0.0
    hosts: list[str] = field(default_factory=list)

    def __post_init__(self):
        if not self.hosts:
            self.hosts = [f"host{i}.example" for i in range(self.n_hosts)]
            if self.n_hosts >= 2:
                self.hosts[0] = "hot.example"

    def n_pages(self, host: str) -> int:
        return self.pages_per_host * (self.hot_host_factor if host == "hot.example" else 1)


def _frac(x: int) -> float:
    return (x % 10_000) / 10_000.0


def make_spans(spec: WebSpec, doc_id: str, host: str) -> list[dict]:
    """1-12 interleaved text/media spans, deterministic per doc.

    Includes repeated media_refs inside one doc so span assembly must
    dedup media keeping FIRST occurrence (the reference dedups images
    via ``set()`` at ``pipelines.py:127-131``; we fix its
    nondeterministic order by keeping first — documented divergence).
    """
    n = 1 + _h(spec.seed, "nspan", doc_id) % 12
    spans = []
    n_media = 0
    for i in range(n):
        r = _h(spec.seed, "span", doc_id, i)
        if r % 3 == 0:
            # media span; every 4th media repeats an earlier ref
            if n_media > 0 and r % 4 == 0:
                j = r % n_media
            else:
                j = n_media
            n_media += 1
            spans.append(
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": f"http://{host}/img/{doc_id.rsplit('/', 1)[-1]}_{j}.jpg",
                    "offset": i,
                }
            )
        else:
            words = 3 + r % 9
            txt = " ".join(f"w{(_h(spec.seed, doc_id, i, k) % 97)}" for k in range(words))
            spans.append({"kind": "text", "text": txt, "media_ref": None, "offset": i})
    return spans


def _redirect_hops(spec: WebSpec, host: str, did: str):
    """(status_code, two_hop) when detail ``did`` hides behind a 3xx
    alias, else None. Deterministic like everything else here."""
    if _frac(_h(spec.seed, host, did, "redir")) >= spec.redirect_rate:
        return None
    code = (301, 302, 307)[_h(spec.seed, host, did, "rcode") % 3]
    two_hop = _frac(_h(spec.seed, host, did, "rhops")) < 0.33
    return code, two_hop


def gen_web(spec: WebSpec) -> list[dict]:
    """Full synthetic web as plain dict rows (web_pages schema)."""
    pages: list[dict] = []
    for host in spec.hosts:
        npages = spec.n_pages(host)
        detail_ids = [f"d{_h(spec.seed, host, 'detail', i) % 10 ** 8:08d}" for i in range(npages * spec.details_per_page)]
        for p in range(1, npages + 1):
            url = f"http://{host}/list?page={p}"
            links = []
            base = (p - 1) * spec.details_per_page
            for j in range(spec.details_per_page):
                did = detail_ids[base + j]
                r = _h(spec.seed, host, p, j)
                # aliased details are linked via /go/; direct dup links
                # below still use /detail/ (alias+direct interplay)
                seg = "go" if _redirect_hops(spec, host, did) else "detail"
                # exercise canonicalization: mix relative, query-bearing, fragments
                form = r % 4
                if form == 0:
                    links.append(f"/{seg}/{did}")
                elif form == 1:
                    links.append(f"{seg}/{did}")
                elif form == 2:
                    links.append(f"http://{host}/{seg}/{did}#frag")
                else:
                    links.append(f"http://{host}:80/{seg}/{did}")
            # duplicate links back to previous page's details
            if p > 1:
                for j in range(spec.details_per_page):
                    if _frac(_h(spec.seed, host, p, "dup", j)) < spec.dup_link_rate:
                        links.append(f"/detail/{detail_ids[base - spec.details_per_page + j]}")
            # cross-host link
            if _frac(_h(spec.seed, host, p, "x")) < spec.cross_host_rate:
                other = spec.hosts[_h(spec.seed, host, p, "xh") % len(spec.hosts)]
                if other != host:
                    links.append(f"http://{other}/list?page=1")
            # dead link
            if _frac(_h(spec.seed, host, p, "dead")) < spec.dead_link_rate:
                links.append(f"/missing/{p}")
            # next page
            if p < npages:
                links.append(f"/list?page={p + 1}")
            status = 200
            if _frac(_h(spec.seed, host, p, "status")) < spec.retry_rate:
                status = 503
            pages.append(
                {
                    "url": f"http://{host}/list?page={p}",
                    "host": host,
                    "status": status,
                    "out_links": links,
                    "spans": [],
                    "is_listing_page": True,
                }
            )
        for did in detail_ids:
            doc_id = f"{host}/detail/{did}"
            hops = _redirect_hops(spec, host, did)
            if hops is not None:
                # alias hop page(s): RELATIVE Location on hop 1 (tests
                # urljoin), absolute on hop 2; no spans, no out_links
                code, two_hop = hops
                pages.append(
                    {
                        "url": f"http://{host}/go/{did}",
                        "host": host,
                        "status": code,
                        "out_links": [],
                        "spans": [],
                        "is_listing_page": False,
                        "location": f"/go2/{did}" if two_hop else f"/detail/{did}",
                    }
                )
                if two_hop:
                    pages.append(
                        {
                            "url": f"http://{host}/go2/{did}",
                            "host": host,
                            "status": 302,
                            "out_links": [],
                            "spans": [],
                            "is_listing_page": False,
                            "location": f"http://{host}/detail/{did}",
                        }
                    )
            status = 200
            if _frac(_h(spec.seed, host, did, "status")) < spec.retry_rate:
                status = 500
            spans = make_spans(spec, doc_id, host)
            split = (
                len(spans) >= 4
                and _frac(_h(spec.seed, host, did, "split")) < spec.split_item_rate
            )
            if split:
                # multi-page item: part 1 = leading spans + continuation
                # link; part 2 = its own page with the trailing spans
                # (offsets re-based — each PAGE starts at 0; the merge
                # orders fragments by fetch position, then renumbers)
                cut = len(spans) // 2
                p2_status = 200
                if _frac(_h(spec.seed, host, did, "status2")) < spec.retry_rate:
                    p2_status = 500
                pages.append(
                    {
                        "url": f"http://{host}/detail/{did}",
                        "host": host,
                        "status": status,
                        "out_links": [f"/detail/{did}/p2"],
                        "spans": spans[:cut],
                        "is_listing_page": False,
                    }
                )
                pages.append(
                    {
                        "url": f"http://{host}/detail/{did}/p2",
                        "host": host,
                        "status": p2_status,
                        "out_links": [],
                        "spans": [dict(s, offset=j) for j, s in enumerate(spans[cut:])],
                        "is_listing_page": False,
                    }
                )
            else:
                pages.append(
                    {
                        "url": f"http://{host}/detail/{did}",
                        "host": host,
                        "status": status,
                        "out_links": [],
                        "spans": spans,
                        "is_listing_page": False,
                    }
                )
    return pages


def gen_seeds(spec: WebSpec) -> list[dict]:
    """One seed per host, with per-URL meta like the reference start_urls
    (``readme.md:33-55`` carries property_type per seed)."""
    return [
        {
            "url": f"http://{h.upper()}/list?page=1#top",  # un-canonical on purpose
            "source": f"spider_{h.split('.')[0]}",
            "meta": {"property_type": "apartment" if i % 2 == 0 else "house"},
            "priority": 0,
        }
        for i, h in enumerate(spec.hosts)
    ]


def gen_host_policy(spec: WebSpec) -> list[dict]:
    """Per-host politeness dim: delays from the reference envelope
    (0.1 s default, 1.0 s override hosts — ``settings.py:76``,
    ``95bis_com.py:28``); one host carries robots rules."""
    rows = []
    for i, h in enumerate(spec.hosts):
        rows.append(
            {
                "host": h,
                "crawl_delay_s": 1.0 if i % 3 == 2 else schemas.DEFAULT_CRAWL_DELAY_S,
                "max_concurrency": schemas.DEFAULT_MAX_CONCURRENCY,
                "robots_disallow": ["/private"] if i % 4 == 3 else [],
            }
        )
    return rows


def gen_sitemaps(spec: WebSpec) -> list[dict]:
    """Per-host sitemap tree (index -> leaf), mirroring the reference's
    SitemapSpider shape (``athimmo_be.py:18-26``): the index lists one
    leaf sitemap; the leaf lists every listing-page URL of the host, so
    a sitemap-seeded crawl reaches exactly the pages a start_urls crawl
    reaches."""
    rows = []
    for host in spec.hosts:
        rows.append(
            {
                "url": f"http://{host}/sitemap.xml",
                "xml": (
                    '<?xml version="1.0"?><sitemapindex>'
                    f"<sitemap><loc>http://{host}/sitemap-pages.xml</loc></sitemap>"
                    "</sitemapindex>"
                ),
            }
        )
        locs = "".join(
            f"<url><loc> http://{host}/list?page={p} </loc></url>"
            for p in range(1, spec.n_pages(host) + 1)
        )
        rows.append(
            {
                "url": f"http://{host}/sitemap-pages.xml",
                "xml": f'<?xml version="1.0"?><urlset>{locs}</urlset>',
            }
        )
    return rows


def gen_sitemap_seeds(spec: WebSpec) -> list[dict]:
    """Seeds pointing at each host's sitemap index instead of its first
    listing page (the SitemapSpider entry shape)."""
    return [
        {
            "url": f"http://{h}/sitemap.xml",
            "source": f"spider_{h.split('.')[0]}",
            "meta": {"property_type": "apartment" if i % 2 == 0 else "house"},
            "priority": 0,
        }
        for i, h in enumerate(spec.hosts)
    ]


def sitemaps_df(spark: SparkSession, spec: WebSpec) -> DataFrame:
    return spark.createDataFrame(gen_sitemaps(spec), schema="url string, xml string")


def sitemap_seeds_df(spark: SparkSession, spec: WebSpec) -> DataFrame:
    return spark.createDataFrame(gen_sitemap_seeds(spec), schema=schemas.SEEDS)


def web_df(spark: SparkSession, spec: WebSpec) -> DataFrame:
    return spark.createDataFrame(gen_web(spec), schema=schemas.WEB_PAGES)


def seeds_df(spark: SparkSession, spec: WebSpec) -> DataFrame:
    return spark.createDataFrame(gen_seeds(spec), schema=schemas.SEEDS)


def host_policy_df(spark: SparkSession, spec: WebSpec) -> DataFrame:
    return spark.createDataFrame(gen_host_policy(spec), schema=schemas.HOST_POLICY)


# ---------------------------------------------------------------------------
# bench-scale frontier (no driver materialization)
# ---------------------------------------------------------------------------


def gen_frontier_df(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 1000,
    dup_rate: float = 0.2,
    skew_host_share: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Synthetic raw-URL frontier built entirely from column expressions.

    ``dup_rate`` of rows re-reference an earlier URL id (dedup load);
    ``skew_host_share`` of rows land on one hot host (skew load). The
    whole table is lazy — on a cluster the same code generates 10^10
    rows without any single node holding them.
    """
    df = spark.range(n_urls).withColumnRenamed("id", "seq")
    r = F.xxhash64(F.col("seq"), F.lit(seed))
    is_dup = (F.pmod(r, 1000) < int(dup_rate * 1000)) & (F.col("seq") > 0)
    url_id = F.when(is_dup, F.pmod(F.abs(r), F.greatest(F.col("seq"), F.lit(1)))).otherwise(
        F.col("seq")
    )
    hot = F.pmod(F.xxhash64(url_id, F.lit(seed + 1)), 1000) < int(skew_host_share * 1000)
    host_id = F.when(hot, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(url_id, F.lit(seed + 2)), F.lit(n_hosts))
    )
    return df.select(
        F.col("seq").alias("discovered_seq"),
        F.concat(
            F.lit("http://h"),
            host_id.cast("string"),
            F.lit(".example/page/"),
            url_id.cast("string"),
            F.lit("?b=2&a=1"),
        ).alias("url"),
        F.lit("GET").alias("method"),
        F.lit(None).cast("string").alias("body"),
        F.lit(0).alias("priority"),
        F.lit(False).alias("dont_filter"),
        F.lit("bench").alias("source"),
    )
