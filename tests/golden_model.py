"""Pure-Python golden model of the crawl contract (SURVEY.md §5.1).

A ~200-LoC driver-side simulator implementing the *same observable
semantics* the Spark engine must reproduce — Scrapy 2.3 defaults as
configured by the reference:

* RFPDupeFilter admission-time dedup, ``dont_filter`` bypass+no-record
* per-host budget = min(max_concurrency, floor(wave_s / crawl_delay))
* dispatch order per host: (priority DESC, discovered_seq ASC)
* retries: RETRY_HTTP_CODES, <=3 attempts, requeued with dont_filter
* redirects: RedirectMiddleware — 3xx+Location become new candidates
  (301/307/308+HEAD keep method/body, 302/303 -> GET; +2 priority;
  chain cap via meta['redirect_times']; meta['dont_redirect'] opts out)
* listing pages emit links in page order; children ordered by
  (parent_seq, link_pos); detail pages emit media-dedup'd span docs

It shares the synthetic web generator with the engine but NOT any Spark
code — an independent implementation that serves as the ordering /
seen-set / span oracle.
"""

from __future__ import annotations

import hashlib
import math
from urllib.parse import urljoin

from spider_spark import schemas
from spider_spark.synth import WebSpec, gen_host_policy, gen_seeds, gen_web

DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonicalize(url: str) -> str:
    """Independent re-implementation of the canonicalization contract."""
    import re

    m = re.match(
        r"^(?:([a-zA-Z][a-zA-Z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$",
        url or "",
    )
    scheme = (m.group(1) or "http").lower()
    netloc = (m.group(2) or "").lower()
    path = m.group(3) or ""
    query = m.group(4) or ""
    port = DEFAULT_PORTS.get(scheme)
    if port and netloc.endswith(":" + port):
        netloc = netloc[: -(len(port) + 1)]
    if path == "":
        path = "/"
    path = re.sub(r"/{2,}", "/", path)
    out = f"{scheme}://{netloc}{path}"
    if query:
        pairs = sorted(p.partition("=") for p in query.split("&") if p)
        out += "?" + "&".join(f"{k}={v}" for k, _, v in pairs)
    return out


def fingerprint(method: str, canonical_url: str, body: str | None) -> str:
    s = "\x00".join([(method or "GET").upper(), canonical_url or "", body or ""])
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def host_of(canonical_url: str) -> str:
    import re

    m = re.match(r"^[a-z0-9+.-]+://(?:[^/@]*@)?([^/:?#]*)", canonical_url)
    return m.group(1) if m else ""


def dedup_media(spans: list[dict]) -> list[dict]:
    seen = set()
    out = []
    for s in spans:
        if s["kind"] == "media":
            if s["media_ref"] in seen:
                continue
            seen.add(s["media_ref"])
        out.append(s)
    return out


class GoldenCrawl:
    def __init__(
        self,
        spec: WebSpec,
        wave_seconds: float = 1.0,
        max_waves: int = 64,
        obey_robots: bool = False,
        retry_times: int = schemas.RETRY_TIMES,
        redirect_max_times: int = schemas.REDIRECT_MAX_TIMES,
    ):
        self.web = {canonicalize(p["url"]): p for p in gen_web(spec)}
        self.policy = {p["host"]: p for p in gen_host_policy(spec)}
        self.seeds = gen_seeds(spec)
        self.wave_seconds = wave_seconds
        self.max_waves = max_waves
        self.obey_robots = obey_robots
        self.retry_times = retry_times
        self.redirect_max_times = redirect_max_times

        self.seen: set[str] = set()
        self.documents: dict[str, list[dict]] = {}
        #: doc_id -> [(fetch seq, page spans)] — multi-page items
        #: accumulate one fragment per fetched page (15walmer.py:112)
        self._fragments: dict[str, list[tuple[int, list[dict]]]] = {}
        #: dispatch log: list of (wave, host, rank, canonical_url)
        self.dispatch_log: list[tuple[int, str, int, str]] = []

    def _budget(self, host: str) -> int:
        pol = self.policy.get(host, {})
        delay = pol.get("crawl_delay_s", schemas.DEFAULT_CRAWL_DELAY_S)
        conc = pol.get("max_concurrency", schemas.DEFAULT_MAX_CONCURRENCY)
        return max(1, min(conc, math.floor(self.wave_seconds / delay)))

    def _robots_blocked(self, canonical_url: str, host: str) -> bool:
        if not self.obey_robots:
            return False
        path = canonical_url.split(host, 1)[-1]
        return any(path.startswith(p) for p in self.policy.get(host, {}).get("robots_disallow", []))

    def _admit(self, candidates: list[dict]) -> list[dict]:
        """candidates sorted by discovered_seq; returns admitted rows."""
        admitted = []
        for c in candidates:
            if c["dont_filter"]:
                admitted.append(c)
                continue
            if c["fingerprint"] in self.seen:
                continue
            self.seen.add(c["fingerprint"])
            admitted.append(c)
        return admitted

    def run(self) -> None:
        seq = 0
        pending: list[dict] = []
        cands = []
        for s in sorted(self.seeds, key=lambda s: (s["source"], s["url"])):
            seq += 1
            cu = canonicalize(s["url"])
            cands.append(
                {
                    "url": s["url"],
                    "canonical_url": cu,
                    "host": host_of(cu),
                    "fingerprint": fingerprint("GET", cu, None),
                    "meta": s["meta"],
                    "priority": s["priority"],
                    "attempt": 0,
                    "dont_filter": False,
                    "discovered_seq": seq,
                }
            )
        pending = self._admit(cands)

        for wave in range(1, self.max_waves + 1):
            if not pending:
                break
            # politeness dispatch
            if self.obey_robots:
                pending = [
                    r for r in pending if not self._robots_blocked(r["canonical_url"], r["host"])
                ]
            by_host: dict[str, list[dict]] = {}
            for r in pending:
                by_host.setdefault(r["host"], []).append(r)
            dispatch, deferred = [], []
            for host, rows in by_host.items():
                rows.sort(key=lambda r: (-r["priority"], r["discovered_seq"]))
                k = self._budget(host)
                dispatch.extend(rows[:k])
                deferred.extend(rows[k:])
                for rank, r in enumerate(rows[:k], start=1):
                    self.dispatch_log.append((wave, host, rank, r["canonical_url"]))

            retries, new_cands = [], []
            for r in dispatch:
                page = self.web.get(r["canonical_url"])
                status = page["status"] if page else 404
                if (
                    status in schemas.REDIRECT_HTTP_CODES
                    and page
                    and page.get("location")
                ):
                    # RedirectMiddleware: follow unless opted out; the
                    # target is an ordinary candidate (link_pos -1 so
                    # it sorts before the page's links), +2 priority,
                    # 302/303 downgrade to GET, chain capped at
                    # redirect_max_times via meta
                    meta = r["meta"] or {}
                    if str(meta.get("dont_redirect", "")).lower() in ("", "0", "false"):
                        times = int(meta.get("redirect_times", 0))
                        if times < self.redirect_max_times:
                            method = r.get("method", "GET")
                            keep = status in (301, 307, 308) or method.upper() == "HEAD"
                            trail = meta.get("redirect_urls")
                            new_meta = dict(
                                meta,
                                redirect_times=str(times + 1),
                                redirect_urls=(
                                    trail + "|" + r["url"] if trail else r["url"]
                                ),
                            )
                            new_cands.append(
                                {
                                    "parent_seq": r["discovered_seq"],
                                    "link_pos": -1,
                                    "url": urljoin(r["url"], page["location"]),
                                    "meta": new_meta,
                                    "priority": r["priority"]
                                    + schemas.REDIRECT_PRIORITY_ADJUST,
                                    "attempt": 0,
                                    "dont_filter": r["dont_filter"],
                                    "method": method if keep else "GET",
                                    "body": r.get("body") if keep else None,
                                }
                            )
                    continue  # a 3xx never parses and never retries
                if status != 200:
                    if status in schemas.RETRY_HTTP_CODES and r["attempt"] < self.retry_times:
                        rr = dict(r)
                        rr["attempt"] += 1
                        rr["dont_filter"] = True
                        retries.append(rr)
                    continue
                # effective doc id: a meta-carried doc_id (fragment of a
                # multi-page item) wins over the url-derived id
                doc_key = (
                    r["meta"].get("doc_id")
                    or r["canonical_url"].split("://", 1)[1]
                )
                if page["is_listing_page"] or page["out_links"]:
                    child_meta = r["meta"]
                    if not page["is_listing_page"]:
                        # children of a detail page inherit its doc id —
                        # their spans merge into the parent's document
                        child_meta = dict(r["meta"], doc_id=doc_key)
                    for pos, href in enumerate(page["out_links"]):
                        url = urljoin(r["url"], href)
                        new_cands.append(
                            {
                                "parent_seq": r["discovered_seq"],
                                "link_pos": pos,
                                "url": url,
                                "meta": child_meta,
                                "priority": r["priority"],
                                "attempt": 0,
                                "dont_filter": False,
                            }
                        )
                if not page["is_listing_page"] and page["spans"]:
                    self._fragments.setdefault(doc_key, []).append(
                        (r["discovered_seq"], page["spans"])
                    )

            new_cands.sort(key=lambda c: (c["parent_seq"], c["link_pos"]))
            for c in new_cands:
                seq += 1
                cu = canonicalize(c["url"])
                c["canonical_url"] = cu
                c["host"] = host_of(cu)
                c["fingerprint"] = fingerprint(
                    c.get("method", "GET"), cu, c.get("body")
                )
                c["discovered_seq"] = seq
            admitted = self._admit(new_cands)
            pending = deferred + admitted + retries

        # merge multi-page fragments: order by fetch seq, media dedup
        # ACROSS fragments keeping first, renumber offsets 0..n-1
        self.documents = {}
        for key, frs in self._fragments.items():
            frs.sort(key=lambda t: t[0])
            merged = dedup_media([s for _, spans in frs for s in spans])
            self.documents[key] = [
                dict(s, offset=i) for i, s in enumerate(merged)
            ]
