"""HTML parse stage: raw page bytes -> (links, interleaved spans).

The reference extracts with lxml xpath/css (3,035 / 896 spiders —
``der_immo_tip.py:32-47``). This container has no lxml, so the parser
is stdlib ``html.parser`` driven inside ``mapInPandas`` — one Arrow
batch of pages per call, one Python pass per page (the page bytes are
the irreducible per-row work; what matters at scale is that batches
cross the Python boundary once and partitions are independent).

Produces exactly the reference's observable outputs:

* out_links: href of every <a>, in document order (``response.xpath
  ('//a/@href')`` analog);
* spans: interleaved text/media in document order — text nodes under
  content tags become ``kind='text'`` spans, <img src> becomes
  ``kind='media'`` (ListingItem description + images, with page order
  preserved the way ItemLoader accumulation preserves it,
  ``loaders.py:14-47``).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

PARSED_SCHEMA = (
    "url string, out_links array<string>, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

_SKIP_TEXT_IN = {"script", "style", "head", "title"}


class _PageParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self.spans: list[tuple] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_IN:
            self._skip_depth += 1
        a = dict(attrs)
        if tag == "a" and a.get("href"):
            self.links.append(a["href"])
        elif tag == "img" and a.get("src"):
            self.spans.append(("media", None, a["src"], len(self.spans)))

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_IN and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth:
            return
        text = " ".join(data.split())
        if text:
            self.spans.append(("text", text, None, len(self.spans)))


def parse_page(html: str) -> tuple[list[str], list[tuple]]:
    p = _PageParser()
    p.feed(html or "")
    p.close()
    # dedup media keep-first (reference set() at pipelines.py:127-131,
    # made deterministic), renumber offsets to stay dense
    seen: set[str] = set()
    spans = []
    for kind, text, ref, _ in p.spans:
        if kind == "media":
            if ref in seen:
                continue
            seen.add(ref)
        spans.append((kind, text, ref, len(spans)))
    return p.links, spans


def parse_html_pages(pages: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """(url, html) -> (url, out_links, spans) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                links, spans = parse_page(html)
                rows.append((url, links, spans))
            yield pd.DataFrame(rows, columns=["url", "out_links", "spans"])

    return pages.mapInPandas(run, PARSED_SCHEMA)


# ---------------------------------------------------------------------------
# Main-content extraction (boilerplate removal)
# ---------------------------------------------------------------------------

#: Block elements that may BE the main content (body itself is excluded:
#: it always contains the boilerplate too, so scoring it would drown the
#: signal — the same reason Readability scores candidate containers, not
#: the page root).
_CANDIDATE_TAGS = {"div", "article", "section", "main", "td"}


class _MainContentParser(HTMLParser):
    """Single-pass streaming density scorer (Readability-family rule,
    Arc90 readability / trafilatura lineage — public heuristics): every
    open candidate block accumulates the length of descendant text,
    split into plain chars vs anchor chars; at close, score =
    plain_len - link_len. Best score wins; ties go to the EARLIEST
    opened block (deterministic). No DOM is built — one stack walk per
    page, so the per-row cost is a strict subset of the span parse.
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._a_depth = 0
        # open candidate blocks: [plain_len, link_len, texts, open_order]
        self._open: list[list] = []
        self._order = 0
        self.best: tuple | None = None  # (score, order, text)

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_IN:
            self._skip += 1
        if tag == "a":
            self._a_depth += 1
        if tag in _CANDIDATE_TAGS:
            self._open.append([0, 0, [], self._order])
            self._order += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_IN and self._skip > 0:
            self._skip -= 1
        if tag == "a" and self._a_depth > 0:
            self._a_depth -= 1
        if tag in _CANDIDATE_TAGS and self._open:
            self._finalize(self._open.pop())

    def handle_data(self, data):
        if self._skip or not self._open:
            return
        text = " ".join(data.split())
        if not text:
            return
        for entry in self._open:
            if self._a_depth:
                entry[1] += len(text)
            else:
                entry[0] += len(text)
                entry[2].append(text)

    def _finalize(self, entry) -> None:
        plain, link, texts, order = entry
        cand = (plain - link, order, " ".join(texts))
        if (
            self.best is None
            or cand[0] > self.best[0]
            or (cand[0] == self.best[0] and order < self.best[1])
        ):
            self.best = cand

    def result(self) -> str:
        # unclosed candidates (malformed HTML) still count
        while self._open:
            self._finalize(self._open.pop())
        return self.best[2] if self.best is not None else ""


def extract_main_text(html: str) -> str:
    """Main content of one page: text of the best-scoring candidate
    block, anchor text excluded, whitespace normalized; '' when the
    page has no candidate blocks."""
    p = _MainContentParser()
    p.feed(html or "")
    p.close()
    return p.result()


def main_content_pages(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, html) -> (url, main_text) via mapInPandas — the boilerplate
    -removal stage of a training-data pipeline (nav/footer/link farms
    dropped, article body kept). Same batch shape as parse_html_pages:
    one Arrow crossing, partitions independent."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "main_text": [extract_main_text(h) for h in pdf[html_col]],
                }
            )

    return pages.mapInPandas(run, "url string, main_text string")
