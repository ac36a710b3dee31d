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


def extract_documents(fetched_ok: DataFrame) -> DataFrame:
    """Detail pages -> documents rows (doc_id, spans, lineage cols)."""
    details = fetched_ok.filter(
        (~F.col("is_listing_page")) & (F.size(F.coalesce(F.col("spans"), F.array())) > 0)
    )
    return details.select(
        F.regexp_replace(F.col("canonical_url"), r"^[a-z0-9+.-]+://", "").alias("doc_id"),
        dedup_media_spans(F.col("spans")).alias("spans"),
        F.col("source"),
        F.col("host"),
        F.col("wave"),
        F.col("discovered_seq").alias("position"),
        F.col("meta").alias("attrs"),
    )


def extract_links(fetched_ok: DataFrame) -> DataFrame:
    """Listing pages -> raw child request rows (pre-identity).

    Children inherit source/meta/priority from the parent (the
    reference threads these via ``meta=`` — ``aands_org_uk.py:30-49``).
    """
    listings = fetched_ok.filter(F.size(F.coalesce(F.col("out_links"), F.array())) > 0)
    exploded = listings.select(
        F.col("crawl_id"),
        F.col("url").alias("base_url"),
        F.col("source"),
        F.col("meta"),
        F.col("priority"),
        F.col("discovered_seq").alias("parent_seq"),
        F.posexplode(F.col("out_links")).alias("link_pos", "href"),
    )
    return exploded.select(
        "crawl_id",
        resolve_udf(F.col("base_url"), F.col("href")).alias("url"),
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
