"""Structured Streaming twin of the frontier admission stage.

The engine's wave loop (plans/engine.py) is the production shape per
SURVEY.md §2.7 — the crawl is BSP, one snapshot per wave. This module
is the CONTINUOUS-ingestion twin: candidate URLs land as files (the
shape a link-discovery service or log shipper produces), a stream
canonicalizes + fingerprints them with the SAME Arrow UDF / JVM exprs
as the batch path, and duplicates are dropped with
``dropDuplicatesWithinWatermark`` — Spark's streaming seen-set, whose
state store plays the role the per-bucket Bloom sidecar plays in the
wave loop. Stream == batch is pinned by
tests/test_operators_ext.py::test_streaming_frontier_matches_batch.

At scale: the stream shuffles on ``fingerprint`` exactly like the
batch anti-join; the watermark bounds state (a URL seen longer ago
than the horizon may be re-admitted — the idempotent-absorption
property of the seen-set makes that safe, SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import with_url_identity

#: raw candidate-file schema (url + discovery time)
CANDIDATE_SCHEMA = "url string, discovered_ts timestamp, source string"


def read_candidate_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(path)
    )


def admit_stream(
    candidates: DataFrame,
    n_buckets: int = 64,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Canonicalize -> fingerprint -> streaming dedup (keep first).

    Same identity columns as the batch admit; the dedup key is the
    RFPDupeFilter fingerprint, state bounded by the watermark horizon.
    """
    ident = with_url_identity(candidates, n_buckets)
    return ident.withWatermark("discovered_ts", watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
