"""CDX index over WARC shards — the archive lookup surface.

Every WARC-consuming stack (Internet Archive wayback, pywb, Common
Crawl's cc-index) finds records through a CDX(J) index: one line per
record with a sort-friendly URL key, the shard file that holds the
record, and the byte offset/length to seek to (public formats: the IA
CDX file spec and the SURT canonicalization it keys on). A 100 TB
crawl that exports WARC without an index has written tape, not an
archive; this module derives the index FROM the same DataFrame the
sink writes, so index and shards can never disagree.

Two pieces, both pure DataFrame ops:

* :func:`surt_key` — Sort-friendly URI Reordering Transform (subset:
  lowercase, scheme + fragment stripped, leading ``www.`` dropped,
  host labels reversed and comma-joined, ``)`` separator, query
  parameters sorted — the same set-semantics sort the DUST miner
  uses). All JVM string/array functions, whole-stage codegen.
* :func:`cdx_index` — (url, record) + the sink's shard count ->
  one row per record: (surt, url, shard, filename, offset, length).
  Shard placement REPLAYS the sink's hash partitioning
  (``pmod(hash(url), n_shards)`` — Spark's ``repartition(n, col)`` is
  Murmur3-mod, and ``F.hash`` is the same Murmur3(seed=42)), and the
  offset is an exclusive prefix sum of record byte lengths in the
  sink's ``sortWithinPartitions`` order. The equivalence with the
  bytes ``write_warc`` actually produces is pinned by a round-trip
  test that seeks into the written files.

Scale shape: one window per shard — a shard is bounded (~1 GB of
records by construction, the Common Crawl layout), so the per-shard
sort never sees more than a shard's worth of rows, and shards
themselves are uniform by hash. No Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def surt_key(url: Column) -> Column:
    """SURT form of an absolute http(s) URL:
    ``http://www.Example.com/Path?b=2&a=1#f`` ->
    ``com,example)/path?a=1&b=2``. Subset of the IA spec: scheme and
    fragment dropped, lowercase, leading ``www.`` stripped, host
    labels reversed comma-joined, query params sorted; ports ride
    along with the last host label (rare; still sort-stable)."""
    u = F.regexp_replace(F.lower(url), r"#.*$", "")
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_extract(rest, r"^([^/?]+)", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(rest, r"^[^/?]+([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")), "&"
    )
    return F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def cdx_index(
    records: DataFrame,
    n_shards: int,
    url_col: str = "url",
    record_col: str = "record",
    prefix: str = "part",
) -> DataFrame:
    """Index rows for :func:`warc.write_warc`'s output: (surt, url,
    shard, filename, offset, length). ``length`` counts the record's
    utf-8 bytes plus the one ``\\n`` the text sink appends per line;
    ``offset`` is where the record's first byte lands in its shard
    file. ``filename`` mirrors Spark's text-sink part naming
    (``part-00007-*``) up to the task-attempt suffix — match on the
    5-digit shard number."""
    shard = F.pmod(F.hash(F.col(url_col)), F.lit(n_shards))
    length = (F.octet_length(F.col(record_col)) + F.lit(1)).cast("long")
    # staged renames url_col -> "url" below, so the offset window must
    # order by the renamed column or any non-default url_col raises an
    # AnalysisException at runtime.
    w = (
        Window.partitionBy("shard")
        .orderBy("url")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = records.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(url_col).alias("url"),
        shard.alias("shard"),
        length.alias("length"),
    )
    return staged.select(
        "surt",
        "url",
        "shard",
        F.concat(F.lit(prefix + "-"), F.lpad(F.col("shard").cast("string"), 5, "0"))
        .alias("filename"),
        (F.sum("length").over(w) - F.col("length")).alias("offset"),
        "length",
    )
