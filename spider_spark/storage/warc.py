"""WARC-shaped archive export (ISO 28500 / WARC 1.1 — public spec).

The interchange format every web-archive consumer (Common Crawl
tooling, pywb, warcio) reads. The engine's fetched pages become
``response`` records: a header block of named fields, a blank line,
the payload, and the record-terminating double CRLF. Record FORMATTING
is one JVM ``concat`` projection (no Python, no UDF); writing is a
plain partitioned text sink, one WARC file per partition — the same
shard layout Common Crawl publishes (thousands of ~1 GB warc.gz
shards), so a 100 TB crawl exports embarrassingly parallel.

Determinism: WARC-Record-ID is a UUID; a crawl pipeline that must be
re-runnable derives it from the request fingerprint instead of a RNG
(urn:uuid form with version/variant bits patched), and WARC-Date comes
from a data column, never the wall clock.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"


def deterministic_record_id(key: Column) -> Column:
    """urn:uuid:<v4-shaped> derived from md5(key): re-running the
    export reproduces byte-identical records. Version nibble forced to
    4 and variant to '8' (RFC 4122 shape) by substring splicing."""
    h = F.md5(key.cast("string"))
    return F.concat(
        F.lit("urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-4"),
        F.substring(h, 14, 3), F.lit("-8"),
        F.substring(h, 18, 3), F.lit("-"),
        F.substring(h, 21, 12),
    )


def warc_response_records(
    pages: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    date_col: str | None = None,
    warcinfo_id: str | None = None,
    digest: str = "sha1",
) -> DataFrame:
    """(…, url, payload[, date]) -> (url, record) where ``record`` is a
    complete WARC/1.1 response record string. ``date_col`` must hold a
    W3C/ISO instant string (derive it from crawl data — NEVER now());
    when None a fixed epoch stamp keeps the export reproducible.
    Content-Length counts payload BYTES (utf-8), not characters, per
    spec. ``digest`` picks the WARC-Payload-Digest algorithm: the spec
    (ISO 28500 §5.8) allows any labelled algorithm; ``sha1`` is the
    ecosystem default, ``md5`` keeps the record reproducible by engines
    without a sha1 builtin (the DuckDB oracle twin)."""
    payload = F.col(payload_col)
    nbytes = F.octet_length(payload)
    date = F.col(date_col) if date_col else F.lit("1970-01-01T00:00:00Z")
    if digest not in ("sha1", "md5"):
        raise ValueError(f"warc_response_records: unsupported digest {digest!r}")
    digest_col = F.sha1(payload) if digest == "sha1" else F.md5(payload)
    header = F.concat(
        F.lit("WARC/1.1" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Record-ID: "),
        deterministic_record_id(F.concat(F.lit("warc:"), F.col(url_col))),
        F.lit(CRLF),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit(CRLF),
        F.lit("WARC-Date: "), date, F.lit(CRLF),
        *(
            [F.lit("WARC-Warcinfo-ID: " + warcinfo_id + CRLF)]
            if warcinfo_id
            else []
        ),
        F.lit(f"WARC-Payload-Digest: {digest}:"), digest_col, F.lit(CRLF),
        F.lit("Content-Type: text/html" + CRLF),
        F.lit("Content-Length: "), nbytes.cast("string"), F.lit(CRLF),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.concat(header, F.lit(CRLF), payload, F.lit(CRLF + CRLF)).alias("record"),
    )


def write_warc(
    records: DataFrame, path: str, n_shards: int = 1, order_col: str = "url"
) -> None:
    """Write records as WARC text shards: hash-repartition to
    ``n_shards`` (uniform shard sizes at any scale) with records sorted
    by ``order_col`` WITHIN each shard — deterministic shard contents
    without any global sort."""
    (
        records.repartition(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .select(F.col("record").alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def parse_warc_records(blob: str) -> list[dict]:
    """Minimal reader twin for round-trip tests: splits a WARC blob on
    record starts and returns header dict + payload per record, using
    each record's own Content-Length to slice the payload exactly (so
    the record-terminator CRLFs and the text sink's added newlines
    never leak into it). Production consumers use warcio; this pins OUR
    writer's bytes."""
    import re

    out = []
    for chunk in re.split(r"WARC/1\.1\r\n", blob)[1:]:
        head, _, rest = chunk.partition(CRLF + CRLF)
        fields = {}
        for line in head.split(CRLF):
            k, _, v = line.partition(": ")
            if k:
                fields[k] = v
        n = int(fields.get("Content-Length", "0"))
        payload = rest.encode("utf-8")[:n].decode("utf-8")
        out.append({"headers": fields, "payload": payload})
    return out
