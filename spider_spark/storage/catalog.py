"""Snapshot store: Iceberg-semantics checkpointing for the crawl state.

The north rule wants "frontier checkpointed to Iceberg snapshots so a
killed run resumes from the last committed wave". The sandbox image has
no Iceberg jars (guide: "Delta/Iceberg/Hudi need their jars — stub
behind an import-try"), so this module:

* tries the real Iceberg catalog first (``try_iceberg``), and otherwise
* provides :class:`SnapshotStore` — per-table parquet snapshot dirs +
  one atomically-renamed ``manifest.json`` that is the single source of
  truth for what is committed. A wave is durable iff the manifest names
  it; partially-written parquet from a killed run is simply never
  referenced (the exact mechanism Iceberg's metadata pointer uses).

Layout::

    root/
      manifest.json                  <- atomic pointer {waves: N, ...}
      documents/wave=0003/*.parquet  <- appended per wave
      url_seen/wave=0003/*.parquet   <- appended per wave
      frontier/wave=0003/*.parquet   <- pending set AFTER wave 3 (overwrite-next)
      url_seen_filters/wave=0003/    <- Bloom bytes, latest wave wins
      metrics/wave=0003/*.parquet    <- appended per wave

Append-style tables are read back as the union of committed wave dirs
(one ``spark.read.parquet(dir1, dir2, ...)``); latest-style tables read
only the last committed wave. Readers never list the filesystem — they
trust the manifest, so a dirty directory from a crash is invisible.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Literal

from pyspark.sql import DataFrame, SparkSession


def try_iceberg(spark: SparkSession) -> bool:
    """True if an Iceberg catalog is usable in this session."""
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS spark_catalog.spider_ns")
        return True
    except Exception:
        return False


APPEND_TABLES = ("documents", "url_seen", "metrics")
LATEST_TABLES = ("frontier", "url_seen_filters")


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic pointer swap

    # -- writes ------------------------------------------------------------
    def _wave_dir(self, table: str, wave: int) -> str:
        return os.path.join(self.root, table, f"wave={wave:04d}")

    def write_wave(self, table: str, wave: int, df: DataFrame) -> None:
        """Stage one table's data for a wave (not yet visible)."""
        df.write.mode("overwrite").parquet(self._wave_dir(table, wave))

    def commit_wave(self, wave: int, extra: dict | None = None) -> None:
        """Make wave ``wave`` durable. Everything staged becomes visible."""
        manifest = self.read_manifest() or {"committed_waves": [], "extra": {}}
        if wave not in manifest["committed_waves"]:
            manifest["committed_waves"].append(wave)
        manifest["extra"].update(extra or {})
        self._write_manifest(manifest)

    # -- reads -------------------------------------------------------------
    def committed_waves(self) -> list[int]:
        m = self.read_manifest()
        return sorted(m["committed_waves"]) if m else []

    def read_table(
        self,
        table: str,
        mode: Literal["append", "latest"],
        schema=None,
    ) -> DataFrame | None:
        waves = self.committed_waves()
        dirs = [self._wave_dir(table, w) for w in waves]
        dirs = [d for d in dirs if os.path.exists(d)]
        if not dirs:
            return (
                self.spark.createDataFrame([], schema=schema) if schema is not None else None
            )
        if mode == "latest":
            dirs = dirs[-1:]
        return self.spark.read.parquet(*dirs)

    def extra(self) -> dict:
        m = self.read_manifest()
        return m["extra"] if m else {}
