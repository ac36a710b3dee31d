"""Generate the crawl_end_to_end oracle fixture.

Runs the PURE-PYTHON golden model (tests/golden_model.py — the
independent implementation of the Scrapy-semantics contract, never the
Spark engine) on the exact WebSpec used by
``__spark_entry__.q_crawl_end_to_end`` and writes the expected span
rows to ``fixtures/crawl_expected.parquet``. The DuckDB oracle reads
this parquet, upgrading the end-to-end crawl from a rows-only check to
a full value-hash comparison.

Regenerate (only needed if the WebSpec or golden model changes):
    python tools/gen_crawl_oracle.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from spider_spark.synth import WebSpec  # noqa: E402
from tests.golden_model import GoldenCrawl  # noqa: E402

#: must mirror __spark_entry__.q_crawl_end_to_end exactly
SPEC = WebSpec(
    seed=42, n_hosts=3, pages_per_host=1, details_per_page=3,
    redirect_rate=0.34,
)
WAVE_SECONDS = 4.0
MAX_WAVES = 30


def main() -> None:
    g = GoldenCrawl(SPEC, wave_seconds=WAVE_SECONDS, max_waves=MAX_WAVES)
    g.run()
    rows = {"doc_id": [], "kind": [], "text": [], "media_ref": [], "offset": []}
    for doc_id, spans in g.documents.items():
        for s in spans:
            rows["doc_id"].append(doc_id)
            rows["kind"].append(s["kind"])
            rows["text"].append(s["text"])
            rows["media_ref"].append(s["media_ref"])
            rows["offset"].append(s["offset"])
    table = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "media_ref": pa.array(rows["media_ref"], pa.string()),
            "offset": pa.array(rows["offset"], pa.int32()),
        }
    )
    out = REPO / "fixtures" / "crawl_expected.parquet"
    out.parent.mkdir(exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} span rows, "
          f"{len(g.documents)} documents")


if __name__ == "__main__":
    main()
