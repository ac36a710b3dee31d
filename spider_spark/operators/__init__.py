"""Relational/crawl operators: dedup, politeness scheduling, span assembly,
text-corpus dedup (MinHash/SimHash/Jaccard), ANN similarity search."""
