"""Checkpointed table storage (Iceberg when jars exist, parquet+manifest otherwise)."""
