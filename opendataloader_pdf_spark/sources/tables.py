"""Testdata source layer: parquet scans with schema-on-read.

Reference parity: S1/S2/S4 (DocumentProcessor.preprocessing,
TaggedDocumentProcessor, CLI directory enumeration → SURVEY.md §2.1) —
in Spark a source is a declarative scan; filters/column pruning reach the
parquet reader via Catalyst (verify with .explain → PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver-generated table. Plain parquet scan — predicate
    pushdown and column pruning come free from Catalyst."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
