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


def scan_documents(spark: SparkSession, sf_dir: str,
                   tagged: bool = False) -> DataFrame:
    """Config-switched document source (S2): the reference branches at
    scan time between deriving structure and trusting the file's own tags
    (TaggedDocumentProcessor.java:28-63 — "if the PDF is tagged, take the
    structure tree as-is"). Spark analog: ``tagged=True`` trusts the
    stored ``lang`` column; ``tagged=False`` drops it and re-derives
    language downstream (functions.text.lang_id). Both branches are the
    same parquet scan — the switch selects which columns reach the plan,
    so column pruning differs per branch (verify with .explain →
    ReadSchema)."""
    from pyspark.sql import functions as F

    from opendataloader_pdf_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    if tagged:
        return docs.select(
            "doc_id", "text", F.col("lang").alias("lang_out"),
            F.lit("tagged").alias("branch"),
        )
    return docs.select(
        "doc_id", "text", X.lang_id(F.col("text")).alias("lang_out"),
        F.lit("derived").alias("branch"),
    )


INVISIBLE_EVENT_TYPES = ("error",)


def scan_events(spark: SparkSession, sf_dir: str,
                filter_invisible: bool = False,
                invisible_types: tuple = INVISIBLE_EVENT_TYPES) -> DataFrame:
    """Option-switched event source (F11): the reference skips invisible
    optional-content layers AT PARSE TIME when
    ``setIsFilterInvisibleLayers`` is on (DocumentProcessor.java:161) —
    the hidden layer is never materialized, as opposed to being read and
    then dropped. Spark analog: the option attaches the predicate
    directly to the scan relation, before any other transform, so
    Catalyst pushes it into the parquet reader (.explain shows
    ``PushedFilters: [Not(EqualTo(event_type, ...))]``); row groups whose
    column statistics exclude the hidden value are never decompressed,
    and on a hive-partitioned layout (``.../event_type=error/``) the same
    predicate prunes whole files via PartitionFilters — the 100 TB shape,
    where the invisible layers cost zero IO. With the option off the scan
    is untouched."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    if filter_invisible:
        # null-safe: `~isin` is SQL null for a null event_type and
        # where() drops null — the option skips only the NAMED invisible
        # layers, never null-typed rows
        ev = ev.where(
            F.col("event_type").isNull()
            | ~F.col("event_type").isin(*invisible_types)
        )
    return ev
