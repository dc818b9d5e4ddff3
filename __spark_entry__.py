"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``      — flagship query on /root/testdata/sf0.001.
``queries()``         — one entry per implemented operator (SURVEY.md §2 +
                        training-pipeline family), from the catalog in
                        opendataloader_pdf_spark.queries.
``oracle_sql()``      — DuckDB oracle twins for every SQL-expressible query
                        (None-oracle queries are omitted → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from opendataloader_pdf_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: P0 full-assembly pipeline — the reference's end-to-end
    Processor chain (filter → LWW dedup → run segmentation → heading
    classify → ordered markdown render) fused into one Catalyst plan."""
    return QUERIES["p0_full_assembly"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
