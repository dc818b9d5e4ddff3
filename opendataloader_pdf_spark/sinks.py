"""Output sinks — the reference's K-family serializers re-expressed as
column expressions + DataFrame writers (SURVEY.md §2.1).

* ``to_json_lines``    — K1 JsonWriter (core/json/JsonWriter.java:41-77):
  whole-row JSON via ``to_json(struct(...))``, written with df.write.text.
* ``to_markdown_rows`` — K2 MarkdownGenerator
  (core/markdown/MarkdownGenerator.java:56-110): template rendering as
  concat expressions (JVM-side, codegen-friendly).
* ``to_text_rows``     — K4 TextGenerator (core/text/TextGenerator.java).
* ``write_partitioned``— the lake-write primitive all sinks share:
  partitioned parquet with explicit ordering column materialized
  (Spark rows are unordered; K-order O4 rides a rank column).

The primary CDC sink (Iceberg-style MERGE) lives in cdc/storage.py; these
are the export/serialization surfaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_json_lines(df: DataFrame, sort_keys: bool = False) -> DataFrame:
    """One JSON object per row over all columns → single `json` column.
    ``sort_keys`` emits fields in alphabetical order (deterministic,
    engine-portable rendering — the oracle-checkable form)."""
    cols = sorted(df.columns) if sort_keys else df.columns
    return df.select(F.to_json(F.struct(*cols)).alias("json"))


def to_markdown_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Markdown table rows: '| a | b | c |' per input row (deterministic
    string rendering; numeric columns cast to string as-is)."""
    cols = cols or df.columns
    cells = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    line = F.concat(F.lit("| "), F.concat_ws(" | ", *cells), F.lit(" |"))
    return df.select(line.alias("md"))


def to_html_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """HTML table rows — K3 HtmlGenerator (core/html/HtmlGenerator.java:
    88-310) as concat expressions: '<tr><td>a</td><td>b</td></tr>' per
    row, with minimal entity escaping (&, <, >)."""
    cols = cols or df.columns
    def esc(c):
        s = F.coalesce(F.col(c).cast("string"), F.lit(""))
        s = F.regexp_replace(s, "&", "&amp;")
        s = F.regexp_replace(s, "<", "&lt;")
        return F.regexp_replace(s, ">", "&gt;")
    cells = [F.concat(F.lit("<td>"), esc(c), F.lit("</td>")) for c in cols]
    return df.select(
        F.concat(F.lit("<tr>"), F.concat(*cells), F.lit("</tr>")).alias("html")
    )


def markdown_header(cols: list[str]) -> list[str]:
    return [
        "| " + " | ".join(cols) + " |",
        "| " + " | ".join("---" for _ in cols) + " |",
    ]


def to_text_rows(df: DataFrame, col: str, order: list[Column] | None = None) -> DataFrame:
    """Plain-text sink projection: ordered single-column text (O4: order
    materialized before write)."""
    out = df
    if order:
        out = out.orderBy(*order)
    return out.select(F.col(col).cast("string").alias("value"))


def write_partitioned(df: DataFrame, path: str, partition_by: list[str],
                      mode: str = "overwrite", format: str = "parquet") -> None:
    """Partitioned lake write — the fan-out layout every sink shares.
    Partition columns should be low-cardinality (day, source, bucket)."""
    df.write.partitionBy(*partition_by).mode(mode).format(format).save(path)
