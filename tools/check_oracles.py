"""Local stand-in for the driver's correctness gate: run each catalog
query on Spark and its DuckDB oracle twin, compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from opendataloader_pdf_spark.queries import QUERIES  # noqa: E402
from opendataloader_pdf_spark.session import get_spark  # noqa: E402
from opendataloader_pdf_spark.sources.tables import TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            an = pd.to_numeric(av, errors="raise")
            bn = pd.to_numeric(bv, errors="raise")
            bad = ~(
                (an.isna() & bn.isna())
                | (abs(an.fillna(0) - bn.fillna(0)) <= 1e-9 + 1e-9 * abs(bn.fillna(0)))
            )
        except (ValueError, TypeError):
            bad = av.fillna("∅").astype(str) != bv.fillna("∅").astype(str)
        if bad.any():
            i = bad.idxmax()
            return False, f"col {c} row {i}: {av[i]!r} vs {bv[i]!r} ({int(bad.sum())} diffs)"
    return True, ""


def main(sf_dir: str, names: list[str]) -> int:
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, qd in QUERIES.items():
        if names and name not in names:
            continue
        try:
            got = qd.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if qd.oracle is None:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.sql(qd.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok, why = values_match(canon(got), canon(exp))
        if ok:
            print(f"PASS {name}: {len(got)} rows")
        else:
            print(f"FAIL {name}: {why}")
            failures += 1
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.exit(main(sf, sys.argv[2:]))
