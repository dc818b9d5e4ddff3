"""Round-5 additions: the composed cdc_full_lifecycle entry — four
round-4 CDC modes (txn-boundary buffering, DBLog backfill chunk, TOAST
carry-forward, quarantine redrive) interleaved on ONE sink — checked
value-for-value against its DuckDB oracle, plus the mode-interaction
invariants the value hash can't see (the entry's own runtime asserts
fire inside the call; a clean return means straddle/held/toast/
quarantine/redrive accounting all reconciled)."""

from __future__ import annotations

import duckdb
import pandas as pd

from opendataloader_pdf_spark.queries import QUERIES
from opendataloader_pdf_spark.sources.tables import TABLES


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_full_lifecycle_matches_oracle(spark, sf_dir):
    qd = QUERIES["cdc_full_lifecycle"]
    got = _canon(qd.fn(spark, sf_dir).toPandas())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = _canon(con.sql(qd.oracle).df())
    assert len(got) > 0
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
