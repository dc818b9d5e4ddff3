"""In-stream DDL: schema-change events carried IN the change stream.

A real binlog/WAL tail interleaves DDL with DML — MySQL binlogs carry
``ALTER TABLE`` statements between row events, and Debezium surfaces
them as schema-change messages with the same LSN ordering as the data.
The registry-diff step (schema_evolution.py) assumes someone already
*assigned* each row a schema version; this module closes that loop for
streams that carry their own DDL:

* :func:`parse_ddl` — wire DDL statements (``ALTER TABLE t ADD COLUMN
  name type`` / ``ALTER TABLE t ALTER COLUMN name TYPE type``) → typed
  ``(lsn, action, column, dtype)`` rows, entirely with JVM
  ``regexp_extract`` (no Python row path).
* :func:`collect_timeline` — the tiny driver-side DDL list (O(schema
  changes), never O(events)), validated: additive-only, no duplicate
  adds, widen targets must exist — a malformed DDL fails HERE, before
  any data is written.
* :func:`registry_from_timeline` — epoch ``e`` schema = base schema
  with the first ``e-1`` DDLs applied; plugs directly into
  ``ReplayEngine(registry=...)``.
* :func:`assign_epochs` — per-row ``schema_version`` from the row's
  LSN position in the timeline (a constant-folded JVM sum of
  comparisons against the k DDL LSNs — zero shuffles, zero Python).
* :func:`premature_cond` — the log-consistency invariant: a row that
  POPULATES a column before the DDL that declared it is corrupt and
  must be dead-lettered, not silently merged.
* :func:`replay_ddl_stream` — the composed driver: split DDL from DML,
  build the registry, quarantine premature rows under
  ``<sink.root>/_ddl_quarantine``, and replay through the unchanged
  ReplayEngine — whose existing per-batch registry diff then evolves
  the sink exactly at the LSN boundary the stream declared.

Reference parity: the reference validates each container's declared
structure before processing (SURVEY.md §2.1 S2 "tagged/schema-on-read
scan"); in-stream DDL generalizes that to schema declarations that
arrive *inside* the stream, which is what the north rule's
"binlog/WAL-style change stream ... additive schema evolution" means
end-to-end.

Scale notes: the DDL extraction scans one string column of the rare
``op='ddl'`` rows (parquet predicate pushdown on ``op`` prunes the
rest); the timeline is a handful of driver-side tuples; epoch
assignment and the premature predicate are codegen'd comparisons.
Nothing here adds a shuffle to the replay plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opendataloader_pdf_spark.cdc.schema_evolution import (
    SchemaEvolutionError,
    _widens,
)

__all__ = [
    "DdlEvent",
    "parse_ddl",
    "collect_timeline",
    "registry_from_timeline",
    "assign_epochs",
    "premature_cond",
    "replay_ddl_stream",
]


@dataclass(frozen=True)
class DdlEvent:
    lsn: int
    action: str  # 'add_column' | 'widen_column'
    column: str
    dtype: str  # spark simpleString, e.g. 'string', 'bigint'


#: DDL statement grammar (case-insensitive, single statement per event):
#:   ALTER TABLE <t> ADD COLUMN <name> <type>
#:   ALTER TABLE <t> ALTER COLUMN <name> TYPE <type>
_ADD_RE = r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+ADD\s+COLUMN\s+(\w+)\s+([\w<>, ]+?)\s*$"
_ALTER_RE = (
    r"(?i)^\s*ALTER\s+TABLE\s+\S+\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+([\w<>, ]+?)\s*$"
)

#: the additive-DDL type surface (simple SQL names → Spark types);
#: array<prim> composes on top
_PRIM = {
    "string": T.StringType(),
    "varchar": T.StringType(),
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
}


def parse_type(name: str) -> T.DataType:
    s = name.strip().lower()
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_type(s[len("array<"):-1]))
    try:
        return _PRIM[s]
    except KeyError:
        raise SchemaEvolutionError(f"unsupported DDL type {name!r}") from None


def parse_ddl(ddl_rows: DataFrame, ddl_col: str = "ddl",
              lsn_col: str = "lsn") -> DataFrame:
    """Wire DDL statements → typed (lsn, action, column, dtype) rows.

    Pure JVM regexp parse. Statements matching neither grammar rule
    come back with ``action = NULL`` so :func:`collect_timeline` can
    reject them by name instead of silently dropping a schema change
    (losing a DDL would corrupt every later epoch's interpretation).
    """
    c = F.col(ddl_col)
    add_col = F.regexp_extract(c, _ADD_RE, 1)
    add_typ = F.regexp_extract(c, _ADD_RE, 2)
    alt_col = F.regexp_extract(c, _ALTER_RE, 1)
    alt_typ = F.regexp_extract(c, _ALTER_RE, 2)
    return ddl_rows.select(
        F.col(lsn_col).cast("long").alias("lsn"),
        F.when(add_col != "", F.lit("add_column"))
        .when(alt_col != "", F.lit("widen_column"))
        .alias("action"),
        F.when(add_col != "", add_col).when(alt_col != "", alt_col).alias("column"),
        F.lower(F.trim(
            F.when(add_col != "", add_typ).when(alt_col != "", alt_typ)
        )).alias("dtype"),
        c.alias("_stmt"),
    )


def collect_timeline(parsed: DataFrame) -> list[DdlEvent]:
    """Driver-side DDL timeline, LSN-sorted and validated.

    Safe to collect: a stream carries O(schema changes) DDL events —
    a table that alters its schema 10^6 times is broken upstream, and
    we fail loudly rather than truck on (cap below).
    """
    rows = parsed.limit(10_001).collect()
    if len(rows) > 10_000:
        raise SchemaEvolutionError(
            "more than 10000 DDL events in one stream — refusing; this "
            "is a corrupt or adversarial log, not schema drift"
        )
    out: list[DdlEvent] = []
    for r in sorted(rows, key=lambda r: (r["lsn"], r["column"] or "")):
        if r["action"] is None or r["lsn"] is None:
            raise SchemaEvolutionError(
                f"unparseable DDL statement at lsn={r['lsn']}: {r['_stmt']!r}"
            )
        parse_type(r["dtype"])  # reject unknown types eagerly
        out.append(DdlEvent(int(r["lsn"]), r["action"], r["column"], r["dtype"]))
    return out


def registry_from_timeline(
    base: T.StructType, timeline: list[DdlEvent]
) -> dict[int, T.StructType]:
    """Epoch schemas: ``{1: base, 2: base+ddl1, ..., k+1: base+all}``.

    Validation mirrors schema_evolution.diff_schemas: adds must be new
    names, widens must widen an existing column. Raises before any
    data motion on violation.
    """
    reg = {1: base}
    cur = base
    for i, d in enumerate(timeline):
        names = {f.name for f in cur.fields}
        new_type = parse_type(d.dtype)
        if d.action == "add_column":
            if d.column in names:
                raise SchemaEvolutionError(
                    f"DDL at lsn={d.lsn} adds existing column {d.column!r}"
                )
            cur = T.StructType(
                list(cur.fields) + [T.StructField(d.column, new_type, True)]
            )
        elif d.action == "widen_column":
            if d.column not in names:
                raise SchemaEvolutionError(
                    f"DDL at lsn={d.lsn} widens unknown column {d.column!r}"
                )
            fields = []
            for f in cur.fields:
                if f.name != d.column:
                    fields.append(f)
                elif _widens(f.dataType, new_type):
                    fields.append(T.StructField(f.name, new_type, True))
                else:
                    raise SchemaEvolutionError(
                        f"DDL at lsn={d.lsn} would narrow {d.column!r}: "
                        f"{f.dataType.simpleString()} -> {d.dtype}"
                    )
            cur = T.StructType(fields)
        else:  # pragma: no cover - collect_timeline already rejects
            raise SchemaEvolutionError(f"unknown DDL action {d.action!r}")
        reg[i + 2] = cur
    return reg


def assign_epochs(
    data: DataFrame, timeline: list[DdlEvent], lsn_col: str = "lsn"
) -> DataFrame:
    """Stamp each row's ``schema_version`` = 1 + #DDLs at-or-before its
    LSN. A k-term sum of codegen'd comparisons (k = timeline length) —
    no shuffle, no Python."""
    epoch = F.lit(1)
    for d in timeline:
        epoch = epoch + F.when(F.col(lsn_col) >= F.lit(d.lsn), 1).otherwise(0)
    return data.withColumn("schema_version", epoch.cast("int"))


def premature_cond(timeline: list[DdlEvent], columns: list[str]):
    """Rows that populate a column BEFORE the DDL that declared it.

    Returns a Column predicate, or None when no add_column DDL touches
    a structurally-present column (nothing can be premature then).
    Widening DDLs never make a row premature — a narrower value is a
    valid value of the widened type at any LSN.
    """
    cond = None
    for d in timeline:
        if d.action != "add_column" or d.column not in columns:
            continue
        # coalesce: a null-lsn (malformed) row makes the comparison SQL
        # NULL; without the fallback both `filter(cond)` and
        # `filter(~cond)` would drop it — it must instead flow through
        # as not-premature so the engine's quarantine dead-letters it
        # (the events.py never-null-filter rule)
        c = F.coalesce(
            F.col(d.column).isNotNull() & (F.col("lsn") < F.lit(d.lsn)),
            F.lit(False),
        )
        cond = c if cond is None else (cond | c)
    return cond


def replay_ddl_stream(
    spark,
    sink,
    events: DataFrame,
    batch_size: int,
    base_schema: T.StructType | None = None,
    ddl_col: str = "ddl",
    fail_after: int | None = None,
    **engine_kw,
):
    """Replay a mixed DML+DDL stream (``op='ddl'`` rows carry the
    statement in ``ddl_col``) through the unchanged ReplayEngine.

    Returns ``(summary, timeline, n_premature)``. Premature rows land
    under ``<sink.root>/_ddl_quarantine`` (idempotent overwrite — a
    crash/retry rewrites the same partition), mirroring the engine's
    dead-letter contract. The sink evolves at each DDL's LSN boundary
    because every row's schema_version is derived from that boundary —
    the engine's existing per-batch registry diff does the rest.
    """
    import os

    from opendataloader_pdf_spark.cdc.engine import ReplayEngine, default_registry

    base = base_schema or default_registry()[1]
    if ddl_col in events.columns:
        timeline = collect_timeline(
            parse_ddl(events.filter(F.col("op") == "ddl"), ddl_col=ddl_col)
        )
        # eqNullSafe: op=NULL is malformed, and (op != 'ddl') evaluates
        # to SQL NULL for it — a plain filter would silently drop the
        # row before the engine's quarantine could dead-letter it
        data = events.filter(~F.col("op").eqNullSafe("ddl")).drop(ddl_col)
    else:
        # no DDL channel in this stream — empty timeline, plain replay
        timeline = []
        data = events
    n_premature = 0
    bad_cond = premature_cond(timeline, data.columns)
    if bad_cond is not None:
        bad = data.filter(bad_cond)
        n_premature = bad.count()
        if n_premature:
            if getattr(sink, "root", None) is None:
                raise ValueError(
                    "premature-column rows found but the sink has no "
                    ".root for the DDL dead-letter table"
                )
            bad.write.mode("overwrite").parquet(
                os.path.join(sink.root, "_ddl_quarantine")
            )
        data = data.filter(~bad_cond)
    eng = ReplayEngine(
        spark, sink, registry=registry_from_timeline(base, timeline), **engine_kw
    )
    eng.bootstrap(None, version=1)
    summary = eng.replay(
        assign_epochs(data, timeline), batch_size=batch_size,
        fail_after=fail_after,
    )
    return summary, timeline, n_premature
