"""Schema-registry diff: additive evolution gate.

Before each MERGE the engine diffs the incoming batch's payload schema
against the table schema (north rule: "additive schema evolution (new
columns, widened types) handled by a schema-registry diff step before
commit"). Allowed:

* new nullable columns (appended),
* integer widening byte→short→int→long,
* float→double.

Anything else (drops, renames, narrowing, incompatible type change)
raises ``SchemaEvolutionError`` — the batch is rejected before any data
is written, so the table is never left mid-evolution.

Reference parity: the reference's schema is fixed and versioned with the
repo (schema.json, SURVEY.md §1.3); the target engine generalizes that to
registry-checked additive drift.
"""

from __future__ import annotations

from pyspark.sql import types as T

_WIDENING: dict[tuple[str, str], bool] = {
    ("byte", "short"): True, ("byte", "integer"): True, ("byte", "long"): True,
    ("short", "integer"): True, ("short", "long"): True,
    ("integer", "long"): True,
    ("float", "double"): True,
}


class SchemaEvolutionError(ValueError):
    pass


def _widens(old: T.DataType, new: T.DataType) -> bool:
    return _WIDENING.get((old.typeName(), new.typeName()), False)


def diff_schemas(table: T.StructType, batch: T.StructType,
                 ignore: tuple[str, ...] = ()) -> T.StructType:
    """Return the evolved table schema for this batch, or raise.

    * column in both, same type        → keep
    * column in both, widening         → widen (table adopts new type)
    * column in both, narrowing/other  → SchemaEvolutionError
    * column only in batch             → append nullable (additive)
    * column only in table             → keep (batch may omit; reads null)
    """
    tbl = {f.name: f for f in table.fields}
    out: list[T.StructField] = []
    for f in table.fields:
        if f.name in ignore:
            out.append(f)
            continue
        b = next((x for x in batch.fields if x.name == f.name), None)
        if b is None or b.dataType == f.dataType:
            out.append(f)
        elif _widens(f.dataType, b.dataType):
            out.append(T.StructField(f.name, b.dataType, True))
        elif _widens(b.dataType, f.dataType):
            out.append(f)  # batch narrower than table — reads widen by cast
        else:
            raise SchemaEvolutionError(
                f"non-additive type change for column '{f.name}': "
                f"{f.dataType.simpleString()} -> {b.dataType.simpleString()}"
            )
    for b in batch.fields:
        if b.name not in tbl and b.name not in ignore:
            out.append(T.StructField(b.name, b.dataType, True))  # additive
    return T.StructType(out)
