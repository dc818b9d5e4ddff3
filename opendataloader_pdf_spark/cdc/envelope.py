"""Debezium-style JSON change-event envelope wire format.

A binlog/WAL tail rarely hands the consumer clean columnar events: the
canonical wire format is a JSON *envelope* per change — Debezium's
``{op, ts_ms, before, after, source:{lsn, ...}}`` shape (op codes
``c``\\reate / ``u``\\pdate / ``d``\\elete / ``r``\\ead-snapshot) — and the
ingest engine's first job is to parse that envelope into typed columns,
classify malformed payloads, and normalize op codes before dedup/LWW.
This module is that boundary layer for the engine:

* :func:`parse_envelopes` — wire JSON → the engine's canonical event
  columns (``datagen.EVENT_SCHEMA`` minus patch fields), entirely with
  ``from_json`` + JVM expressions (no Python row path). Malformed JSON
  and unknown op codes surface as rows failing
  ``events.invalid_event_cond`` — i.e. they flow into the engine's
  existing quarantine/dead-letter machinery rather than being silently
  dropped at the parse step.
* :func:`render_envelopes` — the inverse (canonical events → wire JSON)
  used by tests and catalog entries to synthesize a deterministic wire
  stream; deletes carry the key in ``before`` with ``after = null``,
  exactly the Debezium contract.

Reference parity: the reference ingests a self-describing container and
validates per-record structure before processing (SURVEY.md §2.1 S2
"tagged/schema-on-read scan"); the envelope layer generalizes that to
the CDC wire format named by the north rule ("binlog/WAL-style change
stream").

Scale notes
-----------
``from_json``/``to_json`` are Catalyst expressions: the parse runs
inside whole-stage codegen per input split, shuffles nothing, and
column-prunes (a downstream projection of 3 fields reads the JSON once
per row regardless). Corrupt records cost no exception path —
``from_json`` yields a null struct, and the null key lands the row in
the engine's single pre-batch invalid filter. At 10^10 events the parse
adds zero stages to the replay plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: payload image carried in ``before`` / ``after``
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

#: the full wire envelope
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("before", IMAGE_SCHEMA, True),
        T.StructField("after", IMAGE_SCHEMA, True),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("lsn", T.LongType(), True),
                    T.StructField("seq", T.LongType(), True),
                    T.StructField("table", T.StringType(), True),
                    T.StructField("schema_version", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Debezium op code → engine op. ``r`` (snapshot read) applies as an
#: insert: the initial-snapshot rows are upserts at the snapshot LSN.
_OP_TO_ENGINE = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}
_ENGINE_TO_OP = {"insert": "c", "update": "u", "delete": "d", "patch": "p"}


def _op_map_expr(mapping: dict[str, str]):
    pairs: list = []
    for k, v in sorted(mapping.items()):
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def parse_envelopes(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a column of JSON envelope strings into canonical event rows.

    Output columns match ``datagen.EVENT_SCHEMA`` minus the patch fields
    (wire CDC carries full images, not token splices). Contract for bad
    input — no row is ever lost at this layer:

    * malformed JSON → ``from_json`` yields a null struct → every output
      field null → fails ``invalid_event_cond`` downstream;
    * unknown op code → the op map yields null → same invalid path;
    * delete envelopes take ``doc_id`` from the ``before`` image and
      carry null payload columns (the engine writes a tombstone).
    """
    j = F.from_json(F.col(value_col), ENVELOPE_SCHEMA)
    op = F.element_at(_op_map_expr(_OP_TO_ENGINE), j["op"])
    # image the payload comes from: before for deletes, after otherwise
    img = F.when(j["op"] == "d", j["before"]).otherwise(j["after"])
    return raw.select(
        j["source"]["lsn"].alias("lsn"),
        img["doc_id"].alias("doc_id"),
        op.alias("op"),
        F.when(op == "delete", F.lit(None).cast(IMAGE_SCHEMA["tokens"].dataType))
        .otherwise(img["tokens"]).alias("tokens"),
        F.when(op == "delete", F.lit(None).cast("int"))
        .otherwise(img["n_tok"]).alias("n_tok"),
        F.when(op == "delete", F.lit(None).cast("string"))
        .otherwise(img["source"]).alias("source"),
        F.when(op == "delete", F.lit(None).cast("string"))
        .otherwise(img["lang"]).alias("lang"),
        j["source"]["schema_version"].alias("schema_version"),
        F.timestamp_millis(j["ts_ms"]).alias("ts"),
        j["source"]["seq"].alias("delivery_seq"),
    )


def render_envelopes(
    events: DataFrame,
    table: str = "training_sequences",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Serialize canonical event rows to wire JSON (inverse of
    :func:`parse_envelopes`) — one ``value: string`` column.

    Deletes put the key image in ``before`` and null ``after``;
    inserts/updates put the full payload in ``after`` and null
    ``before`` (the engine never consumes pre-images on upsert, so the
    wire stream omits them — the Debezium ``REPLICA IDENTITY DEFAULT``
    shape). ``ignoreNullFields`` stays OFF so null images serialize as
    explicit ``"after": null`` — parsers must not infer presence from
    key absence. ``keep_cols`` carries named event columns alongside
    ``value`` (for tests/harnesses that key per-row fault injection off
    the LSN; a real wire stream is value-only).
    """
    # refuse patch events up front (the redrive.py precedent): the wire
    # image struct carries no patch_start/patch_del, so a rendered
    # 'p' envelope would parse back with its splice offsets already
    # lost — silent, unrecoverable corruption of the patch stream. A
    # wire format for splices must extend IMAGE_SCHEMA first.
    if "op" in events.columns:
        n_patch = events.filter(F.col("op") == "patch").limit(1).count()
        if n_patch:
            raise ValueError(
                "render_envelopes cannot serialize op='patch' events: "
                "the wire image schema has no splice fields, so the "
                "patch offsets would be lost at render time"
            )
    image = F.struct(
        F.col("doc_id"),
        F.col("tokens"),
        F.col("n_tok"),
        F.col("source"),
        F.col("lang") if "lang" in events.columns
        else F.lit(None).cast("string").alias("lang"),
    )
    null_image = F.lit(None).cast(IMAGE_SCHEMA)
    is_del = F.col("op") == "delete"
    env = F.struct(
        F.element_at(_op_map_expr(_ENGINE_TO_OP), F.col("op")).alias("op"),
        # unix_millis, not unix_timestamp*1000: the latter truncates to
        # SECOND precision, so parse(render(ev)) would silently drift a
        # sub-second ts by up to 999 ms — breaking the documented
        # render/parse inverse
        # cast: unix_millis requires TIMESTAMP and the event ts may be
        # TIMESTAMP_NTZ (parquet default); session-tz interpretation is
        # symmetric with the parse side's cast back
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.when(is_del, image.cast(IMAGE_SCHEMA)).otherwise(null_image)
        .alias("before"),
        F.when(is_del, null_image).otherwise(image.cast(IMAGE_SCHEMA))
        .alias("after"),
        F.struct(
            F.col("lsn"),
            F.col("delivery_seq").alias("seq"),
            F.lit(table).alias("table"),
            F.col("schema_version"),
        ).alias("source"),
    )
    return events.select(
        *keep_cols,
        F.to_json(env, {"ignoreNullFields": "false"}).alias("value"),
    )
