"""JSONL (newline-delimited JSON) source and sink.

The reference ingests only CSV (SURVEY.md §2.1), but the north-star
training-data pipeline's interchange format is JSONL shards — documents
with nested metadata, one object per line, usually gzip-compressed. Same
schema discipline as CSV ingestion (SURVEY.md §1.3): the schema is
DECLARED, never inferred — inference is a full extra pass over 100 TB and
yields drifting types across shards.

Malformed-line semantics mirror the CSV arity filter (reference
main.py:101-103): a line that does not parse against the declared schema
is dropped silently by default, or kept in a ``_corrupt_record`` column
for quarantine when ``keep_corrupt=True``. Fields present in the data but
absent from the schema are ignored (the reference's
``ignore_unknown_values``); declared-but-missing fields are NULL.

Scale: the JSON datasource is a first-class Spark file source — splittable
for uncompressed files, one-task-per-file for .gz shards (so shard your
corpus; 100-500 MB gz shards keep 1000 executors busy), predicate/column
pruning apply post-parse, and the same path works in ``readStream`` for
incremental corpus drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_workflows_spark.schema.registry import parse_schema_doc, to_struct_type

_CORRUPT = "_corrupt_record"


def _resolve_schema(schema) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return to_struct_type(parse_schema_doc(schema))


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL at ``path`` (file/dir/glob; ``.gz`` transparent) against
    a declared schema (``StructType`` or a schema-registry doc).

    Default: unparseable lines are dropped (the CSV arity-filter
    contract). ``keep_corrupt=True`` instead keeps them with the raw line
    in a ``_corrupt_record`` column — split quarantine rows on
    ``_corrupt_record IS NOT NULL`` (NOT on all-fields-null: PERMISSIVE
    mode keeps any field that parsed before the failure, so a
    type-mismatch row can carry the raw line AND populated columns).
    """
    declared = _resolve_schema(schema)
    if not keep_corrupt:
        # DROPMALFORMED is the engine-native form of the CSV arity filter —
        # no corrupt column materialized (Spark forbids queries that touch
        # ONLY _corrupt_record on raw JSON, so filtering it out post-hoc is
        # a trap; let the parser drop).
        return (
            spark.read.schema(declared)
            .option("mode", "DROPMALFORMED")
            .json(path)
        )
    # fresh StructType: .add() MUTATES the receiver in pyspark 4.1 — never
    # append to a caller-supplied schema object
    with_corrupt = T.StructType(
        [*declared.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def write_jsonl(
    df: DataFrame, path: str, compression: str = "gzip", shards: int | None = None
) -> None:
    """Write ``df`` as JSONL shards (default gzip). ``shards`` controls
    output file count — size shards for the *reader* (100-500 MB gz), not
    the writer."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").option("compression", compression).json(path)
