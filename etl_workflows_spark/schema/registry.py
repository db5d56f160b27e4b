"""Schema registry: external YAML/JSON schema documents → Spark StructType.

The reference declares table schemas externally as BigQuery-style field
lists and *never infers* (reference functions/load_csv/main.py:49-53 parses,
:140-154 fetches, assets/cars_schema.yaml is the shipped example). We keep
that discipline: schemas are declared, parsed into ``StructType``, and CSV
columns are bound positionally (header names are discarded — reference
main.py:95-96).

Document shape (same as the reference's)::

    fields:
      - name: NAME
        type: STRING        # STRING | INTEGER | FLOAT | TIMESTAMP | ...
        mode: NULLABLE      # NULLABLE | REQUIRED | REPEATED

Type mapping (BigQuery type → Spark type) per SURVEY.md §1.2; INTEGER is
64-bit and FLOAT is float64 in BigQuery, hence Long/Double.
"""

from __future__ import annotations

import json
import os
from typing import Any

import yaml
from pyspark.sql import types as T

from etl_workflows_spark.exceptions import SchemaInvalid, SchemaNotFound

# BQ type name → Spark type. The reference exercises STRING/INTEGER/FLOAT
# (assets/cars_schema.yaml) and TIMESTAMP (main.py:29,121-130); the rest are
# standard BigQuery types accepted for completeness.
_BQ_TO_SPARK: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 18),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "DATETIME": T.TimestampType(),
    "TIME": T.StringType(),
    "BYTES": T.BinaryType(),
    "JSON": T.StringType(),
}


def load_schema_file(path: str) -> dict[str, Any]:
    """Fetch + parse a schema document from a path.

    Mirrors the reference's extension and existence checks
    (functions/load_csv/main.py:140-154): missing → SchemaNotFound(404),
    extension not .yaml/.json → SchemaInvalid(400).
    """
    if not os.path.exists(path):
        raise SchemaNotFound()
    if not (path.endswith(".yaml") or path.endswith(".json")):
        raise SchemaInvalid()
    with open(path, "r") as f:
        if path.endswith(".yaml"):
            doc = yaml.safe_load(f)
        else:
            doc = json.load(f)
    return parse_schema_doc(doc)


def parse_schema_doc(doc: Any) -> dict[str, Any]:
    """Validate the parsed document shape; raise SchemaInvalid on nonsense."""
    if not isinstance(doc, dict) or "fields" not in doc or not isinstance(doc["fields"], list):
        raise SchemaInvalid()
    for field in doc["fields"]:
        if not isinstance(field, dict) or "name" not in field or "type" not in field:
            raise SchemaInvalid()
        if str(field["type"]).upper() not in _BQ_TO_SPARK:
            raise SchemaInvalid()
        # modes are validated as strictly as types: a typo'd 'REQIRED'
        # silently degrading to NULLABLE would load data under the wrong
        # constraints with no error
        if str(field.get("mode", "NULLABLE")).upper() not in (
            "NULLABLE",
            "REQUIRED",
            "REPEATED",
        ):
            raise SchemaInvalid()
    return doc


def to_struct_type(doc: dict[str, Any]) -> T.StructType:
    """BQ-style field list → StructType.

    mode NULLABLE → nullable, REQUIRED → non-nullable, REPEATED → array of
    the element type (accepted-but-unexercised in the reference, see
    main.py:160 passing mode through to SchemaField).
    """
    struct_fields = []
    for field in doc["fields"]:
        base = _BQ_TO_SPARK[str(field["type"]).upper()]
        mode = str(field.get("mode", "NULLABLE")).upper()
        if mode == "REPEATED":
            dtype: T.DataType = T.ArrayType(base, containsNull=True)
            nullable = True
        else:
            dtype = base
            nullable = mode != "REQUIRED"
        struct_fields.append(T.StructField(field["name"], dtype, nullable))
    return T.StructType(struct_fields)


def field_names(doc: dict[str, Any]) -> list[str]:
    return [f["name"] for f in doc["fields"]]


