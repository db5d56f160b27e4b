import pytest
from pyspark.sql import types as T

from etl_workflows_spark.exceptions import SchemaInvalid, SchemaNotFound
from etl_workflows_spark.schema.registry import (
    field_names,
    load_schema_file,
    parse_schema_doc,
    to_struct_type,
)


def test_yaml_schema_to_struct(fixtures_dir):
    doc = load_schema_file(str(fixtures_dir / "assets" / "cars_schema.yaml"))
    st = to_struct_type(doc)
    assert len(st.fields) == 9
    assert st["NAME"].dataType == T.StringType()
    assert st["MPG"].dataType == T.DoubleType()  # BQ FLOAT is float64
    assert st["CYLINDERS"].dataType == T.LongType()  # BQ INTEGER is 64-bit
    assert all(f.nullable for f in st.fields)
    assert field_names(doc)[0] == "NAME"


def test_json_schema_matches_yaml(fixtures_dir):
    y = load_schema_file(str(fixtures_dir / "assets" / "cars_schema.yaml"))
    j = load_schema_file(str(fixtures_dir / "assets" / "cars_schema.json"))
    assert to_struct_type(y) == to_struct_type(j)


def test_missing_schema_raises_404(fixtures_dir):
    with pytest.raises(SchemaNotFound):
        load_schema_file(str(fixtures_dir / "assets" / "nope.yaml"))


def test_bad_extension_raises_400(fixtures_dir):
    with pytest.raises(SchemaInvalid):
        load_schema_file(str(fixtures_dir / "assets" / "bad_schema.txt"))


def test_bad_shape_raises():
    with pytest.raises(SchemaInvalid):
        parse_schema_doc({"not_fields": []})
    with pytest.raises(SchemaInvalid):
        parse_schema_doc({"fields": [{"name": "x", "type": "NOT_A_TYPE"}]})


def test_modes():
    doc = parse_schema_doc(
        {
            "fields": [
                {"name": "a", "type": "STRING", "mode": "REQUIRED"},
                {"name": "b", "type": "INTEGER", "mode": "REPEATED"},
            ]
        }
    )
    st = to_struct_type(doc)
    assert not st["a"].nullable
    assert st["b"].dataType == T.ArrayType(T.LongType(), True)
