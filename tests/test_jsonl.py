"""JSONL source/sink: declared-schema discipline, corrupt-line contract,
unknown-field tolerance, gz roundtrip."""

import gzip

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_workflows_spark.sources.jsonl_source import read_jsonl, write_jsonl

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("meta", T.StructType([T.StructField("lang", T.StringType())])),
    ]
)

LINES = "\n".join(
    [
        '{"doc_id": 1, "text": "hello", "meta": {"lang": "en"}}',
        '{"doc_id": 2, "text": "salut", "meta": {"lang": "fr"}, "extra": 99}',
        "this is not json at all",
        '{"doc_id": 4, "text": "missing meta"}',
    ]
)


def test_read_jsonl_drops_corrupt_keeps_unknown_and_missing(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(LINES)
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 4}  # corrupt line dropped
    assert rows[2]["text"] == "salut"  # unknown field 'extra' ignored
    assert "extra" not in df.columns
    assert rows[4]["meta"] is None  # declared-but-missing -> NULL
    assert rows[1]["meta"]["lang"] == "en"


def test_read_jsonl_quarantine_mode(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(LINES)
    df = read_jsonl(spark, str(p), DOC_SCHEMA, keep_corrupt=True)
    bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "this is not json at all"
    assert bad[0]["doc_id"] is None


def test_read_jsonl_schema_doc_and_gz(spark, tmp_path):
    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 7, "text": "zipped"}\n')
    doc = {
        "fields": [
            {"name": "doc_id", "type": "INTEGER"},
            {"name": "text", "type": "STRING"},
        ]
    }
    rows = read_jsonl(spark, str(p), doc).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 7 and rows[0]["text"] == "zipped"


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    write_jsonl(docs, out, shards=4)
    back = read_jsonl(spark, out, docs.schema)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_read_jsonl_does_not_mutate_caller_schema(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text('{"doc_id": 1, "text": "x"}\n')
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    n_before = len(schema.fields)
    read_jsonl(spark, str(p), schema).collect()
    assert len(schema.fields) == n_before
