"""The Arrow simhash kernel must be md5-exact vs the Catalyst fold.

``simhash_fingerprints`` computes fingerprints in a vectorized Arrow
kernel (md5 once per distinct token with a per-task memo, numpy vote
matrix); ``simhash_bits`` remains the Column-level expression form the
DuckDB oracles replay. Every banded near-dup path and the oracle-pinned
``simhash_fingerprints`` catalog entry rest on the two producing the
SAME longs — these tests pin that across widths and the edge cases the
expression semantics encode (NULL → 0, '' → one empty-string token,
multi-space runs keep empty tokens, unicode md5 over UTF-8 bytes).
"""

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.dedup import (
    _simhash_kernel_udf,
    simhash_bits,
    simhash_fingerprints,
)

EDGE_ROWS = [
    (1, "a b c d"),
    (2, None),
    (3, ""),
    (4, "  double  spaces  "),
    (5, "unicode tökens日本語 mixed"),
    (6, "x " * 200),
    (7, "single"),
    (8, "a a a b b c"),
    (9, " "),
    (10, "tab\tand\nnewline stay one token each"),
]


@pytest.mark.parametrize("bits", [1, 16, 48, 62])
def test_kernel_matches_fold_on_edges(spark, bits):
    docs = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    fold = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", simhash_bits("text", bits).alias("sh")
        ).collect()
    }
    kern = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs, bits=bits).collect()
    }
    assert fold == kern


def test_kernel_matches_fold_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    for bits in (16, 48):
        joined = (
            docs.select(
                "doc_id", simhash_bits("text", bits).alias("fold")
            )
            .join(simhash_fingerprints(docs, bits=bits), "doc_id")
            .filter(F.col("fold") != F.col("simhash"))
        )
        assert joined.count() == 0, f"bits={bits}"


def test_null_text_fingerprints_zero(spark):
    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    [row] = simhash_fingerprints(docs, bits=48).collect()
    assert row["simhash"] == 0


def test_kernel_udf_plans_as_arrow_eval(spark):
    docs = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    plan = simhash_fingerprints(docs, bits=16)._jdf.queryExecution().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
