"""Row-level file provenance via the file source's ``_metadata`` column.

The reference's audit trail is file-level (ARCHIVED/ renames + FIXED_
staging copies); at corpus scale the question "which shard produced this
row, and where in it" must be answerable per ROW — that is how a bad
shard gets quarantined, a partial re-ingest gets scoped, and a training
example gets traced back to its crawl file.

Spark's hidden ``_metadata`` struct provides exactly this from the scan
itself — no extra pass, no UDF, constant-foldable (file_path/file_size
come from the file index; row_index from the reader) — so provenance is
FREE at read time but impossible to reconstruct later: capture it at
ingestion or lose it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROVENANCE_COLS = ("src_file", "src_file_size", "src_mtime", "src_row_index")


def with_provenance(df: DataFrame) -> DataFrame:
    """Attach (src_file, src_file_size, src_mtime, src_row_index) to a
    file-sourced DataFrame. Must be called on the SCAN relation (before
    joins/aggs drop the hidden column); raises a clear error otherwise."""
    try:
        return df.select(
            "*",
            F.col("_metadata.file_path").alias("src_file"),
            F.col("_metadata.file_size").alias("src_file_size"),
            F.col("_metadata.file_modification_time").alias("src_mtime"),
            F.col("_metadata.row_index").alias("src_row_index"),
        )
    except Exception as exc:  # AnalysisException: no _metadata here
        raise ValueError(
            "with_provenance must be applied directly to a file-source "
            "scan (spark.read.parquet/json/csv...): the hidden _metadata "
            "column does not survive joins, aggregations, or table reads"
        ) from exc


def read_with_provenance(
    spark: SparkSession, path: str, file_format: str = "parquet"
) -> DataFrame:
    """Read ``path`` with provenance columns attached — the ingestion
    entry point for audit-traceable corpora."""
    return with_provenance(spark.read.format(file_format).load(path))


def file_audit(df_with_prov: DataFrame) -> DataFrame:
    """Per-source-file audit from a provenance-carrying relation: row
    count, contiguous-row check (max row_index + 1 == rows ⇔ nothing
    dropped between read and audit), byte size. One agg, shuffles
    #files rows."""
    return (
        df_with_prov.groupBy("src_file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("src_row_index") + 1).alias("max_index_plus1"),
            F.first("src_file_size").alias("file_bytes"),
        )
        .withColumn(
            "contiguous", F.col("n_rows") == F.col("max_index_plus1")
        )
    )
