"""Raw CSV reader replicating the reference's wire format and row discipline.

Wire format (reference functions/load_csv/main.py:23,92-96):
  * delimiter ``;``
  * NO quoting (``csv.QUOTE_NONE``) with backslash escape
  * encoding ISO-8859-1
  * transparent gzip by ``.gz`` extension
  * optional header line, which is *discarded* — column binding is purely
    positional against the declared schema order (SURVEY.md §1.3)

Row discipline (main.py:101-103): a row whose field count differs from the
declared schema's field count is silently dropped; surviving rows keep every
cell as a raw string for expression-level coercion (operators/coerce.py).

Two-stage implementation:

1. **Line scan (JVM)** — Spark's CSV reader with a separator byte that never
   occurs in text data (``\\x01``), so each physical line arrives as one
   string column. This keeps gzip decompression, ISO-8859-1 decoding,
   per-file header skipping, file-glob parallelism, and line-level split
   parallelism on the JVM fast path.
2. **Tokenize (Arrow-batched Python)** — ``mapInPandas`` feeds line batches
   through ``csv.reader`` with the exact reference dialect
   (``delimiter=';', QUOTE_NONE, escapechar='\\'``). Exactness is the point:
   Spark's univocity parser cannot express "unquoted empty token is an empty
   string but a *missing* token is an arity violation" — both parse to NULL
   — and the arity filter (len(row) != n → drop) is the reference's core row
   discipline. The tokenizer is the only Python stage in ingestion and is
   Arrow-batched; coercion stays in Catalyst expressions.

At 100 TB scale ingestion arrives as many files; stage 1 parallelizes by
file and by split inside uncompressed files, so the Python stage scales
horizontally with executors exactly like a Pandas-UDF pipeline stage.
"""

from __future__ import annotations

import csv
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENCODING = "ISO-8859-1"
# Never appears in ISO-8859-1 text data → whole line parses as one token.
_LINE_SEP = "\x01"


LINE_SCHEMA = T.StructType([T.StructField("line", T.StringType(), True)])


def line_reader_options(skip_header: bool = True) -> dict[str, str]:
    """The line-scan reader options, shared by batch and streaming reads —
    one definition so the two paths can never drift."""
    return {
        "sep": _LINE_SEP,
        "quote": "",
        "escape": _LINE_SEP,  # neutralized: nothing on the wire matches
        "encoding": ENCODING,
        "header": str(skip_header).lower(),
        "enforceSchema": "true",
        "mode": "PERMISSIVE",
    }


def make_tokenizer(n_fields: int):
    """Arrow-batched exact-dialect tokenizer + its output schema.

    Returns ``(fn, schema)`` for ``mapInPandas`` — the single definition of
    the reference CSV dialect (``delimiter=';'``, QUOTE_NONE,
    ``escapechar='\\'``, reference main.py:93) and the arity filter
    (main.py:101-103), used verbatim by batch AND streaming ingestion.
    """
    out_schema = T.StructType(
        [T.StructField(f"c{i}", T.StringType(), True) for i in range(n_fields)]
    )
    cols = [f"c{i}" for i in range(n_fields)]

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # line-at-a-time, NOT one reader over the whole batch: a line
            # ending in a dangling escapechar makes csv.reader consume
            # the NEXT line into the same record, so batch/partition
            # boundaries would change row output nondeterministically
            # (and diverge from the line-at-a-time audit twin below)
            rows = []
            for s in pdf["line"]:
                if s is None:
                    continue
                for row in csv.reader(
                    [s],
                    delimiter=";",
                    quoting=csv.QUOTE_NONE,
                    escapechar="\\",
                ):
                    if len(row) == n_fields:
                        rows.append(row)
            yield pd.DataFrame(rows, columns=cols, dtype=object)

    return tokenize, out_schema


def make_auditing_tokenizer(n_fields: int):
    """The tokenizer's AUDIT twin: same dialect, but arity-violating
    lines are kept with their raw text in a ``__reject_line`` column
    (clean rows carry NULL there) instead of vanishing. The reference's
    contract is the silent drop (main.py:101-103) and ``read_raw_csv``
    preserves it; this exists for the operational question the silent
    drop cannot answer — WHAT was dropped, and did the rate spike.

    Tokenizes line-at-a-time (the raw line must stay paired with its
    parse), so it is the slower path — use for quarantine jobs and
    drop-rate monitors, not the hot load."""
    out_schema = T.StructType(
        [T.StructField(f"c{i}", T.StringType(), True) for i in range(n_fields)]
        + [T.StructField("__reject_line", T.StringType(), True)]
    )
    cols = [f"c{i}" for i in range(n_fields)] + ["__reject_line"]

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for s in pdf["line"]:
                if s is None:
                    continue
                parsed = next(
                    csv.reader(
                        [s],
                        delimiter=";",
                        quoting=csv.QUOTE_NONE,
                        escapechar="\\",
                    ),
                    [],
                )
                if len(parsed) == n_fields:
                    rows.append(parsed + [None])
                else:
                    rows.append([None] * n_fields + [s])
            yield pd.DataFrame(rows, columns=cols, dtype=object)

    return tokenize, out_schema


def read_raw_csv_audited(
    spark: SparkSession,
    path: str,
    n_fields: int,
    skip_header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejects): clean equals ``read_raw_csv``'s output exactly;
    rejects is one ``line`` column of the arity-violating raw lines.
    Both derive from ONE audited relation — persist it upstream if both
    sides will be consumed, or accept the double scan."""
    lines = read_lines(spark, path, skip_header=skip_header)
    tokenize, out_schema = make_auditing_tokenizer(n_fields)
    audited = lines.mapInPandas(tokenize, schema=out_schema)
    clean = audited.filter(F.col("__reject_line").isNull()).drop(
        "__reject_line"
    )
    rejects = audited.filter(F.col("__reject_line").isNotNull()).select(
        F.col("__reject_line").alias("line")
    )
    return clean, rejects


def read_lines(
    spark: SparkSession, path: str, skip_header: bool = True
) -> DataFrame:
    """Read physical lines of ``path`` (or glob) as a one-column DataFrame.

    Uses the CSV datasource (not ``text``) because only it supports
    ``encoding`` and per-file header skipping.
    """
    return spark.read.schema(LINE_SCHEMA).options(
        **line_reader_options(skip_header)
    ).csv(path)


def read_raw_csv(
    spark: SparkSession,
    path: str,
    n_fields: int,
    skip_header: bool = True,
) -> DataFrame:
    """Read ``path`` as ``n_fields`` raw string columns ``c0..c{n-1}``,
    dropping rows whose token count differs from ``n_fields``."""
    lines = read_lines(spark, path, skip_header=skip_header)
    tokenize, out_schema = make_tokenizer(n_fields)
    return lines.mapInPandas(tokenize, schema=out_schema)
