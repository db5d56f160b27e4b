"""Ingestion semantics: wire format, arity filter, per-cell coercion,
dispositions, templating, discovery, archival — FIXTURES.md F1/F2/F4."""

import datetime
import math

import pytest

from etl_workflows_spark.exceptions import CsvInvalid, CsvNotFound
from etl_workflows_spark.operators.coerce import coerce_columns
from etl_workflows_spark.schema.registry import parse_schema_doc
from etl_workflows_spark.sinks.writer import template_destination
from etl_workflows_spark.sources.csv_source import read_raw_csv
from etl_workflows_spark.sources.files import archive_processed, find_most_recent_csv

DIRTY_SCHEMA = parse_schema_doc(
    {
        "fields": [
            {"name": "s", "type": "STRING", "mode": "NULLABLE"},
            {"name": "i", "type": "INTEGER", "mode": "NULLABLE"},
            {"name": "f", "type": "FLOAT", "mode": "NULLABLE"},
            {"name": "t", "type": "TIMESTAMP", "mode": "NULLABLE"},
        ]
    }
)


def _clean_rows(spark, path):
    raw = read_raw_csv(spark, path, 4, skip_header=True)
    out = coerce_columns(raw, DIRTY_SCHEMA)
    return {r["s"]: r for r in out.collect()}


@pytest.mark.parametrize("ext", ["dirty_cars.csv", "dirty_cars.csv.gz"])
def test_dirty_cars_all_cleaner_branches(spark, fixtures_dir, ext):
    rows = _clean_rows(spark, str(fixtures_dir / ext))

    # arity-mismatch rows dropped (F2 rows e/f), 6 survivors incl. empty row
    assert len(rows) == 6
    assert "e" not in rows and "f" not in rows

    ok = rows["ok"]
    assert ok["i"] == 12 and ok["f"] == 1.5
    assert ok["t"] == datetime.datetime(2021, 6, 12, 8, 30, 0)

    a = rows["a"]  # int("12.5") fails; float("x") fails; no ts format
    assert a["i"] is None and a["f"] is None and a["t"] is None

    b = rows["b"]  # int(" 12 ") ok; float("1e3") ok; date-only format
    assert b["i"] == 12 and b["f"] == 1000.0
    assert b["t"] == datetime.datetime(2021, 6, 12, 0, 0, 0)

    c = rows["c"]  # float("inf") ok; d/M/yyyy day-first
    assert c["i"] == 7 and math.isinf(c["f"]) and c["f"] > 0
    assert c["t"] == datetime.datetime(2021, 6, 12, 0, 0, 0)

    d = rows["d"]  # compact yyyyMMdd
    assert d["t"] == datetime.datetime(2021, 6, 12, 0, 0, 0)

    empty = rows[""]  # empty STRING stays '', other types NULL
    assert empty["s"] == "" and empty["i"] is None and empty["f"] is None


def test_no_header_variant(spark, fixtures_dir, tmp_path):
    p = tmp_path / "nohdr.csv"
    p.write_text("x;1;2.5;2021-01-02", encoding="ISO-8859-1")
    raw = read_raw_csv(spark, str(p), 4, skip_header=False)
    out = coerce_columns(raw, DIRTY_SCHEMA).collect()
    assert len(out) == 1 and out[0]["i"] == 1


def test_escaped_delimiter(spark, tmp_path):
    """QUOTE_NONE + backslash escape: 'a\\;b' is one token (main.py:93)."""
    p = tmp_path / "esc.csv"
    p.write_text("a\\;b;2\nplain;3", encoding="ISO-8859-1")
    schema = parse_schema_doc(
        {
            "fields": [
                {"name": "s", "type": "STRING"},
                {"name": "i", "type": "INTEGER"},
            ]
        }
    )
    raw = read_raw_csv(spark, str(p), 2, skip_header=False)
    rows = {r["s"]: r for r in coerce_columns(raw, schema).collect()}
    assert rows["a;b"]["i"] == 2
    assert rows["plain"]["i"] == 3


def test_find_most_recent_is_lexicographic_name_max(spark, tmp_path):
    b = tmp_path / "bucket"
    b.mkdir()
    (b / "cars_202108.csv").write_text("x")
    newest = b / "cars_202109.csv"
    newest.write_text("y")
    # mtime deliberately reversed: name-max must still win (main.py:72)
    import os

    os.utime(newest, (0, 0))
    assert find_most_recent_csv(spark, str(b), "cars_").endswith("cars_202109.csv")


def test_discovery_errors(spark, tmp_path):
    b = tmp_path / "bucket"
    b.mkdir()
    with pytest.raises(CsvNotFound):
        find_most_recent_csv(spark, str(b), "cars_")
    (b / "cars_zzz.txt").write_text("x")
    with pytest.raises(CsvInvalid):
        find_most_recent_csv(spark, str(b), "cars_")


def test_archive(spark, tmp_path):
    b = tmp_path / "bucket"
    b.mkdir()
    (b / "cars_1.csv").write_text("x")
    (b / "FIXED_cars_1.csv").write_text("y")
    (b / "other.csv").write_text("z")
    archived = archive_processed(spark, str(b), "cars_")
    assert sorted(archived) == ["FIXED_cars_1.csv", "cars_1.csv"]
    assert (b / "ARCHIVED" / "cars_1.csv").exists()
    assert (b / "other.csv").exists()
    # idempotent: nothing left to archive
    assert archive_processed(spark, str(b), "cars_") == []


def test_destination_templating():
    # F4: file cars_202109.csv + dest ds.cars_{5:11} => ds.cars_202109
    assert template_destination("ds.cars_{5:11}", "cars_202109.csv") == "ds.cars_202109"
    assert template_destination("ds.cars", "cars_202109.csv") == "ds.cars"
    assert (
        template_destination("ds.t_{0:4}_{5:11}", "cars_202109.csv") == "ds.t_cars_202109"
    )


def test_archive_overwrites_redelivered_name(spark, tmp_path):
    """A re-delivered filename must archive (overwrite) rather than wedge
    the incremental loop."""
    b = tmp_path / "bucket"
    b.mkdir()
    (b / "cars_1.csv").write_text("old")
    archive_processed(spark, str(b), "cars_")
    (b / "cars_1.csv").write_text("new")
    archived = archive_processed(spark, str(b), "cars_")
    assert archived == ["cars_1.csv"]
    assert not (b / "cars_1.csv").exists()
    assert (b / "ARCHIVED" / "cars_1.csv").read_text() == "new"


def test_audited_read_quarantines_arity_violations(spark, fixtures_dir):
    """read_raw_csv_audited: clean side byte-identical to read_raw_csv,
    reject side carries exactly the arity-violating raw lines."""
    from etl_workflows_spark.sources.csv_source import (
        read_raw_csv,
        read_raw_csv_audited,
    )

    path = str(fixtures_dir / "dirty_cars.csv")
    clean, rejects = read_raw_csv_audited(spark, path, 4)
    silent = read_raw_csv(spark, path, 4)
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, silent.collect())
    )
    got = sorted(r["line"] for r in rejects.collect())
    assert got == ["e;9;3.5", "f;1;2;3;extra"]  # F2 rows e (3) and f (5)
