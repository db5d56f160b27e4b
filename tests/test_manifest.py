"""File-manifest scan pruning: footer-derived stats must prune exactly
like the real file ranges, results must equal the unpruned filter, and
Z-order + manifest must compose (few files touched on either dim)."""

from pyspark.sql import functions as F

from etl_workflows_spark.sinks.layout import cluster_by_zorder
from etl_workflows_spark.sources.manifest import (
    build_manifest,
    pruned_paths,
    read_pruned,
)


def _grid(spark, n=20_000):
    return spark.range(n).select(
        "id",
        ((F.hash("id") % 1000 + 1000) % 1000).alias("x"),
        ((F.hash("id", F.lit(1)) % 1000 + 1000) % 1000).alias("y"),
    )


def test_manifest_stats_and_pruned_read_exact(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _grid(spark)
    cluster_by_zorder(df, ["x", "y"], 16, bits=10).write.parquet(path)

    man = build_manifest(spark, path, ["x", "y"])
    rows = man.collect()
    files = {r["path"] for r in rows}
    assert len(files) == 16
    assert {r["column"] for r in rows} == {"x", "y"}
    # per-file row counts sum to the table
    assert sum(r["n_rows"] for r in rows if r["column"] == "x") == 20_000

    preds = {"x": (0.0, 99.0), "y": (0.0, 99.0)}
    surviving = pruned_paths(man, preds)
    # z-order: a 10% box on both dims must exclude most files
    assert 0 < len(surviving) < 8

    got = read_pruned(spark, man, preds)
    want = df.filter((F.col("x").between(0, 99)) & (F.col("y").between(0, 99)))
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )


def test_manifest_never_wrong_only_overreads(spark, tmp_path):
    """A predicate disjoint from a file's range excludes it; a file
    containing matches always survives (no false negatives)."""
    path = str(tmp_path / "t2")
    df = _grid(spark, 5_000)
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(path)
    man = build_manifest(spark, path, ["x"])
    all_files = {r["path"] for r in man.collect()}
    surv = set(pruned_paths(man, {"x": (990.0, 999.0)}))
    assert surv < all_files
    # every row with x in range lives in a surviving file
    got = read_pruned(spark, man, {"x": (990.0, 999.0)}).count()
    want = df.filter(F.col("x").between(990, 999)).count()
    assert got == want


def test_manifest_empty_dir_and_no_survivors(spark, tmp_path):
    import pytest

    empty = tmp_path / "none"
    empty.mkdir()
    man = build_manifest(spark, str(empty), ["x"])
    assert man.count() == 0

    path = str(tmp_path / "t3")
    _grid(spark, 1_000).write.parquet(path)
    man = build_manifest(spark, path, ["x"])
    # no survivors → empty-but-typed result, same schema as the table
    got = read_pruned(spark, man, {"x": (5000.0, 6000.0)})
    assert got.count() == 0
    assert got.schema == spark.read.parquet(path).schema

    with pytest.raises(ValueError, match="manifest is empty"):
        read_pruned(spark, man.limit(0), {"x": (0.0, 1.0)})
