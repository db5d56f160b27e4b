"""Z-order layout: correctness (pure re-layout) + measured data-skipping.

The skipping test is the point: after clustering on (x, y), a filter on y
alone must touch far fewer files than the linear-sort-on-x baseline —
min-max pruning works on BOTH dimensions, which is the entire reason to
Z-order. Verified against real parquet footer statistics via pyarrow, the
same stats Spark's parquet reader prunes with.
"""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_workflows_spark.sinks.layout import cluster_by_zorder, zorder_key


def _grid_df(spark, n=40_000):
    # two independent uniform dims — the adversarial case for 1-D sort
    return spark.range(n).select(
        F.col("id"),
        (F.hash(F.col("id")) % 1000 + 1000) % 1000,
        (F.hash(F.col("id"), F.lit(1)) % 1000 + 1000) % 1000,
    ).toDF("id", "x", "y")


def _files_overlapping(path, col, lo, hi):
    """Files whose footer min-max for `col` intersects [lo, hi] — the set
    a stats-pruning reader must touch."""
    ds = pq.ParquetDataset(path)
    hit = 0
    for frag in ds.fragments:
        md = frag.metadata
        fmn = min(
            md.row_group(i).column(_ci(md, col)).statistics.min
            for i in range(md.num_row_groups)
        )
        fmx = max(
            md.row_group(i).column(_ci(md, col)).statistics.max
            for i in range(md.num_row_groups)
        )
        if fmx >= lo and fmn <= hi:
            hit += 1
    return hit, len(ds.fragments)


def _ci(md, name):
    sch = md.schema
    for i in range(len(sch)):
        if sch.column(i).name == name:
            return i
    raise KeyError(name)


def test_zorder_prunes_both_dims(spark, tmp_path):
    df = _grid_df(spark)
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    nfiles = 16
    # baseline: classic single-column range sort
    df.repartitionByRange(nfiles, "x").sortWithinPartitions("x").write.parquet(linear)
    cluster_by_zorder(df, ["x", "y"], nfiles, bits=10).write.parquet(zord)

    lo, hi = 0, 99  # 10% box on each dim
    lin_x, lin_n = _files_overlapping(linear, "x", lo, hi)
    z_x, z_n = _files_overlapping(zord, "x", lo, hi)
    lin_y, _ = _files_overlapping(linear, "y", lo, hi)
    z_y, _ = _files_overlapping(zord, "y", lo, hi)

    # linear layout: perfect on x, useless on y (every file spans all y)
    assert lin_x <= 3
    assert lin_y == lin_n
    # z-order: strong pruning on BOTH dims — the 10% box should exclude
    # most files on either dimension alone
    assert z_x <= z_n // 2, (z_x, z_n)
    assert z_y <= z_n // 2, (z_y, z_n)


def test_zorder_is_pure_relayout(spark, tmp_path):
    df = _grid_df(spark, n=5_000)
    out = cluster_by_zorder(df, ["x", "y"], 4, bits=8)
    assert out.columns == df.columns
    assert out.count() == 5_000
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in out.collect()}
    assert a == b


def test_zorder_key_handles_nulls_and_constant_cols(spark):
    df = spark.createDataFrame(
        [(1, None, 7.0), (2, 5, 7.0), (3, 9, 7.0)], "id long, x long, y double"
    )
    keyed, key = zorder_key(df, ["x", "y"], bits=8)
    rows = keyed.collect()
    assert all(r[key] is not None and r[key] >= 0 for r in rows)
