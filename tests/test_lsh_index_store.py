"""Persisted multi-table LSH index: write/read round-trip, partition
pruning of probe fetches, geometry-stable appends, and external-vector
serving — the LSH twin of the IVF persistence contract."""

from __future__ import annotations

import glob
import io
import os
import contextlib

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators import similarity as SIM
from etl_workflows_spark.queries.base import table

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"


@pytest.fixture(scope="module")
def stored(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lshidx") / "idx")
    emb = table(spark, SF_DIR, "embeddings")
    idx = SIM.build_ann_index_multi(emb, dim=64, n_planes=6, n_tables=3)
    SIM.write_lsh_index(idx, path, dim=64, n_planes=6, n_tables=3)
    return path, emb


def test_roundtrip_and_one_file_per_partition(spark, stored):
    path, emb = stored
    lists, meta = SIM.read_lsh_index(spark, path)
    assert meta == {"dim": 64, "n_planes": 6, "n_tables": 3}
    assert lists.count() == emb.count() * 3  # one row per (vector, table)
    parts = glob.glob(f"{path}/tables/table_id=*/bucket=*")
    files = glob.glob(f"{path}/tables/table_id=*/bucket=*/*.parquet")
    assert len(parts) == len(files)  # clustered: one file per partition


def test_stored_query_prunes_and_ranks_exactly(spark, stored):
    path, emb = stored
    qrow = emb.filter("vec_id = 0").collect()[0]
    res = SIM.ann_topk_lsh_stored(spark, path, qrow["embedding"], k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    rows = res.collect()
    # the query vector IS indexed: it must come back first at cos ~1
    assert rows[0]["vec_id"] == 0
    assert rows[0]["cos_sim"] == pytest.approx(1.0, abs=1e-9)
    # candidate cosines are exact: spot-check against brute force
    exact = {
        r["vec_id"]: r["cos_sim"]
        for r in SIM.ann_topk_bruteforce(emb, 0, k=50).collect()
    }
    for r in rows[1:]:
        assert r["cos_sim"] == pytest.approx(exact[r["vec_id"]], abs=1e-9)


def test_append_rehashes_with_stored_geometry(spark, stored):
    path, emb = stored
    # append exact copies of two indexed vectors under fresh ids: the
    # stored-geometry rehash must land them in the same buckets, so a
    # query for the source vector now finds the twin at cos ~1
    twins = emb.filter("vec_id in (3, 5)").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    SIM.lsh_append(twins, path)
    lists, _ = SIM.read_lsh_index(spark, path)
    assert lists.filter("vec_id >= 1000000").count() == 2 * 3
    qrow = emb.filter("vec_id = 3").collect()[0]
    rows = SIM.ann_topk_lsh_stored(spark, path, qrow["embedding"], k=3).collect()
    top2 = {r["vec_id"] for r in rows[:2]}
    assert top2 == {3, 1_000_003}
    assert rows[0]["cos_sim"] == pytest.approx(1.0, abs=1e-9)
    assert rows[1]["cos_sim"] == pytest.approx(1.0, abs=1e-9)


def test_dim_mismatch_raises(spark, stored):
    path, _ = stored
    with pytest.raises(ValueError, match="dim"):
        SIM.ann_topk_lsh_stored(spark, path, [0.1] * 8, k=3)


def test_compaction_rewrites_only_fragmented_partitions(spark, tmp_path):
    emb = table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "cidx")
    idx = SIM.build_ann_index_multi(emb, dim=64, n_planes=4, n_tables=2)
    SIM.write_lsh_index(idx, path, dim=64, n_planes=4, n_tables=2)
    before_rows = spark.read.parquet(f"{path}/tables").count()
    # 4 appends of the same two vectors: their buckets gain 4 extra files
    for b in range(4):
        SIM.lsh_append(
            emb.filter("vec_id in (1, 2)").select(
                (F.col("vec_id") + 1000 * (b + 1)).alias("vec_id"),
                "embedding",
            ),
            path,
        )
    def census():
        out = {}
        for part in glob.glob(f"{path}/tables/table_id=*/bucket=*"):
            key = part.split("tables/")[-1]
            out[key] = sorted(
                os.path.basename(f) for f in glob.glob(f"{part}/*.parquet")
            )
        return out

    pre = census()
    frag = {k for k, v in pre.items() if len(v) >= 4}
    quiet = {k for k, v in pre.items() if len(v) < 4}
    assert frag, "appends must have fragmented at least one partition"
    n = SIM.compact_lsh_index(spark, path, min_files=4)
    assert n == len(frag)
    post = census()
    for k in frag:
        assert len(post[k]) == 1, k  # fragmented partitions now one file
    for k in quiet:
        assert post[k] == pre[k], k  # untouched partitions not rewritten
    after = spark.read.parquet(f"{path}/tables")
    assert after.count() == before_rows + 4 * 2 * 2  # rows all survive
    # queries still find the appended twins at cos ~1
    qrow = emb.filter("vec_id = 1").collect()[0]
    rows = SIM.ann_topk_lsh_stored(spark, path, qrow["embedding"], k=5).collect()
    assert rows[0]["cos_sim"] == pytest.approx(1.0, abs=1e-9)
    assert {r["vec_id"] for r in rows[:5]} >= {1, 1001, 2001, 3001, 4001}
    # a second compaction is a no-op
    assert SIM.compact_lsh_index(spark, path, min_files=4) == 0


def test_ivf_compaction_roundtrip(spark, tmp_path):
    import math

    emb = table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivfc")
    index, cents = SIM.build_ivf_index(emb, n_lists=8)
    SIM.write_ivf_index(index, cents, path)
    for b in range(4):
        SIM.ivf_append(
            emb.limit(3).select(
                (F.col("vec_id") + 1000 * (b + 1)).alias("vec_id"),
                "embedding",
            ),
            path,
        )
    before = spark.read.parquet(f"{path}/lists").count()
    n = SIM.compact_ivf_index(spark, path, min_files=4)
    assert n >= 1
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.count() == before
    # every compacted list is one file now
    for part in glob.glob(f"{path}/lists/list_id=*"):
        files = glob.glob(f"{part}/*.parquet")
        assert len(files) <= 4
