"""Product quantization: deterministic training, code compactness, ADC
recall vs the brute-force twin, reconstruction-error monotonicity in k,
and the JVM-only ADC scan plan."""

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators import pq
from etl_workflows_spark.operators.similarity import ann_topk_bruteforce


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_train_deterministic_and_shapes(spark, emb):
    b1 = pq.train_pq_codebooks(emb, m=8, k=16, iterations=1)
    b2 = pq.train_pq_codebooks(emb, m=8, k=16, iterations=1)
    assert b1 == b2
    assert len(b1) == 8 and all(len(b) == 16 for b in b1)
    assert all(len(c) == 8 for b in b1 for c in b)  # 64/8 dims per subvector


def test_encode_codes_compact_and_total(spark, emb):
    books = pq.train_pq_codebooks(emb, m=8, k=16, iterations=1)
    codes = pq.pq_encode(emb, books)
    n = emb.count()
    assert codes.count() == n
    stats = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("m_lo"),
        F.max(F.size("codes")).alias("m_hi"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] <= 15
    assert stats["m_lo"] == stats["m_hi"] == 8


def test_adc_recall_beats_random_and_finds_self(spark, emb):
    books = pq.train_pq_codebooks(emb, m=8, k=16, iterations=2)
    codes = pq.pq_encode(emb, books)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = pq.pq_adc_topk(spark, codes, books, qv, k=20)
    ids = [r["vec_id"] for r in got.collect()]
    assert len(ids) == 20
    assert 0 in ids[:3]  # the query vector itself must score near the top
    exact = {
        r["vec_id"] for r in ann_topk_bruteforce(emb, query_vec_id=0, k=20).collect()
    }
    recall = len(exact & set(ids)) / 20
    n = emb.count()
    assert recall >= 0.25, recall  # random would be ~20/n = {:.3f}".format(20/n)
    assert recall > 3 * (20 / n)


def test_reconstruction_error_falls_with_k(spark, emb):
    errs = [
        pq.pq_reconstruction_error(
            emb, pq.train_pq_codebooks(emb, m=8, k=k, iterations=2)
        )
        for k in (4, 16)
    ]
    assert errs[1] < errs[0], errs
    assert errs[1] >= 0.0


def test_adc_scan_plan_is_jvm_only(spark, emb, tmp_path):
    """The scan side of the ADC top-k must be pure JVM (broadcast join +
    hash agg + TakeOrdered) — no Python evaluation touches the persisted
    code table."""
    books = pq.train_pq_codebooks(emb, m=8, k=16, iterations=1)
    path = str(tmp_path / "codes")
    pq.pq_encode(emb, books).write.parquet(path)
    codes = spark.read.parquet(path)
    qv = [1.0] * 64
    out = pq.pq_adc_topk(spark, codes, books, qv, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 5


def test_pq_index_roundtrip_and_append(spark, emb, tmp_path):
    """Persisted PQ index: codebooks round-trip exactly, appended vectors
    encode against the frozen books, existing code files untouched, and
    the ADC scan works off the re-read pair alone."""
    import os

    first = emb.filter(F.col("vec_id") < 400)
    rest = emb.filter(F.col("vec_id") >= 400)
    books = pq.train_pq_codebooks(first, m=4, k=8, iterations=2)
    codes = pq.pq_encode(first, books)
    path = str(tmp_path / "pqidx")
    pq.write_pq_index(codes, books, path)

    before = sorted(os.listdir(f"{path}/codes"))
    pq.pq_append(rest, path)
    after = sorted(os.listdir(f"{path}/codes"))
    assert set(f for f in before if f.endswith(".parquet")) <= set(after)

    codes2, books2 = pq.read_pq_index(spark, path)
    assert books2 == [[[float(x) for x in c] for c in b] for b in books]
    assert codes2.count() == emb.count()
    # appended rows carry exactly the frozen-book encoding
    exp = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq.pq_encode(rest, books)
        .select("vec_id", "codes")
        .collect()
    }
    got = {
        (r["vec_id"], tuple(r["codes"]))
        for r in codes2.filter(F.col("vec_id") >= 400)
        .select("vec_id", "codes")
        .collect()
    }
    assert got == exp
    # end-to-end: ADC top-k over the re-read index
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 450).first()["embedding"]]
    res = pq.pq_adc_topk(spark, codes2, books2, qv, k=5)
    assert res.count() == 5
