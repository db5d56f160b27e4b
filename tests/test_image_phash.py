"""Perceptual-hash image dedup: near-identical images must collide within
a few bits, unrelated images must not, and the banded pair generation
must find exactly the pairs the exact Hamming filter accepts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.multimodal import (
    image_near_dup_pairs,
    image_phash,
)


def _img_rows(spark, specs):
    """specs: list of (origin, HxWx3 uint8 array) → flat decoded schema."""
    rows = [
        (origin, int(a.shape[1]), int(a.shape[0]), 3, bytearray(a.tobytes()))
        for origin, a in specs
    ]
    return spark.createDataFrame(
        rows, "origin string, width int, height int, nChannels int, data binary"
    )


def _noise(seed, h=64, w=64):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_phash_near_dup_vs_unrelated(spark):
    base = _noise(1)
    tweaked = base.copy()
    tweaked[:4, :4] = 255  # small local edit
    other = _noise(2)
    df = _img_rows(spark, [("a", base), ("a2", tweaked), ("z", other)])
    hashes = image_phash(df)
    vals = {r["origin"]: r["phash"] for r in hashes.collect()}
    assert all(v is not None for v in vals.values())

    def ham(x, y):
        return bin(x ^ y).count("1")

    assert ham(vals["a"], vals["a2"]) <= 6
    assert ham(vals["a"], vals["z"]) > 10

    pairs = {
        (r["origin_a"], r["origin_b"]): r["hamming"]
        for r in image_near_dup_pairs(hashes, max_hamming=6).collect()
    }
    assert ("a", "a2") in pairs
    assert ("a", "z") not in pairs


def test_phash_deterministic_and_banding_complete(spark):
    imgs = [(f"i{k}", _noise(k)) for k in range(10)]
    df = _img_rows(spark, imgs)
    h1 = {r["origin"]: r["phash"] for r in image_phash(df).collect()}
    h2 = {r["origin"]: r["phash"] for r in image_phash(df).collect()}
    assert h1 == h2
    # banded pairs == brute-force pairs at the same threshold
    hashes = image_phash(df)
    got = {
        (r["origin_a"], r["origin_b"])
        for r in image_near_dup_pairs(hashes, max_hamming=15).collect()
    }
    names = sorted(h1)
    want = {
        (x, y)
        for i, x in enumerate(names)
        for y in names[i + 1 :]
        if bin(h1[x] ^ h1[y]).count("1") <= 15
    }
    assert got == want


def test_phash_accepts_jvm_image_schema(spark, tmp_path):
    from tests.test_multimodal import _make_png

    from etl_workflows_spark.operators.multimodal import read_images

    _make_png(tmp_path / "g.png", 16, 16, (128, 64, 32))
    imgs = read_images(spark, str(tmp_path))
    out = image_phash(imgs).collect()
    assert len(out) == 1 and out[0]["phash"] is not None


def test_near_dup_pairs_rejects_bad_threshold(spark):
    df = _img_rows(spark, [("a", _noise(1))])
    with pytest.raises(ValueError):
        image_near_dup_pairs(image_phash(df), max_hamming=64)


def test_banding_finds_pairs_spread_across_quarters(spark):
    """Regression: differing bits spread 2+2+1+1 over the four 16-bit
    quarters defeat a fixed 4-band layout (no quarter agrees) but must
    still be found — the band count scales with max_hamming+1."""
    base = 0x5A5A_3C3C_0F0F_7E7E
    # flip 6 bits: two in each of bits[0:16], bits[16:32], one in
    # bits[32:48], one in bits[48:63]
    flips = (1 << 0) | (1 << 7) | (1 << 17) | (1 << 29) | (1 << 40) | (1 << 60)
    other = base ^ flips
    assert bin(flips).count("1") == 6
    df = spark.createDataFrame(
        [("a", base), ("b", other)], "origin string, phash long"
    )
    got = {
        (r["origin_a"], r["origin_b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert got == {("a", "b"): 6}
    # one bit past the threshold → excluded by the exact verify
    df2 = spark.createDataFrame(
        [("a", base), ("b", other ^ (1 << 50))], "origin string, phash long"
    )
    assert image_near_dup_pairs(df2, max_hamming=6).count() == 0
