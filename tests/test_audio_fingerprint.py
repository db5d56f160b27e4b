"""Audio fingerprinting (operators/multimodal.py): gain-invariant 63-bit
clip hashes, banded exact-recall near-dup pairing."""

from __future__ import annotations

import io
import math
import struct
import wave as wave_mod

import pytest

from etl_workflows_spark.operators import multimodal


def _wav_bytes(freqs, n_frames=4096, sr=8000, amp=9000, noise=0, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    t = np.arange(n_frames) / sr
    x = sum(amp / len(freqs) * np.sin(2 * math.pi * f * t) for f in freqs)
    if noise:
        x = x + rng.normal(0, noise, n_frames)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            b"".join(struct.pack("<h", int(v)) for v in np.clip(x, -32768, 32767))
        )
    return buf.getvalue()


@pytest.fixture(scope="module")
def audio_df(spark):
    a = _wav_bytes([440, 1100, 2500])
    rows = [
        (1, "audio", a),
        (2, "audio", _wav_bytes([440, 1100, 2500], amp=4500)),  # half volume
        (3, "audio", _wav_bytes([440, 1100, 2500], noise=60, seed=7)),  # noisy
        (4, "audio", _wav_bytes([300, 900, 3300])),  # different material
        (5, "audio", b"RIFFnot-really-a-wav"),  # corrupt
        (6, "image", a),  # wrong kind — must be ignored
    ]
    return spark.createDataFrame(rows, ["media_id", "kind", "content"])


def test_fingerprint_deterministic_and_gain_invariant(spark, audio_df):
    fps = {
        r["media_id"]: r["afp"]
        for r in multimodal.audio_fingerprint(audio_df).collect()
    }
    assert set(fps) == {1, 2, 3, 4, 5}  # audio rows only
    assert fps[5] is None  # corrupt → null, not a stage failure
    assert fps[1] is not None and 0 <= fps[1] < 2**63
    assert fps[1] == fps[2]  # volume change: identical hash
    again = {
        r["media_id"]: r["afp"]
        for r in multimodal.audio_fingerprint(audio_df).collect()
    }
    assert again == fps


def test_near_dup_pairs_audio(spark, audio_df):
    fps = multimodal.audio_fingerprint(audio_df)
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in multimodal.audio_near_dup_pairs(fps, max_hamming=10).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 3) in pairs  # mild noise stays within the radius
    assert not any(4 in p for p in pairs)  # different material is far
    assert not any(5 in p for p in pairs)  # null never pairs


def test_banding_matches_bruteforce(spark, audio_df):
    """Exact-recall claim: banded pairing == all-pairs bit_count filter."""
    from pyspark.sql import functions as F

    fps = multimodal.audio_fingerprint(audio_df).filter("afp IS NOT NULL")
    a, b = fps.alias("a"), fps.alias("b")
    brute = {
        (r["ma"], r["mb"])
        for r in a.join(b, F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("ma"),
            F.col("b.media_id").alias("mb"),
            F.bit_count(
                F.col("a.afp").bitwiseXOR(F.col("b.afp"))
            ).alias("h"),
        )
        .filter("h <= 10")
        .collect()
    }
    banded = {
        (r["media_a"], r["media_b"])
        for r in multimodal.audio_near_dup_pairs(fps, max_hamming=10).collect()
    }
    assert banded == brute
