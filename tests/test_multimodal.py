"""Multimodal column plumbing: binary source, Arrow-batched feature
extraction (stubbed kernel), frame/chunk planning."""

import hashlib

import pytest
from pyspark.sql import Row

from etl_workflows_spark.operators import multimodal


@pytest.fixture()
def media_df(spark):
    rows = [
        Row(
            media_id=1,
            kind="image",
            content=b"\x89PNG-fake-bytes-1",
            meta=Row(mime="image/png", width=None, height=None, duration_ms=None, sample_rate=None),
        ),
        Row(
            media_id=2,
            kind="video",
            content=b"fake-mp4",
            meta=Row(mime="video/mp4", width=None, height=None, duration_ms=3500, sample_rate=None),
        ),
        Row(
            media_id=3,
            kind="audio",
            content=b"fake-wav",
            meta=Row(mime="audio/wav", width=None, height=None, duration_ms=12001, sample_rate=16000),
        ),
        Row(media_id=4, kind="image", content=None, meta=None),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_binary_file_source(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"hello")
    (tmp_path / "b.bin").write_bytes(b"world!")
    df = multimodal.read_binary_dir(spark, str(tmp_path), "*.bin")
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert got == {"a.bin": b"hello", "b.bin": b"world!"}


def test_image_features_deterministic(spark, media_df):
    feats = {r["media_id"]: r for r in multimodal.extract_image_features(media_df).collect()}
    f1 = feats[1]
    assert f1["sha256"] == hashlib.sha256(b"\x89PNG-fake-bytes-1").hexdigest()
    assert f1["n_bytes"] == 17
    assert 64 <= f1["width"] < 256 and 64 <= f1["height"] < 256
    assert 0.0 <= f1["mean_luma"] <= 1.0
    # null content passes through as nulls, row preserved
    assert feats[4]["sha256"] is None and feats[4]["n_bytes"] is None
    # deterministic across runs
    again = {r["media_id"]: r for r in multimodal.extract_image_features(media_df).collect()}
    assert again[1]["width"] == f1["width"]


def test_strict_mode_raises(spark, media_df):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        multimodal.extract_image_features(media_df, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_plan(spark, media_df):
    frames = multimodal.frame_sample_plan(media_df, every_ms=1000).collect()
    # 3500 ms at 1 fps -> frames at 0,1000,2000 (3 full seconds)
    assert [(r["media_id"], r["frame_ms"]) for r in frames] == [
        (2, 0),
        (2, 1000),
        (2, 2000),
    ]


def test_audio_chunks(spark, media_df):
    chunks = multimodal.audio_chunks(media_df, chunk_ms=5000).collect()
    spans = [(r["chunk_idx"], r["start_ms"], r["end_ms"]) for r in chunks]
    # 12001 ms -> chunks [0,5000) [5000,10000) [10000,12001]
    assert spans == [(0, 0, 5000), (1, 5000, 10000), (2, 10000, 12001)]


def _make_png(path, w, h, rgb):
    import struct
    import zlib

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    path.write_bytes(png)


def test_real_image_decode_jvm(spark, tmp_path):
    """Spark's built-in image source decodes hand-crafted PNGs JVM-side;
    pixel stats computed from the REAL decoded bytes."""
    _make_png(tmp_path / "red.png", 4, 3, (255, 0, 0))
    _make_png(tmp_path / "blue.png", 2, 2, (0, 0, 255))
    imgs = multimodal.read_images(spark, str(tmp_path))
    stats = {
        r["origin"].rsplit("/", 1)[-1]: r
        for r in multimodal.image_pixel_stats(imgs).collect()
    }
    red = stats["red.png"]
    assert (red["width"], red["height"]) == (4, 3)
    # image source yields BGR byte order
    assert (red["mean_b"], red["mean_g"], red["mean_r"]) == (0.0, 0.0, 255.0)
    blue = stats["blue.png"]
    assert (blue["mean_b"], blue["mean_g"], blue["mean_r"]) == (255.0, 0.0, 0.0)


def test_short_media_yields_no_negative_offsets(spark):
    from pyspark.sql import Row

    rows = [
        Row(media_id=1, kind="video", content=b"x",
            meta=Row(mime="video/mp4", width=None, height=None, duration_ms=500, sample_rate=None)),
        Row(media_id=2, kind="audio", content=b"y",
            meta=Row(mime="audio/wav", width=None, height=None, duration_ms=0, sample_rate=8000)),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    assert multimodal.frame_sample_plan(df, every_ms=1000).count() == 0
    assert multimodal.audio_chunks(df, chunk_ms=5000).count() == 0


def test_real_wav_decode(spark, tmp_path):
    """Synthesized 16-bit PCM WAVs are actually decoded (stdlib wave +
    numpy): sample rate, frame count, duration, RMS and peak are exact;
    a corrupt file degrades to a null-stats row instead of failing."""
    import math
    import struct
    import wave as wave_mod

    from etl_workflows_spark.operators.multimodal import decode_wav_stats

    def make_wav(path, sr, freq, n_frames, amp=10000):
        with wave_mod.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            frames = b"".join(
                struct.pack("<h", int(amp * math.sin(2 * math.pi * freq * i / sr)))
                for i in range(n_frames)
            )
            w.writeframes(frames)

    d = tmp_path / "wavs"
    d.mkdir()
    make_wav(d / "a.wav", sr=8000, freq=440, n_frames=8000)   # 1 s tone
    make_wav(d / "b.wav", sr=16000, freq=220, n_frames=4000)  # 0.25 s tone
    (d / "c.wav").write_bytes(b"RIFFgarbage-not-a-wav")

    rows = []
    for i, name in enumerate(sorted(p.name for p in d.iterdir())):
        rows.append((i, "audio", (d / name).read_bytes()))
    media = spark.createDataFrame(rows, ["media_id", "kind", "content"])
    out = {r["media_id"]: r for r in decode_wav_stats(media).collect()}
    assert len(out) == 3
    a, b, c = out[0], out[1], out[2]
    assert (a["sample_rate"], a["n_frames"]) == (8000, 8000)
    assert abs(a["duration_ms"] - 1000.0) < 1e-9
    # a full-cycle sine's RMS ~ amp/sqrt(2); generous band for phase edges
    assert abs(a["rms"] - 10000 / 2**0.5) / (10000 / 2**0.5) < 0.02
    assert 9900 <= a["peak"] <= 10000
    assert (b["sample_rate"], b["n_frames"]) == (16000, 4000)
    assert abs(b["duration_ms"] - 250.0) < 1e-9
    assert c["sample_rate"] is None and c["rms"] is None  # quarantined


def _make_png_grid(path, pixels):
    """PNG from an explicit [[(r,g,b), ...], ...] pixel grid."""
    import struct
    import zlib

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    h, w = len(pixels), len(pixels[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + b"".join(bytes(px) for px in row) for row in pixels
    )
    path.write_bytes(
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_image_resize(spark, tmp_path):
    """Nearest-neighbor resize on JVM-decoded pixels: a left-red/right-blue
    4x2 PNG downsampled to 2x1 keeps one red and one blue pixel (exact
    index math, bit-exact BGR bytes)."""
    red, blue = (255, 0, 0), (0, 0, 255)
    _make_png_grid(
        tmp_path / "rb.png",
        [[red, red, blue, blue], [red, red, blue, blue]],
    )
    imgs = multimodal.read_images(spark, str(tmp_path))
    out = multimodal.resize_images(imgs, out_w=2, out_h=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"], r["nChannels"]) == (2, 1, 3)
    # BGR layout: red pixel -> 00 00 FF, blue pixel -> FF 00 00
    assert bytes(r["data"]) == b"\x00\x00\xff\xff\x00\x00"


def test_audio_spectral_features_on_known_tones(spark, tmp_path):
    """A pure sine's spectral centroid sits at its frequency, bandwidth
    near zero; white-ish noise centers far higher with wide bandwidth.
    ZCR of an f-Hz tone is ~2f/sr sign flips per sample."""
    import math
    import struct
    import wave as wave_mod

    from etl_workflows_spark.operators.multimodal import (
        audio_spectral_features,
    )

    d = tmp_path / "swavs"
    d.mkdir()

    def tone(path, sr, freq, n):
        with wave_mod.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(
                b"".join(
                    struct.pack(
                        "<h",
                        int(10000 * math.sin(2 * math.pi * freq * i / sr)),
                    )
                    for i in range(n)
                )
            )

    def noise(path, sr, n):
        # deterministic LCG noise — no random module state
        with wave_mod.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            x = 12345
            frames = []
            for _ in range(n):
                x = (1103515245 * x + 12345) % (2**31)
                frames.append(struct.pack("<h", (x % 20000) - 10000))
            w.writeframes(b"".join(frames))

    tone(d / "a.wav", sr=8000, freq=440, n=8000)
    noise(d / "b.wav", sr=8000, n=8000)
    (d / "c.wav").write_bytes(b"not a wav at all")

    rows = [
        (i, "audio", (d / name).read_bytes())
        for i, name in enumerate(sorted(p.name for p in d.iterdir()))
    ]
    media = spark.createDataFrame(rows, ["media_id", "kind", "content"])
    out = {r["media_id"]: r for r in audio_spectral_features(media).collect()}
    a, b, c = out[0], out[1], out[2]
    assert abs(a["spectral_centroid_hz"] - 440) < 15
    assert a["spectral_bandwidth_hz"] < 100
    assert abs(a["zcr"] - 2 * 440 / 8000) < 0.01
    assert b["spectral_centroid_hz"] > 1000      # noise centers high
    assert b["spectral_bandwidth_hz"] > 500      # and spreads wide
    assert b["rolloff85_hz"] > a["rolloff85_hz"]
    assert c["zcr"] is None                       # corrupt → null row


def test_multimodal_phash_pairs_catalog_entry(spark, sf_dir):
    """The catalog entry's planted perturbed twins must pair with their
    originals (pHash robustness to small affine changes), and random
    cross-vector pairs must stay rare."""
    from etl_workflows_spark.queries.llm import multimodal_phash_pairs

    pairs = multimodal_phash_pairs(spark, sf_dir).collect()
    got = {(r[0], r[1]) for r in pairs}
    # most planted twins (vec_id v and v+1_000_000) are recovered
    planted = {p for p in got if abs(int(p[0]) - int(p[1])) == 1_000_000}
    assert len(planted) >= 40
    # and near-dup pairs are dominated by the planted ones, not noise
    assert len(planted) >= len(got) * 0.8
