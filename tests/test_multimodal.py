"""Multimodal binary-column plumbing: sniffing, decode, resize, frames,
features.  The decode paths use the documented deterministic fakes (no
codec libs in this container) — what's under test is the Spark-side
contract: schemas, Arrow batching, explode shapes, determinism."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elusion_spark.operators import multimodal as MM

PNG = b"\x89PNG\r\n\x1a\x0a" + b"fakepngdata"
JPG = b"\xff\xd8\xff\xe0" + b"fakejpegdata"
WAV = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"fakewavdata"
AVI = b"RIFF" + b"\x24\x00\x00\x00" + b"AVI " + b"faketavidata"
MP4 = b"\x00\x00\x00\x20" + b"ftypisom" + b"fakemp4data"
MP3 = b"ID3\x04" + b"fakemp3data"
RAW = b"just some text bytes"


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(1, PNG), (2, JPG), (3, WAV), (4, AVI), (5, MP4), (6, MP3), (7, RAW)]
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


def test_magic_sniffing(media_df):
    out = {
        r["id"]: r["kind"]
        for r in media_df.select(
            "id", MM.media_kind_expr("payload").alias("kind")
        ).collect()
    }
    assert out == {
        1: "image/png",
        2: "image/jpeg",
        3: "audio/wav",
        4: "video/avi",
        5: "video/mp4",
        6: "audio/mp3",
        7: "application/octet-stream",
    }


def test_metadata_struct(media_df):
    m = MM.with_media_metadata(media_df)
    f = {x.name: x.dataType for x in m.schema["media"].dataType.fields}
    assert isinstance(f["kind"], T.StringType)
    assert isinstance(f["content_hash"], T.LongType)
    row = m.filter("id = 1").first()
    assert row["media"]["n_bytes"] == len(PNG)
    # content hash must be stable (it's a cache/dedup key)
    again = MM.with_media_metadata(media_df).filter("id = 1").first()
    assert row["media"]["content_hash"] == again["media"]["content_hash"]


def test_decode_images_deterministic(media_df):
    imgs = media_df.filter("id IN (1, 2)")
    a = {r["id"]: r.asDict() for r in MM.decode_images(imgs).collect()}
    b = {r["id"]: r.asDict() for r in MM.decode_images(imgs).collect()}
    assert a == b
    for r in a.values():
        assert 64 <= r["width"] < 1088 and 64 <= r["height"] < 1088
        assert r["channels"] == 3
        assert 0.0 <= r["mean_luma"] < 256.0


def test_resize_then_decode_chains(media_df):
    resized = MM.resize_images(media_df.filter("id = 1"), (224, 224))
    row = resized.first()
    assert (row["width"], row["height"]) == (224, 224)
    assert isinstance(row["payload"], (bytes, bytearray))
    # output of resize feeds decode: the contract is schema compatibility
    dec = MM.decode_images(resized.select("id", "payload"))
    assert dec.count() == 1


def test_sample_frames_shape(media_df):
    vids = media_df.filter("id IN (4, 5)")
    frames = MM.sample_frames(vids, every_n=30, max_frames=8)
    rows = frames.collect()
    assert all(isinstance(r["frame"], (bytes, bytearray)) for r in rows)
    per = {}
    for r in rows:
        per.setdefault(r["id"], []).append(r["frame_idx"])
    for vid, idxs in per.items():
        assert 1 <= len(idxs) <= 8
        assert sorted(idxs) == [i * 30 for i in range(len(idxs))]
    # deterministic across runs
    again = MM.sample_frames(vids, every_n=30, max_frames=8).count()
    assert again == len(rows)


def test_extract_features_unit_norm(media_df):
    feats = MM.extract_features(media_df, dim=32)
    rows = feats.collect()
    assert len(rows) == 7
    for r in rows:
        assert len(r["embedding"]) == 32
        norm = sum(x * x for x in r["embedding"]) ** 0.5
        assert abs(norm - 1.0) < 1e-3
    # same payload bytes => same embedding (content-keyed, partition-independent)
    one = MM.extract_features(media_df.repartition(4), dim=32).filter("id = 1").first()
    ref = [r for r in rows if r["id"] == 1][0]
    assert list(one["embedding"]) == list(ref["embedding"])


# ------------------------------------------------- real codecs (gated)

@pytest.mark.skipif(not MM._HAVE_PIL, reason="PIL not installed")
def test_real_png_decode_known_pixels(spark):
    """When PIL is present, decode_images must return TRUE dimensions and
    mean luma for a generated known-pixel PNG (VERDICT r1 item 6)."""
    import io

    from PIL import Image

    im = Image.new("L", (32, 16))
    im.putdata([(x * 255) // 511 for x in range(32 * 16)])
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue())],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("payload", T.BinaryType())]))
    row = MM.decode_images(df).first()
    assert (row["width"], row["height"]) == (32, 16)
    expected_luma = sum((x * 255) // 511 for x in range(512)) / 512
    assert abs(row["mean_luma"] - expected_luma) < 1e-9


@pytest.mark.skipif(not MM._HAVE_SOUNDFILE, reason="soundfile not installed")
def test_real_wav_decode(spark):
    """With soundfile present, decode_audio reports true rate/duration/
    channels for a generated sine WAV."""
    import io

    import numpy as np
    import soundfile as sf

    rate, secs = 16000, 2
    samples = np.sin(np.linspace(0, 440 * 2 * np.pi * secs, rate * secs))
    buf = io.BytesIO()
    sf.write(buf, samples, rate, format="WAV")
    df = spark.createDataFrame(
        [(1, buf.getvalue())],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("payload", T.BinaryType())]))
    row = MM.decode_audio(df).first()
    assert row["sample_rate"] == rate
    assert row["n_channels"] == 1
    assert abs(row["duration_ms"] - secs * 1000) <= 1
    assert 0.5 < row["rms"] < 0.9  # sine rms ~0.707


@pytest.mark.skipif(not MM._HAVE_AV, reason="PyAV not installed")
def test_real_video_frame_sample(spark):
    """With PyAV present, sample_frames demuxes real frames (every_n
    stride, rgb24 bytes) from a generated clip."""
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("h264", rate=30)
        stream.width, stream.height = 64, 48
        stream.pix_fmt = "yuv420p"
        for i in range(90):
            img = np.full((48, 64, 3), i * 2, dtype=np.uint8)
            for packet in stream.encode(
                    av.VideoFrame.from_ndarray(img, format="rgb24")):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    df = spark.createDataFrame(
        [(1, buf.getvalue())],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("payload", T.BinaryType())]))
    rows = MM.sample_frames(df, every_n=30, max_frames=8).collect()
    assert [r["frame_idx"] for r in rows] == [0, 30, 60]
    assert all(len(r["frame"]) == 64 * 48 * 3 for r in rows)


def test_synthetic_blobs_stay_on_fake_path(media_df):
    """The synthetic corpus blobs are NOT parseable media, so decode
    results must be identical whether or not codec libs are installed —
    this is what keeps q36/q37/q52 oracles stable across environments."""
    dec = {r["id"]: r for r in MM.decode_audio(media_df).collect()}
    h = MM._fake_u64(WAV)
    # the 23-byte WAV stub is below the 36-byte header minimum -> digest
    # fake branch (and soundfile rejects it even when installed)
    assert dec[3]["sample_rate"] == [8000, 16000, 22050, 44100][h & 3]
    assert dec[3]["duration_ms"] == (h >> 2) % 300_000
    assert dec[3]["n_channels"] == 1 + ((h >> 20) & 1)
    frames = MM.sample_frames(media_df.filter("id = 3")).collect()
    assert len(frames) == (h % 8) + 1


def test_video_near_dup_pairs_fake_path(spark):
    """Exact-duplicate video payloads share every sampled frame (same
    deterministic fake frames), so they pair with shared_frames ==
    their frame count and mean_hamming 0; unrelated payloads don't
    pair at a tight threshold; group_col alignment means a frame can
    only ever match a frame at the SAME sampled index."""
    from pyspark.sql import functions as F

    from elusion_spark.operators.multimodal import (
        sample_frames, video_near_dup_pairs)

    rows = [(i, bytes(f"VIDEO payload {i}" * 3, "ascii")) for i in range(25)]
    dups = [(500 + i, rows[i][1]) for i in range(4)]
    df = spark.createDataFrame(rows + dups, "id long, payload binary")
    got = {(r["id_a"], r["id_b"]): (r["shared_frames"], r["mean_hamming"])
           for r in video_near_dup_pairs(
               df, max_hamming=3, bands=8, min_shared_frames=1).collect()}
    nframes = {r["id"]: r["cnt"] for r in
               sample_frames(df).groupBy("id")
               .agg(F.count("*").alias("cnt")).collect()}
    for i in range(4):
        assert got[(i, 500 + i)] == (nframes[i], 0.0), (i, got)
    assert all(h == 0.0 for _, h in got.values())


def test_audio_near_dup_pairs_fake_path(spark):
    """Exact-duplicate audio payloads pair at hamming 0; fingerprints
    are deterministic and a DIFFERENT digest slice than image phash
    (the two modalities must not correlate)."""
    from elusion_spark.operators.multimodal import (
        audio_fingerprint, audio_near_dup_pairs, image_phash)

    rows = [(i, bytes(f"AUDIO clip {i}" * 5, "ascii")) for i in range(30)]
    dups = [(700 + i, rows[i][1]) for i in range(3)]
    df = spark.createDataFrame(rows + dups, "id long, payload binary")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             audio_near_dup_pairs(df, max_hamming=3, bands=8).collect()}
    for i in range(3):
        assert pairs.get((i, 700 + i)) == 0, (i, pairs)
    fp = {r["id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    ph = {r["id"]: r["phash"] for r in image_phash(df).collect()}
    for i in range(3):
        assert fp[i] == fp[700 + i]
        assert fp[i] != ph[i]  # uncorrelated digest slices

