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
