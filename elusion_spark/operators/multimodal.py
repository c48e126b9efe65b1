"""Multimodal (image/audio/video) columns over Spark binary type.

Beyond-parity module (SURVEY §7.2 step 10): the reference has no media
support; a 100 TB training-data pipeline needs opaque ``binary`` payload
columns with typed metadata and Arrow-batched decode/feature stages.

Design
------
- A media row is ``(id, payload: binary, media: struct<...>)``.  Payload
  bytes stay opaque to Catalyst; metadata lives in a typed struct so
  filters on it (``media.kind = 'image/png'``) are ordinary pushdown-able
  predicates.
- *Container sniffing* (magic bytes) is pure built-in SQL over
  ``substring``/``hex`` of the binary column — JVM-side, codegen'd, no
  Python: cheap enough to run over every blob at ingest.
- *Decode / resize / frame-sample / feature-extract* are
  ``mapInPandas`` stages: Arrow moves the binary batches, pandas sees
  ``bytes`` objects.  The actual codec call is isolated in
  ``_decode_image_bytes`` / ``_decode_frames`` — PIL/av are NOT in this
  container, so those fall back to a clearly-marked DETERMINISTIC FAKE
  (documented below) keyed on xxhash of the payload; the Spark-side
  plumbing (schemas, batch iteration, explode shapes, partitioning) is
  real and tested either way.

Scale notes
-----------
- Every stage is a narrow map — no shuffle.  Feature extraction returns
  fixed-width ``array<float>`` ready for the similarity operators.
- Frame sampling explodes one row per kept frame; downstream repartition
  is the caller's choice (`spark.sql.files.maxPartitionBytes` governs the
  scan; blobs >128 MB should be stored one-per-file).
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # the real decoder, if the container has it
    from PIL import Image as _PIL_Image  # noqa: N812
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # real audio decode (wav/flac/ogg), if present
    import soundfile as _soundfile
    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False

try:  # real video demux/decode (PyAV/ffmpeg), if present
    import av as _av
    _HAVE_AV = True
except ImportError:
    _HAVE_AV = False


# ------------------------------------------------------------ magic sniff

_MAGIC = [
    # (hex prefix at offset 1, kind)
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "riff"),  # WAV/AVI — disambiguated on bytes 9..12
    ("494433", "audio/mp3"),
    ("664C6143", "audio/flac"),
    ("1A45DFA3", "video/webm"),
]


def media_kind_expr(bin_col: str):
    """Container type from magic bytes — one CASE over hex prefixes,
    whole-stage-codegen'd; no Python touches the payload."""
    hx = f"hex(substring({bin_col}, 1, 12))"
    branches = " ".join(
        f"WHEN startswith({hx}, '{prefix}') THEN "
        + (
            # RIFF container: bytes 9-12 say WAVE vs AVI
            f"(CASE WHEN substring({hx}, 17, 8) = '57415645' THEN 'audio/wav' "
            f"WHEN substring({hx}, 17, 6) = '415649' THEN 'video/avi' "
            f"ELSE 'riff/unknown' END)"
            if kind == "riff"
            else f"'{kind}'"
        )
        for prefix, kind in _MAGIC
    )
    # MP4: 'ftyp' at offset 5
    branches += (
        f" WHEN substring(hex(substring({bin_col}, 5, 4)), 1, 8) = '66747970' "
        f"THEN 'video/mp4'"
    )
    return F.expr(f"CASE {branches} ELSE 'application/octet-stream' END")


def with_media_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Attach the typed metadata struct: kind (sniffed), n_bytes, and a
    64-bit content hash (exact-dedup / cache key)."""
    return df.withColumn(
        "media",
        F.struct(
            media_kind_expr(bin_col).alias("kind"),
            F.length(F.col(bin_col)).alias("n_bytes"),
            F.xxhash64(F.col(bin_col)).alias("content_hash"),
        ),
    )


# --------------------------------------------------------- decode plumbing

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _fake_u64(data: bytes) -> int:
    """Deterministic 60-bit digest used by every FAKE decode path.

    md5 of the UPPERCASE HEX of the payload, first 15 hex digits — chosen
    so a SQL oracle can reproduce it exactly:
    ``('0x' || substr(md5(hex(payload)), 1, 15))::BIGINT`` in DuckDB
    (DuckDB's md5 only accepts VARCHAR, and hex() emits uppercase —
    hence hashing the hex, not the raw bytes)."""
    hx = data.hex().upper()
    return int(hashlib.md5(hx.encode()).hexdigest()[:15], 16)


def _decode_image_bytes(data: bytes) -> tuple[int, int, int, float]:
    """(width, height, channels, mean_luma).

    REAL path: PIL decode.  FAKE path (PIL absent in this container):
    deterministic pseudo-decode from a content digest — width/height in
    [64, 1088) step 8, channels 3, mean_luma in [0, 256).  The fake is a
    pure function of the bytes, so tests are stable and the pipeline
    shape (schemas, batching) is exercised for real."""
    if _HAVE_PIL:
        import io

        im = _PIL_Image.open(io.BytesIO(data))
        im = im.convert("L")
        px = list(im.getdata())
        return (im.width, im.height, len(im.getbands()), sum(px) / max(len(px), 1))
    h = _fake_u64(data)
    return (
        64 + (h & 0x7F) * 8,
        64 + ((h >> 7) & 0x7F) * 8,
        3,
        float((h >> 14) & 0xFF),
    )


def decode_images(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """Arrow-batched image decode: (id, width, height, channels,
    mean_luma).  One narrow mapInPandas pass; the codec is per-blob
    Python (unavoidable — codecs are native libs), everything around it
    is columnar."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            decoded = [_decode_image_bytes(b) for b in pdf[bin_col]]
            out = pd.DataFrame(decoded, columns=["width", "height", "channels", "mean_luma"])
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.select(id_col, bin_col).mapInPandas(run, IMAGE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    target: tuple[int, int],
    id_col: str = "id",
    bin_col: str = "payload",
) -> DataFrame:
    """Resize every image to ``target`` (w, h), returning new payload
    bytes.  REAL path needs PIL; FAKE path re-emits a deterministic
    digest-stamped payload of the right declared size so downstream
    plumbing (binary out-schema, chaining into decode/feature stages) is
    exercised."""
    tw, th = target

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if _HAVE_PIL:
                    import io

                    im = _PIL_Image.open(io.BytesIO(b)).resize((tw, th))
                    buf = io.BytesIO()
                    im.save(buf, format="PNG")
                    rows.append((i, buf.getvalue(), tw, th))
                else:
                    stamp = hashlib.blake2b(b, digest_size=16).digest()
                    rows.append((i, b"RSZ0" + _struct.pack("<II", tw, th) + stamp, tw, th))
            yield pd.DataFrame(rows, columns=["id", "payload", "width", "height"])

    return df.select(id_col, bin_col).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
    id_col: str = "id",
    bin_col: str = "payload",
) -> DataFrame:
    """Sample every Nth frame of each video blob → one output row per
    kept frame (id, frame_idx, frame).  REAL path demuxes with
    PyAV/ffmpeg when importable and the blob parses as video; otherwise
    the FAKE emits ``min(max_frames, digest%max+1)`` deterministic frame
    payloads.  The row-explosion shape — the part that matters for
    partition sizing at 100 TB — is real either way."""

    def _real_frames(b: bytes):
        import io

        with _av.open(io.BytesIO(b)) as container:
            kept = []
            for idx, frame in enumerate(container.decode(video=0)):
                if idx % every_n == 0:
                    kept.append((idx, frame.to_ndarray(format="rgb24")
                                 .tobytes()))
                    if len(kept) >= max_frames:
                        break
            return kept

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(b)
                if _HAVE_AV:
                    try:
                        for src, frame in _real_frames(b):
                            rows.append((i, src, frame))
                        continue
                    except Exception:
                        pass  # not a parseable video — deterministic fake
                n = (_fake_u64(b) % max_frames) + 1
                for f_idx in range(n):
                    src = f_idx * every_n
                    frame = hashlib.blake2b(
                        b + _struct.pack("<I", src), digest_size=32
                    ).digest()
                    rows.append((i, src, b"FRM0" + frame))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame"])

    return df.select(id_col, bin_col).mapInPandas(run, FRAME_SCHEMA)


def extract_features(
    df: DataFrame, dim: int = 64, id_col: str = "id", bin_col: str = "payload",
    method: str = "gauss",
) -> DataFrame:
    """Fixed-width feature vector per blob: (id, embedding array<float>).

    REAL path would run a vision/audio model over the decoded media; here
    the embedding is a DETERMINISTIC FAKE, vectorized per Arrow batch.
    ``method='gauss'`` (default): unit-normalized gaussian floats seeded
    from the content digest.  ``method='md5'``: component j is
    ``(md5_60(hex(payload) || '|' || j) % 2001 - 1000) / 1000.0`` as
    float32 — fully reproducible in a SQL oracle (same shape as
    ``_fake_u64``), used by the correctness gate.  Output feeds directly
    into operators.similarity (cosine_topk, embedding_near_dup_pairs,
    ivf_*)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if method == "md5":
                vecs = np.empty((len(pdf), dim), dtype=np.float64)
                for r, b in enumerate(pdf[bin_col]):
                    hx = bytes(b).hex().upper()
                    for j in range(dim):
                        h = int(hashlib.md5(f"{hx}|{j}".encode())
                                .hexdigest()[:15], 16)
                        vecs[r, j] = (h % 2001 - 1000) / 1000.0
                vecs = vecs.astype(np.float32)
            else:
                seeds = np.array([_fake_u64(b) for b in pdf[bin_col]],
                                 dtype=np.uint64)
                # per-row RNG stream seeded by content digest: reproducible
                # regardless of batch/partition boundaries
                vecs = np.empty((len(seeds), dim), dtype=np.float64)
                for r, s in enumerate(seeds):
                    vecs[r] = np.random.default_rng(int(s)).standard_normal(dim)
                norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                vecs = (vecs / np.where(norms == 0, 1, norms)).astype(np.float32)
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "embedding": list(vecs)}
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """Audio metadata/stat decode: (id, sample_rate, duration_ms,
    n_channels, rms).  REAL path decodes with soundfile when importable
    and the blob parses; synthetic/corrupt blobs fall back to byte math:
    WAV headers ARE parsed for real (RIFF fmt chunk), everything else
    gets the deterministic digest fake."""

    def _real(b: bytes):
        import io

        import numpy as np

        data, rate = _soundfile.read(io.BytesIO(b), always_2d=True)
        n_frames, n_ch = data.shape
        dur = int(n_frames * 1000 / rate) if rate else 0
        rms = float(np.sqrt(np.mean(np.square(data)))) if n_frames else 0.0
        return (int(rate), dur, int(n_ch), rms)

    def _one(b: bytes):
        if _HAVE_SOUNDFILE:
            try:
                return _real(b)
            except Exception:
                pass  # unparseable — deterministic byte-math fallback
        if len(b) >= 36 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            # fmt chunk at offset 12 in canonical WAVs
            n_ch = int.from_bytes(b[22:24], "little") or 1
            rate = int.from_bytes(b[24:28], "little") or 16000
            byte_rate = int.from_bytes(b[28:32], "little") or rate * 2
            data_len = max(len(b) - 44, 0)
            dur = int(data_len * 1000 / byte_rate) if byte_rate else 0
            h = _fake_u64(b)
            return (rate, dur, n_ch, float(h % 10_000) / 10_000.0)
        h = _fake_u64(b)
        return (
            [8000, 16000, 22050, 44100][h & 3],
            int((h >> 2) % 300_000),
            1 + ((h >> 20) & 1),
            float((h >> 24) % 10_000) / 10_000.0,
        )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = [(i, *(_one(bytes(b)))) for i, b in zip(pdf[id_col], pdf[bin_col])]
            yield pd.DataFrame(
                rows, columns=["id", "sample_rate", "duration_ms", "n_channels", "rms"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, AUDIO_SCHEMA)


def _phash_bytes(data: bytes) -> int:
    """64-bit perceptual hash of one image payload.

    REAL path (PIL): classic dHash — grayscale, resize to 9×8 with
    antialias, emit one bit per horizontal gradient (left pixel >
    right).  Visually-similar images (recompression, mild resize,
    brightness shifts) land within a few bits; unrelated images are
    ~32 bits apart.

    FAKE path (no PIL in this container): a 60-bit deterministic digest
    — ``int(md5(hex(payload).upper())[16:31], 16)`` — a DIFFERENT md5
    slice than ``_fake_u64`` so phash and decode fakes stay
    uncorrelated.  Identical bytes hash identically (exact-dup recall
    is real); near-visual similarity is NOT modeled by the fake, which
    is exactly the stub contract of every decode path here.  DuckDB
    replay: ``('0x' || substr(md5(hx), 17, 15))::BIGINT``."""
    if _HAVE_PIL:
        import io

        im = _PIL_Image.open(io.BytesIO(data)).convert("L").resize(
            (9, 8), _PIL_Image.LANCZOS)
        px = list(im.getdata())
        bits = 0
        for r in range(8):
            for c in range(8):
                if px[r * 9 + c] > px[r * 9 + c + 1]:
                    bits |= 1 << (r * 8 + c)
        return bits
    hx = data.hex().upper()
    return int(hashlib.md5(hx.encode()).hexdigest()[16:31], 16)


def image_phash(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload",
    out_col: str = "phash",
) -> DataFrame:
    """Perceptual hash column over image payloads — one Arrow-batched
    narrow pass (the codec is per-blob Python like every decode stage;
    everything around it is columnar).  Feeds
    ``dedup.hamming_near_dup_pairs`` for banded near-dup search."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ph(vs):
        return pd.Series([_phash_bytes(bytes(b)) for b in vs],
                         dtype="int64")

    _ph.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, pandas_udf(_ph, "long")(F.col(bin_col)))


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Near-duplicate image pairs: perceptual hash (``image_phash``) +
    the signature-agnostic banded Hamming engine text SimHash uses
    (pigeonhole blocking — EXACT recall for ``max_hamming < bands`` —
    one shuffle on band keys, bucket caps against pathological
    templates).  The dedup stage never touches payload bytes: the
    shuffle carries ``(id, 64-bit hash)`` rows regardless of image
    size, which is what makes image dedup tractable at 100 TB of
    media."""
    from .dedup import hamming_near_dup_pairs

    hashed = image_phash(df, id_col, bin_col, out_col="__ph")
    return hamming_near_dup_pairs(
        hashed, id_col, "__ph", max_hamming=max_hamming, bands=bands,
        max_bucket_size=max_bucket_size, bits=64,
    )


def video_near_dup_pairs(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    every_n: int = 30,
    max_frames: int = 8,
    max_hamming: int = 6,
    bands: int = 8,
    min_shared_frames: int = 2,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Near-duplicate video pairs: sample frames, perceptual-hash each,
    match frames AT THE SAME SAMPLED INDEX via the banded Hamming
    engine (``group_col=frame_idx`` — cross-index candidates never
    materialize), then keep video pairs with at least
    ``min_shared_frames`` matching positions.

    Index-aligned matching is the cheap-and-robust middle ground: it
    survives re-encoding/resolution changes (each frame's phash does)
    but not trimming/offset edits — that variant needs a temporal
    alignment join (``temporal.range_join`` on frame timestamps) over
    the same per-frame hashes.  Scale shape: the explode is bounded by
    ``max_frames`` per video, and after hashing the pipeline carries
    ``(video_id, frame_idx, 64-bit hash)`` rows only — frame bytes
    never shuffle.

    Returns ``(id_a, id_b, shared_frames, mean_hamming)``."""
    from .dedup import hamming_near_dup_pairs

    frames = sample_frames(df, every_n=every_n, max_frames=max_frames,
                           id_col=id_col, bin_col=bin_col)
    hashed = image_phash(frames, "id", "frame", out_col="__ph")
    pairs = hamming_near_dup_pairs(
        hashed, "id", "__ph", max_hamming=max_hamming, bands=bands,
        max_bucket_size=max_bucket_size, bits=64, group_col="frame_idx",
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(
            F.count("*").cast("int").alias("shared_frames"),
            F.round(F.avg("hamming"), 4).alias("mean_hamming"),
        )
        .filter(F.col("shared_frames") >= min_shared_frames)
    )


def _audio_fingerprint_bytes(data: bytes) -> int:
    """64-bit audio fingerprint of one payload.

    REAL path (soundfile): a chromaprint-style energy-delta sketch —
    mono-mix, split into 65 equal windows, one bit per consecutive
    window-energy increase (robust to gain changes, which scale all
    energies equally, and to mild re-encoding noise).

    FAKE path: 60 bits of ``md5('AFP:' || hex(payload))`` — a salted
    digest, uncorrelated with ``_fake_u64`` (decode stats, unsalted
    slice 1-15) and ``_phash_bytes`` (images, unsalted slice 17-31;
    md5 has only 32 hex chars, so a third modality needs a salt, not a
    slice).  Identical bytes fingerprint identically; DuckDB replay:
    ``('0x' || substr(md5('AFP:' || hx), 1, 15))::BIGINT``."""
    if _HAVE_SOUNDFILE:
        try:
            import io

            import numpy as np

            samples, _rate = _soundfile.read(io.BytesIO(data),
                                             always_2d=True)
            mono = samples.mean(axis=1)
            if len(mono) >= 65:
                win = np.array_split(mono, 65)
                e = np.array([float(np.mean(w * w)) for w in win])
                bits = 0
                for i in range(64):
                    if e[i + 1] > e[i]:
                        bits |= 1 << i
                return bits
        except Exception:
            pass  # unparseable — deterministic digest fallback
    hx = data.hex().upper()
    return int(hashlib.md5(b"AFP:" + hx.encode()).hexdigest()[:15], 16)


def audio_fingerprint(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload",
    out_col: str = "afp",
) -> DataFrame:
    """Audio fingerprint column — Arrow-batched narrow pass, same
    contract as ``image_phash``.  Feeds
    ``dedup.hamming_near_dup_pairs``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fp(vs):
        return pd.Series([_audio_fingerprint_bytes(bytes(b)) for b in vs],
                         dtype="int64")

    _fp.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, pandas_udf(_fp, "long")(F.col(bin_col)))


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Near-duplicate audio pairs: energy-delta fingerprint + the same
    banded Hamming engine as text SimHash and image phash — the whole
    multimodal dedup triad shares ONE blocking engine, and after the
    fingerprint pass only ``(id, 64-bit hash)`` rows shuffle."""
    from .dedup import hamming_near_dup_pairs

    hashed = audio_fingerprint(df, id_col, bin_col, out_col="__afp")
    return hamming_near_dup_pairs(
        hashed, id_col, "__afp", max_hamming=max_hamming, bands=bands,
        max_bucket_size=max_bucket_size, bits=64,
    )
