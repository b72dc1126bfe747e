"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched pandas
operators.

Design (per the build brief): image/audio/video payloads are
`BinaryType` columns with a `kind` discriminator and a typed metadata
struct. The heavy steps run as `mapInPandas` — per-partition Arrow
batches, so codec state initializes once per partition, never per
row. Decode is REAL for images (PNG) and audio (RIFF/WAV PCM16) via
the pure-stdlib codecs in `operators/codecs.py`; video container
decode requires ffmpeg (absent here) and stays a loud stub. The
deterministic byte-statistics fake remains the default for the
oracle-checked registered queries (DuckDB can reproduce byte sums,
not PNG decode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),       # opaque encoded bytes
    StructField("meta", StructType([            # typed, kind-specific
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ])),
])

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(DoubleType())),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_index", IntegerType()),
    StructField("frame_bytes", LongType()),
])


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from `documents`: payload =
    UTF-8 bytes of the text (standing in for encoded image/audio),
    kind cycling by doc_id, metadata from n_chars."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"))


def _decode_real(payload: bytes, kind: str) -> list[float]:
    """Real decode path: PNG for images and RIFF/WAV PCM16 for audio
    via the pure-stdlib codecs in `operators/codecs.py` (no PIL/
    librosa needed). Features are FEATURE_DIM pixel/sample statistics,
    each normalized to ~[0, 1]. Video container decode genuinely
    requires ffmpeg, which this environment lacks — that one kind
    stays a loud stub."""
    import numpy as np

    from transcript_analysis_spark.operators.codecs import (decode_png,
                                                            decode_wav)
    if kind == "image":
        px = decode_png(payload).astype(np.float64) / 255.0
        h, w, ch = px.shape
        chan_means = [float(px[:, :, c % ch].mean()) for c in range(3)]
        grad = float(np.abs(np.diff(px, axis=1)).mean()) if w > 1 else 0.0
        return [
            *chan_means,                       # per-channel brightness
            float(px.std()),                   # contrast
            grad,                              # horizontal edge energy
            min(1.0, w / 4096.0),              # normalized width
            min(1.0, h / 4096.0),              # normalized height
            w / (w + h),                       # aspect balance
        ][:FEATURE_DIM]
    if kind == "audio":
        samples, rate = decode_wav(payload)
        x = samples.astype(np.float64) / 32768.0
        mono = x.mean(axis=1)
        zc = (float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
              if mono.size > 1 else 0.0)
        return [
            float(np.abs(mono).mean()),        # mean amplitude
            float(np.sqrt((mono ** 2).mean())),  # RMS energy
            float(mono.std()),
            float(np.abs(mono).max(initial=0.0)),  # peak
            zc,                                # zero-crossing rate
            min(1.0, rate / 48000.0),          # normalized sample rate
            min(1.0, x.shape[1] / 8.0),        # normalized channel count
            min(1.0, mono.size / (rate * 60.0)),  # normalized duration
        ][:FEATURE_DIM]
    raise NotImplementedError(
        "video container decode requires ffmpeg, which is not in this "
        "environment; image (PNG) and audio (WAV) decode are real")


def scaled_feature(s: int, n: int) -> int:
    """Feature value as an exact half-up-rounded scaled integer
    (round(s/n, 6) * 1e6), computed in pure integer arithmetic so
    Python, Spark and the DuckDB oracle agree bit-for-bit — float
    rounding at the .5 boundary is engine-dependent, integers are not.
    Requires s >= 0, n > 0 (byte sums are)."""
    return (2 * s * 1_000_000 + n) // (2 * n)


def _decode_fake(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in: byte-statistics 'features' so tests and
    downstream similarity plumbing have stable real numbers. Pure
    integer/byte arithmetic -> DuckDB-oracle-checkable.

    The strided byte sums run vectorized (numpy reshape + column sum;
    r13, guide §4.2 — the interpreted per-byte generator cost O(len)
    Python bytecode per payload); the half-up scaling stays exact
    Python-int arithmetic, so outputs are bit-identical to the scalar
    form (pinned by test_pandas_operators)."""
    import numpy as np

    n = len(payload) or 1
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    sums = arr.reshape(-1, FEATURE_DIM).sum(axis=0, dtype=np.int64) \
        if arr.size else np.zeros(FEATURE_DIM, dtype=np.int64)
    return [scaled_feature(int(s), n) / 1e6 for s in sums]


def extract_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """payload -> fixed-dim feature vector via mapInPandas (Arrow
    batches; decoder state initialized once per partition).

    Only the three columns the decoder touches cross the Python
    boundary (r13, guide §4.1): Spark cannot see inside an opaque
    mapInPandas function, so without the explicit select the unused
    `meta` struct would be read, Arrow-framed and shipped per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_real if use_real_codecs else _decode_fake
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "features": [decode(p, k) for p, k in
                             zip(pdf["payload"], pdf["kind"])],
            })
            yield out

    return media.select("media_id", "kind", "payload") \
        .mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, stride: int = 7) -> DataFrame:
    """Frame sampling for video payloads (UDTF shape: 1 row -> N
    frames). Frame boundaries are byte-range slices of the payload —
    with real codecs this is the keyframe index walk.

    The sampler only ever reads len(payload) — so the payload bytes
    never cross the Python boundary (r13, guide §8: decide with small
    rows, leave heavy bytes where they are): the length is computed
    JVM-side and only (media_id, kind, n_frames, total) ship through
    Arrow, ~30 bytes/row instead of the blob. The video-kind filter
    runs JVM-side too, so non-video rows never reach Python at all.
    Row iteration replaced with a zip over column arrays (iterrows
    materializes a Series per row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for mid, nf, total in zip(pdf["media_id"], pdf["n_frames"],
                                      pdf["total"]):
                nf, total = int(nf), int(total)
                per = max(1, total // max(1, nf))
                for fi in range(0, nf, stride):
                    ids.append(mid)
                    idxs.append(fi)
                    sizes.append(min(per, total - fi * per))
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_index": pd.Series(idxs, dtype="int32"),
                "frame_bytes": pd.Series(sizes, dtype="int64"),
            })

    slim = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.length("payload").cast("long").alias("total"))
    return slim.mapInPandas(run, FRAMES_SCHEMA)
