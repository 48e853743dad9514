"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns next to a
metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` stages so Python
cost is amortized per batch, not per row.

The decode internals are STUBBED (image/audio libs are not in this
container): ``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic fake decoder so the
Spark-side plumbing — schema, batch shape, partitioning — is fully
exercised by tests.  Swapping the fake for PIL/libav is a one-function
change that does not touch any plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, payload BINARY, "
    "meta STRUCT<kind: STRING, mime: STRING, width: INT, height: INT, "
    "duration_ms: INT, source: STRING>"
)

FEATURE_SCHEMA = (
    "media_id BIGINT, kind STRING, feat_dim INT, features ARRAY<FLOAT>, "
    "decode_ok BOOLEAN"
)


def make_media_table(documents: DataFrame) -> DataFrame:
    """Derive a synthetic media table from `documents` (binary payload =
    utf-8 text bytes) — the test stand-in for an image/audio table."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(0).alias("duration_ms"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': md5-seeded feature vector in [0,1)."""
    out = []
    h = payload or b""
    for i in range(dim):
        d = hashlib.md5(h + i.to_bytes(4, "little")).digest()
        out.append(int.from_bytes(d[:4], "little") / 2**32)
    return out


def extract_features(
    media: DataFrame, feat_dim: int = 8, fake: bool = True
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage.

    Real deployment: replace `_fake_decode` with the actual decoder
    (PIL.Image.open / soundfile / pyav frame sampling).  Batch shape and
    output schema stay identical.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/soundfile/pyav "
            "(not installed in this environment); use fake=True"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "feat_dim": feat_dim,
                    "features": [
                        _fake_decode(p, feat_dim) for p in pdf["payload"]
                    ],
                    "decode_ok": True,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_plan(media: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-only 'resize' marking target dims (decode stubbed).

    Shows the pattern: cheap metadata transforms stay Column expressions;
    only pixel work would enter mapInPandas.
    """
    return media.withColumn(
        "meta",
        F.col("meta")
        .withField("width", F.lit(width))
        .withField("height", F.lit(height)),
    )


FRAME_SCHEMA = (
    "media_id BIGINT, frame_index INT, frame_ts_ms INT, "
    "features ARRAY<FLOAT>, decode_ok BOOLEAN"
)


def sample_frames(
    media: DataFrame,
    fps: float = 1.0,
    max_frames: int = 16,
    feat_dim: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame, evenly spaced at ``fps`` over ``meta.duration_ms`` (capped at
    ``max_frames``).

    The frame GRID is computed JVM-side (explode over a sequence — the
    row multiplication never touches Python); only the per-frame decode
    runs in the Arrow-batched stage, and it is stubbed exactly like
    extract_features.  Swap `_fake_decode` for a real frame grab
    (pyav seek+decode) without touching the plan.
    """
    if not fake:
        raise NotImplementedError(
            "real video decoding requires pyav (not installed); use fake=True"
        )
    interval_ms = int(1000.0 / fps)
    n_frames = F.least(
        F.greatest(
            (F.col("meta.duration_ms") / interval_ms).cast("int"), F.lit(1)
        ),
        F.lit(max_frames),
    )
    grid = media.select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
    ).withColumn("frame_ts_ms", F.col("frame_index") * interval_ms)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_index": pdf["frame_index"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "features": [
                        _fake_decode(
                            (p or b"") + int(i).to_bytes(4, "little"), feat_dim
                        )
                        for p, i in zip(pdf["payload"], pdf["frame_index"])
                    ],
                    "decode_ok": True,
                }
            )

    return grid.mapInPandas(batches, schema=FRAME_SCHEMA)


def make_audio_table(documents: DataFrame) -> DataFrame:
    """Derive a synthetic AUDIO table from `documents` (payload = utf-8
    text bytes; duration = n_chars ms, 16 kHz) — the test stand-in for a
    speech corpus."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("audio").alias("kind"),
            F.lit("audio/wav").alias("mime"),
            F.lit(16000).alias("sample_rate"),
            F.col("n_chars").cast("int").alias("duration_ms"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def audio_windows(
    audio: DataFrame,
    win_ms: int = 400,
    hop_ms: int = 200,
    max_windows: int = 8,
) -> DataFrame:
    """Overlapping analysis windows over audio clips — the framing grid
    every speech-feature pipeline (fbank, wav2vec chunks) starts from.

    Pure Column algebra: window count/offsets come from the metadata
    (``meta.duration_ms``, ``meta.sample_rate``), the row multiplication
    is a JVM-side ``explode(sequence(...))``, and sample offsets are
    integer arithmetic — the actual waveform decode (the only part that
    would need an audio lib) stays behind the same Arrow-batched stub
    boundary as ``extract_features``.  A clip shorter than one window
    yields ONE truncated window ([0, duration)); otherwise full windows
    at ``hop_ms`` strides, capped at ``max_windows``.

    Returns (media_id, window_index, start_ms, end_ms, start_sample,
    end_sample, n_windows).
    """
    dur = F.col("meta.duration_ms")
    rate = F.col("meta.sample_rate")
    n_full = (
        F.floor((dur - F.lit(win_ms)) / F.lit(hop_ms)).cast("int") + 1
    )
    n_win = F.when(dur < win_ms, F.lit(1)).otherwise(
        F.least(n_full, F.lit(max_windows))
    )
    g = audio.select(
        "media_id",
        dur.alias("_dur"),
        rate.alias("_rate"),
        n_win.alias("n_windows"),
        F.explode(F.sequence(F.lit(0), n_win - 1)).alias("window_index"),
    )
    start = F.col("window_index") * F.lit(hop_ms)
    end = F.least(start + F.lit(win_ms), F.col("_dur"))
    return g.select(
        "media_id",
        "window_index",
        start.cast("int").alias("start_ms"),
        end.cast("int").alias("end_ms"),
        (start * F.col("_rate") / 1000).cast("bigint").alias("start_sample"),
        (end * F.col("_rate") / 1000).cast("bigint").alias("end_sample"),
        "n_windows",
    )
