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
