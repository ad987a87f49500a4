"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, Arrow-batched UDF signatures,
partition-size control for wide binary rows) is real and tested; the
actual codec calls are stubbed behind ``DECODERS`` because the
image/audio libraries are not in this container — swap in PIL/ffmpeg
functions on a real cluster without touching the plumbing.

Scale notes: binary payload rows are WIDE — ``media_repartition``
sizes partitions by cumulative payload bytes (not row count) so a
128 MB Arrow batch doesn't blow executor memory; feature extraction
runs in ``mapInPandas`` so each batch streams through Python once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, sha string, "
    "feat array<float>, decode_ok boolean"
)


def synthetic_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = repeated hash bytes)."""
    base = spark.range(n_rows)
    rid = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(rid, F.lit(3)) + 1).cast("int"),
    )
    payload = F.repeat(F.unhex(F.md5(F.concat(F.lit(seed), rid))), 64).cast("binary")
    return base.select(
        F.format_string("media-%08d", rid).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(256).cast("int").alias("width"),
        F.lit(256).cast("int").alias("height"),
        (F.pmod(rid, F.lit(30_000))).cast("int").alias("duration_ms"),
    )


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB: real impl would PIL-decode + resize + embed. Deterministic
    fake: 4 floats from the payload head so tests can assert shape."""
    head = payload[:8] if payload else b"\x00" * 8
    return [float(b) / 255.0 for b in head[:4]]


DECODERS = {
    "image": _decode_image_stub,
    "audio": _decode_image_stub,  # STUB — swap for librosa/ffmpeg path
    "video": None,  # NotImplemented: frame-sampling needs ffmpeg
}


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: one Python crossing per Arrow batch, never per
    row. Unsupported kinds yield decode_ok=false rather than failing
    the job (poison-pill isolation, like Vector's drop-on-error)."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                dec = DECODERS.get(kind)
                if dec is None or payload is None:
                    feats.append(None)
                    oks.append(False)
                else:
                    feats.append(dec(bytes(payload)))
                    oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def media_repartition(
    df: DataFrame, target_bytes: int = 64 << 20, total_bytes: int | None = None
) -> DataFrame:
    """Repartition so each partition holds ~target_bytes of payload —
    byte-aware, because 1000 video rows ≠ 1000 log lines.

    The byte budget comes from Catalyst's plan statistics (file-size
    metadata for parquet/Iceberg sources) — NOT from scanning: the old
    ``sum(length(payload))`` pass triggered an extra full read of the
    widest rows in the system just to size partitions. Callers that
    know the exact payload volume (e.g. from their own manifest) pass
    ``total_bytes``. When statistics are unavailable (the optimizer's
    defaultSizeInBytes sentinel), the frame is returned unchanged
    rather than exploded into a bogus partition count."""
    if total_bytes is None:
        stats_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if stats_bytes >= (1 << 60):  # unknown-size sentinel, not a measurement
            return df
        total_bytes = stats_bytes
    n_parts = max(1, int(total_bytes // target_bytes))
    return df.repartition(n_parts)
