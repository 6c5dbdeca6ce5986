"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/resize/frame-sample kernels require codec libraries not present
in this container, so the *kernels* are stubbed (deterministic fake or
NotImplementedError), but the Spark-side plumbing is real and tested:
typed schema, Arrow-batched `mapInPandas` signatures, batch-shape
handling, and partition sizing — the parts that matter at 100 TB.

Pattern: binary payload + typed metadata struct travel together;
feature extraction is a `mapInPandas` over Arrow batches so each Python
worker touches a whole column chunk at once (never row-at-a-time).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (sha2 of the id string repeated), metadata from modular arithmetic."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.to_binary(
            F.repeat(F.sha2(F.col("id").cast("string"), 256), ((F.col("id") % 7) + 1).cast("int")),
            F.lit("utf-8"),
        ).alias("payload"),
        F.struct(
            ((F.col("id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("id") % 9 + 1) * 64).cast("int").alias("height"),
            ((F.col("id") % 30 + 1) * 1000).cast("int").alias("duration_ms"),
            F.element_at(
                F.array(F.lit("png"), F.lit("opus"), F.lit("h264")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("codec"),
        ).alias("meta"),
    )
    return df


def decode_image(payload: bytes) -> object:
    """Real decoder stub — would use PIL/libvips; not in this container."""
    raise NotImplementedError("image codec libraries not available in this environment")


def codecs_available() -> bool:
    """True when a real media codec stack is importable on the driver."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _require_codecs(op: str) -> None:
    """fake=False plan-build gate: fail on the DRIVER at plan time
    instead of inside the Arrow batch iterator on an executor — a
    worker-side NotImplementedError surfaces as an opaque task failure
    after the job is already running."""
    if not codecs_available():
        raise NotImplementedError(
            f"{op}(fake=False) needs real media codec libraries (PIL/libvips), "
            "which are not available on this driver; use fake=True for the "
            "deterministic plumbing kernel"
        )


def extract_features(df: DataFrame, *, feature_dim: int = 8, fake: bool = True) -> DataFrame:
    """Feature extraction over Arrow batches via mapInPandas.

    With `fake=True` (default here): a deterministic byte-statistics
    "feature" (mean/std/quantiles of payload byte values) standing in for
    a decoded-image embedding — the UDF signature, batch shape, schema,
    and partitioning are exactly what a real kernel would use; swap the
    body for the codec call on a real cluster.
    """
    if not fake:
        _require_codecs("extract_features")

    def _batch(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            nbytes = []
            for payload in pdf["payload"]:
                if not fake:
                    decode_image(payload)  # pragma: no cover
                payload = payload if payload is not None else b""
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                if len(arr) == 0:
                    arr = np.zeros(1, dtype=np.float32)
                qs = np.quantile(arr, np.linspace(0, 1, feature_dim - 2))
                feats.append(
                    np.concatenate([[arr.mean(), arr.std()], qs]).astype(np.float32).tolist()
                )
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(_batch, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, *, fake: bool = True
) -> DataFrame:
    """Resize kernel plumbing: binary in → binary out with rewritten meta,
    Arrow-batched via mapInPandas. The fake kernel produces a
    deterministic `width*height`-byte payload by tiling/truncating the
    source bytes — same I/O shape, schema, and batch handling as a real
    PIL/libvips resize; swap the body on a real cluster."""
    if not fake:
        _require_codecs("resize_media")

    def _batch(it: Iterator) -> Iterator:
        import pandas as pd

        target = width * height
        for pdf in it:
            payloads = []
            metas = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if not fake:
                    decode_image(payload)  # pragma: no cover
                b = (bytes(payload) if payload is not None else b"") or b"\x00"
                tiled = (b * (target // len(b) + 1))[:target]
                payloads.append(tiled)
                m = dict(meta)
                m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(_batch, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, *, frame_bytes: int = 64, fake: bool = True
) -> DataFrame:
    """Frame sampling: the timestamp plan (`frame_sample_plan`) drives a
    fake per-frame extraction — each frame is a deterministic slice of the
    source payload keyed by its timestamp. Real decoder would seek/decode
    at frame_ts_ms; the explode + mapInPandas shape is identical."""
    if not fake:
        _require_codecs("sample_frames")
    plan = frame_sample_plan(df, every_ms).join(
        df.select("media_id", "payload"), "media_id"
    )

    def _batch(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            frames = []
            for payload, ts in zip(pdf["payload"], pdf["frame_ts_ms"]):
                if not fake:
                    decode_image(payload)  # pragma: no cover
                b = (bytes(payload) if payload is not None else b"") or b"\x00"
                start = ts % max(len(b) - frame_bytes, 1)
                frame = (b[start:] + b)[:frame_bytes]
                frames.append(frame)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"].astype("int32"),
                    "frame": frames,
                }
            )

    return plan.mapInPandas(_batch, FRAME_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to
    decode per video (pure column math — the expensive decode would
    consume this plan). Shows the explode-shape the real kernel needs."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
