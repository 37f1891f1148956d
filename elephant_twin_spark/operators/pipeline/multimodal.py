"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions.

The Spark-side plumbing — schema contract, ``mapInPandas`` batch shape,
partition sizing — is real and tested; the actual media decoding is
STUBBED (the decode libs are not in this container): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by content hash) produces stable
features so the distributed pipeline can be exercised end-to-end.

At 100 TB: binary payloads ride in parquet alongside metadata; decoding
is a narrow ``mapInPandas`` (no shuffle), so it scales with executors and
is bounded by ``spark.sql.files.maxPartitionBytes`` per task. Frame
sampling/resize happen inside the same Arrow batch pass.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # 'image' | 'audio' | 'video'
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    fake: bool = False,
    batch_limit: int = 1024,
) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``.

    ``fake=True`` runs the deterministic stub decoder (content-hash
    pseudo-embedding — the oracle-checkable path). ``fake=False`` uses
    the REAL decoder when ``PIL`` is importable on the executors
    (8-dim geometry+intensity features from the decoded raster) and
    raises ``NotImplementedError`` otherwise — the decode libs are not
    in every container, and a silent fallback would mislabel fake
    features as real. Plumbing (schema, Arrow batch shape, memory
    bound) is identical either way.

    Real-path failure semantics: a row whose payload PIL cannot open
    (empty, truncated, non-image bytes) gets ``features = NULL`` —
    ``n_bytes``/``sha`` are still computed from the raw bytes, so bad
    rows stay auditable and one corrupt image never fails the task.
    The real raster feature vector is exactly 8-dim; asking for more
    raises (the fake path supports up to 32).
    """

    # bound INSIDE the closure: cloudpickle ships nested functions by
    # VALUE, so with no module-global references the executor worker
    # never needs to import elephant_twin_spark (drivers launched
    # without PYTHONPATH pointing at the repo still work)
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import io as _io

        import pandas as _pd

        if fake:
            def _feats(content: bytes, dim: int = 8):
                digest = _hl.sha256(content or b"").digest()
                return [digest[i] / 255.0 for i in range(dim)]
        else:
            try:
                from PIL import Image as _Image
            except ImportError as exc:  # honest guard, no silent fake
                raise NotImplementedError(
                    "real image decode requires PIL (not in this container); "
                    "pass fake=True for the deterministic stub decoder"
                ) from exc

            def _feats(content: bytes, dim: int = 8):
                # the real raster feature list has exactly 8 entries; a
                # larger dim would silently truncate to fewer features
                # than asked (the fake path supports up to 32) — refuse
                if dim > 8:
                    raise ValueError(
                        f"real decoder produces 8 features, dim={dim} requested; "
                        "use fake=True for wider pseudo-embeddings"
                    )
                # per-ROW failure isolation: one empty/corrupt payload
                # must not kill the whole task (at 100 TB some images
                # WILL be truncated). features=NULL marks the failure;
                # n_bytes/sha stay real so the row remains auditable.
                try:
                    img = _Image.open(_io.BytesIO(content or b""))
                    img = img.convert("L")
                except Exception:
                    return None
                w, h = img.size
                px = list(img.resize((8, 8)).getdata())  # fixed-size raster
                mean = sum(px) / len(px) / 255.0
                lo, hi = min(px) / 255.0, max(px) / 255.0
                var = sum((p / 255.0 - mean) ** 2 for p in px) / len(px)
                return [
                    float(w) / 65535.0,
                    float(h) / 65535.0,
                    float(w) / max(float(h), 1.0) / 16.0,
                    mean,
                    lo,
                    hi,
                    var,
                    float(len(px)) / 64.0,
                ][:dim]

        for pdf in batches:
            # bound batch size so one Arrow batch never balloons executor memory
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                contents = chunk[content_col]
                yield _pd.DataFrame(
                    {
                        "media_id": chunk[id_col].astype("int64"),
                        "n_bytes": contents.map(lambda b: len(b or b"")).astype("int64"),
                        "sha": contents.map(
                            lambda b: _hl.sha256(b or b"").hexdigest()
                        ),
                        "features": contents.map(_feats),
                    }
                )

    return df.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    id_col: str = "media_id",
    fake: bool = False,
    batch_limit: int = 1024,
) -> DataFrame:
    """Resize images to (target_w, target_h) via ``mapInPandas`` — same
    Arrow-batched narrow plan as the decode step. ``fake=True`` emits a
    deterministic truncated/padded payload of ``target_w*target_h``
    bytes (batch shape, memory bounds, schema exercised for real);
    ``fake=False`` runs a REAL PIL bilinear resize (raw grayscale bytes
    out) when PIL is importable on the executors, else raises."""

    n_out = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io

        if fake:
            def _resize(b):
                return (b or b"").ljust(n_out, b"\0")[:n_out]
        else:
            try:
                from PIL import Image as _Image
            except ImportError as exc:
                raise NotImplementedError(
                    "real image resize requires PIL (not in this container); "
                    "pass fake=True for the deterministic stub"
                ) from exc

            def _resize(b):
                img = _Image.open(_io.BytesIO(b or b"")).convert("L")
                return img.resize((target_w, target_h)).tobytes()

        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                yield pd.DataFrame(
                    {
                        "media_id": chunk[id_col].astype("int64"),
                        "width": target_w,
                        "height": target_h,
                        "content": chunk[content_col].map(_resize),
                    }
                )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plan for video rows: explode one row per sampled
    timestamp (decode of the actual frame is the stubbed step). Pure
    Column algebra — the expensive part stays columnar."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthesize_media_table(spark, documents_path: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from the documents fixture
    (binary payload = utf-8 text bytes) — exercises the binary-column
    plumbing without container media libs."""
    from elephant_twin_spark.sources import tables

    docs = tables.load_raw(spark, documents_path)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )
