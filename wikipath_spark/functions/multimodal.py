"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a typed metadata struct;
all Spark-side plumbing (schema, batching, partition sizing, Arrow transfer)
is real and tested.  The actual media decode is STUBBED — the codec
libraries are not in this container — behind ``decoder=`` hooks:

- ``"fake"``  (default): deterministic pseudo-decode from the payload bytes,
  so pipelines and tests exercise the full path end-to-end.
- ``"real"``: raises ``NotImplementedError`` with the dependency note.

``mapInPandas`` is used (not a scalar UDF) because media decode wants batch
amortization and per-batch library state; batch shape is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, kind string, declared_width int, declared_height int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_sha256 string, "
    "width int, height int, feature_hash long"
)


def documents_as_media(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text table as a media table (payload = utf-8 bytes) — the test
    stand-in for real image/audio payloads."""
    return documents.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.when(F.col(id_col) % 3 == 0, "image").when(F.col(id_col) % 3 == 1, "audio").otherwise("video")).alias("kind"),
        (F.col(id_col) % 640 + 1).cast("int").alias("declared_width"),
        (F.col(id_col) % 480 + 1).cast("int").alias("declared_height"),
    )


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic pseudo-decode: features derived from payload bytes only."""
    payloads = batch["payload"]
    sha = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
    n_bytes = payloads.map(len)
    fh = sha.map(lambda s: int(s[:15], 16))
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": n_bytes,
            "content_sha256": sha,
            "width": batch["declared_width"],
            "height": batch["declared_height"],
            "feature_hash": fh,
        }
    )


def extract_media_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the media table."""
    if decoder == "real":

        def real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real media decode requires PIL/librosa/ffmpeg, absent in this "
                "environment; use decoder='fake' for the plumbing path"
            )

        return media.mapInPandas(real, schema=FEATURE_SCHEMA)

    def fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _fake_decode(b)

    return media.mapInPandas(fake, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payload through, rewrites declared dims —
    the real resample kernel would replace the identity payload map."""
    return media.withColumn("declared_width", F.lit(width).cast("int")).withColumn(
        "declared_height", F.lit(height).cast("int")
    )


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id, frame_no,
    frame_payload) with a deterministic byte-slice standing in for the frame
    decode. Non-video rows pass through with frame_no = 0."""
    is_video = F.col("kind") == "video"
    frames = F.when(
        is_video, F.sequence(F.lit(0), F.least(F.floor(F.length("payload") / every_n), F.lit(9)))
    ).otherwise(F.array(F.lit(0)))
    return media.select(
        "media_id",
        "kind",
        F.explode(frames).alias("frame_no"),
        F.substring(
            "payload", 1, 64
        ).alias("frame_payload"),  # stub: real impl would seek per frame
    )
