"""Multimodal column handling (SURVEY §2 #41).

Media is carried as an opaque ``binary`` payload column plus a typed
metadata struct — the layout a 100 TB multimodal corpus uses (payload
bytes in parquet, metadata queryable without touching bytes).  The
Spark-side plumbing (schemas, Arrow-batched mapInPandas, partition
behavior) is real and tested; the actual image/audio codecs are NOT
available in this environment, so decode is stubbed: by default it
raises NotImplementedError, and tests use the deterministic fake
decoder to exercise the pipeline end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("format", StringType()),      # png | wav | mp4 | ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feat_dim", IntegerType()),
        StructField("feat_norm", StringType()),   # hex digest of the feature block
        StructField("decoded_ok", IntegerType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents corpus:
    payload = utf-8 bytes of the text, metadata derived from doc fields.
    Stands in for real image/audio ingestion so the binary-column
    plumbing is exercised with real bytes."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        fmt.alias("format"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def _real_decode(payload: bytes, fmt: str) -> bytes:
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/librosa) are not available in this "
        "environment; pass decoder=fake_decode to exercise the pipeline"
    )


def fake_decode(payload: bytes, fmt: str) -> bytes:
    """Deterministic stand-in decoder: 'decodes' a payload to a
    64-byte pseudo-feature block derived from its content hash."""
    h = hashlib.sha256(payload or b"").digest()
    return (h + h)[:64]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], bytes] = _real_decode,
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    The UDF sees pandas batches (zero-copy Arrow transfer of the binary
    column), decodes each payload, and emits fixed-width features.  At
    scale this is the only Python hop in the pipeline; everything
    before (metadata pruning) and after (feature joins) stays JVM-side.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, kind, fmt, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["format"], pdf["payload"]
            ):
                try:
                    block = decoder(bytes(payload), fmt)
                    feats.append((mid, kind, len(block), block.hex()[:16], 1))
                except NotImplementedError:
                    feats.append((mid, kind, 0, "", 0))
            yield pd.DataFrame(
                feats, columns=["media_id", "kind", "feat_dim", "feat_norm", "decoded_ok"]
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, str, int, int], bytes] = None,
) -> DataFrame:
    """Resize plan for image media via Arrow-batched mapInPandas.

    Without a real codec the default resizer is a deterministic fake
    (content-hash-seeded bytes of width*height length, so output size
    is verifiable); the Spark-side contract — schema, batch shape,
    payload round-trip, metadata update — is real.  Batches stream
    through Arrow; payload bytes never land on the driver.
    """
    if resizer is None:
        def resizer(payload: bytes, fmt: str, w: int, h: int) -> bytes:
            h0 = hashlib.sha256(payload or b"").digest()
            reps = (w * h) // len(h0) + 1
            return (h0 * reps)[: w * h]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                resizer(bytes(p), f, width, height)
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            out["width"] = width
            out["height"] = height
            out["n_bytes"] = [len(p) for p in out["payload"]]
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video media: emits (media_id, frame_idx)
    rows for every ``every_n``-th frame of a fake fixed frame count
    derived from n_bytes — the real decoder would replace the count.
    JVM-side sequence+explode; no Python."""
    n_frames = (F.col("n_bytes") % 300 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.filter(F.col("kind") == "video").select(
        "media_id", F.explode(idx).alias("frame_idx")
    )
