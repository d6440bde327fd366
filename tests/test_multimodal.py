"""Multimodal plumbing tests (SURVEY §2 #41): the binary-column
pipeline is real (schema, Arrow batching, partition behavior); only the
codec itself is stubbed."""

import pytest
from pyspark.sql import functions as F

from marketstore_spark.catalog import load_table
from marketstore_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    fake_decode,
    frame_sample,
    media_from_documents,
)


@pytest.fixture()
def media(spark, sf_dir):
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def test_media_schema_and_payload(media):
    got = [(f.name, f.dataType) for f in media.schema.fields]
    want = [(f.name, f.dataType) for f in MEDIA_SCHEMA.fields]
    assert got == want
    row = media.filter(F.col("n_bytes") > 0).first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert len(bytes(row["payload"])) == row["n_bytes"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_stub_raises_flagged(media):
    """Default decoder is the honest NotImplementedError stub: rows come
    back flagged undecoded rather than crashing the pipeline."""
    out = extract_features(media.limit(10))
    assert out.schema == FEATURE_SCHEMA
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["decoded_ok"] == 0 for r in rows)


def test_extract_features_fake_decoder_deterministic(media):
    out1 = extract_features(media.limit(20), decoder=fake_decode).orderBy("media_id").collect()
    out2 = extract_features(media.limit(20), decoder=fake_decode).orderBy("media_id").collect()
    assert [r["feat_norm"] for r in out1] == [r["feat_norm"] for r in out2]
    assert all(r["decoded_ok"] == 1 and r["feat_dim"] == 64 for r in out1)


def test_extract_features_arrow_batching(media):
    """The binary column must arrive at Python in Arrow batches (many
    rows per pandas frame), not row-at-a-time."""
    import pandas as pd

    def batch_sizes(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    sizes = media.coalesce(1).mapInPandas(batch_sizes, "n long").toPandas()
    assert sizes["n"].sum() == media.count()
    assert sizes["n"].max() > 1


def test_frame_sample_plan(media):
    frames = frame_sample(media, every_n=10)
    assert frames.columns == ["media_id", "frame_idx"]
    pdf = frames.groupBy("media_id").agg(F.max("frame_idx").alias("mx")).toPandas()
    assert (pdf["mx"] % 10 == 0).all()
    only_video = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == only_video


def test_resize_images_plumbing(spark, sf_dir):
    from marketstore_spark.operators.multimodal import media_from_documents, resize_images

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    out = resize_images(media, 32, 16)
    rows = out.limit(20).collect()
    assert len(rows) > 0
    assert all(r["kind"] == "image" for r in rows)
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows)
    assert all(len(r["payload"]) == 32 * 16 == r["n_bytes"] for r in rows)
    # deterministic: same input -> same payload
    again = {r["media_id"]: r["payload"] for r in out.limit(20).collect()}
    assert all(again[r["media_id"]] == r["payload"] for r in rows)
