"""Multimodal plumbing: binary payload columns, mapInPandas feature stage."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.operators.multimodal import (
    decode_image_features,
    frame_sample,
    synth_media,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    return synth_media(docs).cache()


def test_real_decode_capability_gated(media):
    """Without Pillow the real path raises up front; with it, it decodes.
    Exactly one branch runs per environment — this container has no Pillow,
    so here the raise branch is the live one."""
    from bop_consus_importing_rdf_spark.operators.multimodal import _pillow

    if _pillow() is None:
        with pytest.raises(NotImplementedError):
            decode_image_features(media, fake=False)
    else:
        feats = decode_image_features(media.limit(0), fake=False)
        assert "feature" in feats.columns


def test_real_decode_with_pillow(spark):
    """Real decode branch — runs wherever Pillow is importable."""
    Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    Image.new("L", (16, 16), color=128).save(buf, format="PNG")
    m = spark.createDataFrame(
        [("p1", "image", bytearray(buf.getvalue()), (16, 16, 0, 1))],
        "media_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    row = decode_image_features(m, n_dims=4, fake=False).first()
    assert len(row.feature) == 4
    assert all(abs(v - 128 / 255.0) < 1e-6 for v in row.feature)


def test_fake_decode_plumbing(spark, media):
    feats = decode_image_features(media, n_dims=8, fake=True).cache()
    assert feats.count() == media.count()
    row = feats.orderBy("media_id").first()
    assert len(row.feature) == 8
    assert all(0.0 <= v <= 1.0 for v in row.feature)
    # md5 must match a driver-side recomputation (deterministic decode)
    src = media.filter(F.col("media_id") == row.media_id).first()
    assert row.payload_md5 == hashlib.md5(bytes(src.payload)).hexdigest()
    assert row.n_bytes == len(bytes(src.payload))


def test_frame_sample(spark):
    m = spark.createDataFrame(
        [("v1", "video", bytearray(b"x"), (0, 0, 0, 10)),
         ("i1", "image", bytearray(b"y"), (0, 0, 0, 1))],
        "media_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    got = frame_sample(m, every_nth=3).collect()
    assert {(r.media_id, r.frame_idx) for r in got} == {
        ("v1", 0), ("v1", 3), ("v1", 6), ("v1", 9)
    }
