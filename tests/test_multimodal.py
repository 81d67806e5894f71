from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import FIXTURE_BASE
from webalizer_spark.operators.multimodal import (
    _decode_fake,
    extract_features,
    gen_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    path = gen_media(f"{FIXTURE_BASE}/media", n=120)
    return spark.read.parquet(path)


def test_feature_extraction(spark, media):
    feats = extract_features(media).toPandas().sort_values("media_id")
    assert len(feats) == 120
    assert feats["ok"].all()
    # cross-check one row against a local decode
    row = media.filter("media_id = 7").collect()[0]
    arr, shape = _decode_fake(bytes(row["payload"]), row["kind"])
    got = feats[feats["media_id"] == 7].iloc[0]
    assert abs(got["mean_val"] - float(arr.mean())) < 1e-12
    assert got["decoded_shape"] == "x".join(map(str, shape))


def test_resize_deterministic(spark, media):
    a = resize_images(media).toPandas().sort_values("media_id").reset_index(drop=True)
    b = resize_images(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)
    n_images = media.filter("kind = 'image'").count()
    assert len(a) == n_images


def test_frame_sampling(spark, media):
    frames = sample_frames(media, every=4).toPandas()
    vids = media.filter("kind = 'video'").select("media_id", "n_frames").toPandas()
    expect = int(sum((nf + 3) // 4 for nf in vids["n_frames"]))
    assert len(frames) == expect
    assert (frames["frame_idx"] % 4 == 0).all()


def test_corrupt_media_routes_not_crashes(spark, media):
    from pyspark.sql import functions as F
    corrupted = media.withColumn(
        "payload",
        F.when(F.col("media_id") % 10 == 0,
               F.lit(b"garbage")).otherwise(F.col("payload")))
    feats = extract_features(corrupted).toPandas()
    bad = feats[~feats["ok"]]
    assert len(bad) == 12
    assert bad["mean_val"].isna().all()
