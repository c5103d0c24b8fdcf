"""Multimodal binary-column plumbing: schema, batching, determinism."""

import numpy as np
import pytest

from tse_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.media_df(spark, 120).repartition(5)
    df.cache().count()
    return df


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_deterministic(spark, media):
    a = {r["media_id"]: r for r in mm.decode_image_features(media).collect()}
    b = {
        r["media_id"]: r
        for r in mm.decode_image_features(media.repartition(11)).collect()
    }
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        assert a[k]["mean_px"] == b[k]["mean_px"]
    # oracle check on one row
    pdf = mm.gen_media(120)
    row = pdf[pdf.kind != "audio"].iloc[0]
    px = mm._fake_pixels(
        bytes(row.payload), row.meta["width"], row.meta["height"]
    )
    got = a[row.media_id]
    assert got["mean_px"] == pytest.approx(float(px.mean()))
    assert got["std_px"] == pytest.approx(float(px.std()))


def test_resize_shape(media):
    out = mm.resize_images(media, 8, 6).collect()
    assert len(out) > 0
    for r in out:
        assert r["width"] == 8 and r["height"] == 6
        assert len(bytes(r["payload"])) == 8 * 6


def test_frame_sampling(media):
    rows = mm.sample_video_frames(media, every_n=4).collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_no"])
    pdf = mm.gen_media(120)
    for mid, frames in by_id.items():
        n = int(pdf.loc[pdf.media_id == mid, "meta"].iloc[0]["n_frames"])
        assert sorted(frames) == list(range(0, n, 4))


def test_audio_features(media):
    rows = mm.audio_features(media, n_bands=8).collect()
    assert rows
    for r in rows:
        assert len(r["bands"]) == 8
        assert r["duration_s"] > 0
    # oracle one row
    pdf = mm.gen_media(120)
    row = pdf[pdf.kind == "audio"].iloc[0]
    a = np.frombuffer(bytes(row.payload), dtype=np.uint8).astype(float) - 128.0
    pad = (-a.size) % 8
    if pad:
        a = np.pad(a, (0, pad))
    want = np.abs(a.reshape(8, -1)).mean(axis=1)
    got = {r["media_id"]: r for r in rows}[row.media_id]
    assert got["bands"] == pytest.approx(list(want))


def test_real_backend_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        mm.decode_image_features(media, decode_backend="pillow")
