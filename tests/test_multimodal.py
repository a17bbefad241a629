"""Multimodal plumbing: schemas, batch mechanics, deterministic stubs."""

import pytest


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, b"\xff\xd8\xff" + b"jpegdata" * 50),
        (2, b"\x89PNG\r\n\x1a\n" + b"pngdata" * 80),
        (3, b"RIFF" + b"wavdata" * 200),
        (4, None),
    ]
    return spark.createDataFrame(rows, "id LONG, media BINARY")


def test_attach_media_meta(media_df):
    from searchlite_spark.textops.multimodal import attach_media_meta

    rows = {r["id"]: r["meta"] for r in attach_media_meta(media_df).collect()}
    assert rows[1]["mime"] == "image/jpeg"
    assert rows[2]["mime"] == "image/png"
    assert rows[3]["mime"] == "audio/wav"
    assert rows[4] is None
    assert rows[1]["n_bytes"] == 3 + 8 * 50
    assert len(rows[1]["sha1"]) == 40


def test_extract_features_shape_and_determinism(media_df):
    from searchlite_spark.textops.multimodal import extract_features

    out1 = {r["id"]: r["features"] for r in extract_features(media_df, dim=32).collect()}
    out2 = {r["id"]: r["features"] for r in extract_features(media_df, dim=32).collect()}
    assert len(out1[1]) == 32
    assert out1[1] == out2[1]  # deterministic
    assert out1[4] is None
    assert out1[1] != out1[2]


def test_sample_frames(media_df):
    from searchlite_spark.textops.multimodal import sample_frames

    rows = sample_frames(media_df, every_ms=100, max_frames=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    assert 1 <= len(by_id[3]) <= 4
    assert all(r["frame"] is not None for r in by_id[3])
    assert [r["frame_idx"] for r in by_id[3]] == list(range(len(by_id[3])))
    assert 4 not in by_id  # NULL media produces no frames
