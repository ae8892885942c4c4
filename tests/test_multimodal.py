import pytest

from mergeextractor_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    encode_fake_image,
    image_metadata,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        {"media_id": 1, "kind": "image", "payload": encode_fake_image(64, 48), "mime": "image/fake"},
        {"media_id": 2, "kind": "image", "payload": encode_fake_image(8, 8, fill=7), "mime": "image/fake"},
        {"media_id": 3, "kind": "image", "payload": b"garbage", "mime": "image/fake"},
        {"media_id": 4, "kind": "video", "payload": bytes(range(200)), "mime": "video/fake"},
        {"media_id": 5, "kind": "audio", "payload": b"\x00" * 32, "mime": "audio/fake"},
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_decode_stub_requires_codec():
    with pytest.raises(NotImplementedError):
        decode_image(b"whatever", codec=None)


def test_image_metadata(media_df):
    out = {r.media_id: r for r in image_metadata(media_df).collect()}
    assert set(out) == {1, 2, 3}  # only kind == image
    assert (out[1].width, out[1].height) == (64, 48)
    assert (out[2].width, out[2].height) == (8, 8)
    assert (out[3].width, out[3].height) == (-1, -1)  # undecodable → sentinel
    assert out[1].n_bytes == len(encode_fake_image(64, 48))


def test_frame_sampling_fanout(media_df):
    frames = sample_frames(media_df, every_n_bytes=64).collect()
    assert {f.media_id for f in frames} == {4}
    assert [f.frame_idx for f in sorted(frames, key=lambda f: f.frame_idx)] == [0, 1, 2, 3]
    assert sum(len(f.frame) for f in frames) == 200
