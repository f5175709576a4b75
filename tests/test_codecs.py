"""Stdlib media codecs (functions/codecs.py) and the multimodal stages'
real decode mode: PNG/WAV/RAWV roundtrips, filter reconstruction, and
actor-pool real-mode feature extraction over genuinely decodable bytes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from anomalydetection_ray.functions.codecs import (
    decode_png,
    decode_rawv,
    decode_wav,
    encode_png,
    encode_rawv,
    encode_wav,
    resize_nearest,
)


def test_png_roundtrip_all_channel_counts():
    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, (13, 17, ch), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)


def test_png_decodes_filtered_rows():
    """Decoder handles filter types beyond 0: re-encode gradient data via
    zlib with Sub/Up/Average/Paeth-filtered scanlines, byte-exact."""
    import struct
    import zlib

    w, h = 9, 5
    img = (np.arange(w * h * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(h, w, 3)
    # hand-build a PNG whose rows cycle through filters 1..4 then 0
    rows = []
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int64)
        f = (y % 5)
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([[0, 0, 0], cur[:-3]])
            enc = (cur - left) % 256
        elif f == 2:  # Up
            enc = (cur - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([[0, 0, 0], cur[:-3]])
            enc = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            enc = np.zeros_like(cur)
            for x in range(w * 3):
                left = int(cur[x - 3]) if x >= 3 else 0
                up = int(prev[x])
                ul = int(prev[x - 3]) if x >= 3 else 0
                p = left + up - ul
                pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
                enc[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(ctype, payload):
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(
            ">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")


def test_wav_roundtrip_and_values():
    t = np.arange(800) / 8000.0
    x = 0.25 * np.sin(2 * np.pi * 440 * t)
    data = encode_wav(x, 8000)
    y, rate = decode_wav(data)
    assert rate == 8000 and y.shape == (800, 1)
    assert np.allclose(y[:, 0], x, atol=1e-3)


def test_rawv_roundtrip():
    frames = np.random.RandomState(3).randint(0, 256, (6, 10, 12), dtype=np.uint8)
    assert np.array_equal(decode_rawv(encode_rawv(frames)), frames)


def test_resize_nearest_shapes_and_identity():
    img = np.random.RandomState(1).randint(0, 256, (20, 30, 3), dtype=np.uint8)
    assert resize_nearest(img, 15, 10).shape == (10, 15, 3)
    assert np.array_equal(resize_nearest(img, 30, 20), img)  # same-size = identity


# ---------------------------------------------------------------------------
# real-mode stages over decodable payloads
# ---------------------------------------------------------------------------


def test_real_mode_stages(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.multimodal import (
        AudioFeatureStage,
        ImageFeatureStage,
        ImageResizeStage,
        VideoFrameSampleStage,
        media_features,
        synthesize_media_table,
    )
    from anomalydetection_ray.pipelines.queries import as_table

    t = synthesize_media_table(30, seed=9, real_payloads=True)
    images = rd.from_arrow(t.filter(pa.compute.equal(t["media_type"], "image")))
    audio = rd.from_arrow(t.filter(pa.compute.equal(t["media_type"], "audio")))
    video = rd.from_arrow(t.filter(pa.compute.equal(t["media_type"], "video")))

    imf = as_table(media_features(images, ImageFeatureStage, batch_size=8, concurrency=2, mode="real", dim=32))
    assert imf.num_rows and imf["image_feat"].type == pa.list_(pa.float32(), 32)
    # head features carry REAL decoded dimensions (w, h, channels)
    first = imf["image_feat"][0].as_py()
    row0 = t.filter(pa.compute.equal(t["media_type"], "image")).slice(0, 1)
    assert first[0] == row0["width"][0].as_py() and first[1] == row0["height"][0].as_py()
    assert first[2] == 3.0

    auf = as_table(media_features(audio, AudioFeatureStage, batch_size=8, concurrency=2, mode="real", dim=16))
    assert auf.num_rows
    # real decoded duration: 1600 samples at 16 kHz = 0.1 s
    assert np.allclose(auf["duration_s"].to_numpy(zero_copy_only=False), 0.1)

    vif = as_table(media_features(video, VideoFrameSampleStage, batch_size=8, concurrency=2, mode="real", stride=2, dim=8))
    nf = t.filter(pa.compute.equal(t["media_type"], "video"))["n_frames"].to_numpy(zero_copy_only=False)
    got = vif["n_frames_sampled"].to_numpy(zero_copy_only=False)
    assert np.array_equal(got, np.ceil(nf / 2).astype(got.dtype))

    rsz = as_table(media_features(images, ImageResizeStage, batch_size=8, concurrency=2, mode="real", target_w=8, target_h=6))
    assert (rsz["width"].to_numpy(zero_copy_only=False) == 8).all()
    from anomalydetection_ray.functions.codecs import decode_png

    dec = decode_png(rsz["payload"][0].as_py())
    assert dec.shape == (6, 8, 3)


def test_real_mode_fails_loudly_on_garbage(ray_session):
    from anomalydetection_ray.functions.multimodal import ImageFeatureStage

    stage = ImageFeatureStage(mode="real")
    with pytest.raises(ValueError):
        stage(pa.table({"payload": pa.array([b"junk bytes"], type=pa.binary())}))


def test_media_stages_survive_empty_blocks():
    """A drained block must flow through the feature stages (np.stack([])
    used to raise) with the same output schema as non-empty blocks."""
    from anomalydetection_ray.functions.multimodal import AudioFeatureStage, ImageFeatureStage

    img = ImageFeatureStage(dim=8, mode="fake")
    empty_img = pa.table({"payload": pa.array([], type=pa.binary())})
    out = img(empty_img)
    full = img(pa.table({"payload": pa.array([b"x"], type=pa.binary())}))
    assert out.num_rows == 0 and out.schema.equals(full.schema)

    aud = AudioFeatureStage(dim=4, mode="fake")
    empty_aud = pa.table({
        "payload": pa.array([], type=pa.binary()),
        "sample_rate": pa.array([], type=pa.int32()),
    })
    out_a = aud(empty_aud)
    full_a = aud(pa.table({
        "payload": pa.array([b"xx"], type=pa.binary()),
        "sample_rate": pa.array([16000], type=pa.int32()),
    }))
    assert out_a.num_rows == 0 and out_a.schema.equals(full_a.schema)


def test_video_fake_mode_frame_count_matches_real_stride_math(ray_session):
    """fake mode must report the same n_frames_sampled real decoding
    yields: frames[::stride] of nf frames is ceil(nf/stride) (round-5
    review: floor undercounted whenever nf % stride != 0)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.multimodal import VideoFrameSampleStage

    for nf, stride, want in ((11, 10, 2), (10, 10, 1), (21, 10, 3), (9, 10, 1)):
        t = pa.table({
            "video": pa.array([b"payload"], type=pa.binary()),
            "n_frames": pa.array([nf], type=pa.int32()),
        })
        out = rd.from_arrow(t).map_batches(
            VideoFrameSampleStage,
            fn_constructor_kwargs={"stride": stride, "dim": 4, "mode": "fake", "payload_col": "video"},
            batch_format="pyarrow",
            concurrency=1,
        ).to_pandas()
        assert out["n_frames_sampled"].tolist() == [want], (nf, stride)
        assert len(out["frame_feats"][0]) == want
        assert want == len(np.zeros(nf)[::stride])
