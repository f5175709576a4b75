"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): each stage either raises ``NotImplementedError``
(``mode="real"``) or produces a deterministic fake derived from the
payload bytes (``mode="fake"``), so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested.

Scale notes baked into the design:
- payloads are LARGE: callers pass a small ``batch_size`` (e.g. 16-64) so
  batch × concurrency fits worker heaps; blocks holding binary columns
  should be read with a reduced ``target_max_block_size``;
- decode state (codec tables, a model) loads once per actor in
  ``__init__`` — the reference's lazily-loaded CodeBERT pattern
  (``models/feature_extraction.py:37-43``);
- outputs are fixed-size-list feature columns, never re-encoded payloads,
  so everything downstream of decode is narrow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def _fake_floats(payload: bytes, n: int, salt: bytes) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (sha256-seeded)."""
    seed = int.from_bytes(hashlib.sha256(salt + payload).digest()[:4], "little")
    return np.random.RandomState(seed).standard_normal(n).astype(np.float32)


class ImageFeatureStage:
    """binary payload -> ``image_feat: fixed_size_list<float, dim>``.

    ``mode="real"`` is the integration point for an actual decoder+model
    (would load once here in ``__init__``); unavailable in this container.
    """

    def __init__(self, dim: int = 64, mode: str = "fake", payload_col: str = "payload"):
        if mode not in ("fake", "real"):
            raise ValueError("mode must be 'fake' or 'real'")
        self.dim, self.mode, self.payload_col = dim, mode, payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "environment; run with mode='fake' for plumbing tests"
            )
        payloads = batch[self.payload_col].to_pylist()
        feats = np.stack(
            [_fake_floats(p if p is not None else b"", self.dim, b"img") for p in payloads]
        )
        col = pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), self.dim)
        return batch.drop_columns([self.payload_col]).append_column("image_feat", col)


class AudioFeatureStage:
    """binary payload -> ``audio_feat`` + ``duration_s`` (stubbed decode)."""

    def __init__(self, dim: int = 32, mode: str = "fake", payload_col: str = "payload"):
        self.dim, self.mode, self.payload_col = dim, mode, payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("audio decode unavailable; use mode='fake'")
        payloads = batch[self.payload_col].to_pylist()
        rates = batch["sample_rate"].to_numpy(zero_copy_only=False)
        feats = np.stack([_fake_floats(p or b"", self.dim, b"aud") for p in payloads])
        durations = np.array(
            [len(p or b"") / max(int(r) if r else 16000, 1) for p, r in zip(payloads, rates)],
            dtype=np.float64,
        )
        col = pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), self.dim)
        out = batch.drop_columns([self.payload_col]).append_column("audio_feat", col)
        return out.append_column("duration_s", pa.array(durations))


class VideoFrameSampleStage:
    """binary payload -> ``n_frames_sampled`` + per-frame feature list
    (stub samples every ``stride``-th fake frame)."""

    def __init__(self, stride: int = 10, dim: int = 16, mode: str = "fake", payload_col: str = "payload"):
        self.stride, self.dim, self.mode, self.payload_col = stride, dim, mode, payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("video decode unavailable; use mode='fake'")
        n_frames = batch["n_frames"].to_numpy(zero_copy_only=False)
        payloads = batch[self.payload_col].to_pylist()
        sampled, feats = [], []
        for p, nf in zip(payloads, n_frames):
            take = max(1, int(nf or 0) // self.stride) if nf else 0
            sampled.append(take)
            feats.append(_fake_floats(p or b"", take * self.dim, b"vid").reshape(take, self.dim).tolist())
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("n_frames_sampled", pa.array(sampled, type=pa.int32()))
        return out.append_column(
            "frame_feats", pa.array(feats, type=pa.list_(pa.list_(pa.float32(), self.dim)))
        )


class ImageResizeStage:
    """binary payload -> resized binary payload + updated width/height.

    ``mode="real"`` is the decode→resize→re-encode integration point (the
    codec would load once per actor here); the stub emits a deterministic
    payload of size scaled by the target/source area ratio, so downstream
    stages see realistic byte-volume reduction and the metadata columns
    stay consistent (width/height always reflect the payload)."""

    def __init__(self, target_w: int = 224, target_h: int = 224, mode: str = "fake", payload_col: str = "payload"):
        if mode not in ("fake", "real"):
            raise ValueError("mode must be 'fake' or 'real'")
        self.tw, self.th, self.mode, self.payload_col = target_w, target_h, mode, payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("image decode unavailable; use mode='fake'")
        payloads = batch[self.payload_col].to_pylist()
        ws = batch["width"].to_numpy(zero_copy_only=False)
        hs = batch["height"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        out_payloads = []
        for p, w, h in zip(payloads, ws, hs):
            p = p or b""
            src_area = max(int(w or 1) * int(h or 1), 1)
            scale = (self.tw * self.th) / src_area
            target_len = max(8, int(len(p) * min(scale, 1.0)))
            digest = hashlib.sha256(b"rsz" + p).digest()
            reps = target_len // len(digest) + 1
            out_payloads.append((digest * reps)[:target_len])
        out = batch.drop_columns([self.payload_col, "width", "height"])
        out = out.append_column("payload", pa.array(out_payloads, type=pa.binary()))
        out = out.append_column("width", pa.array(np.full(n, self.tw, dtype=np.int32)))
        return out.append_column("height", pa.array(np.full(n, self.th, dtype=np.int32)))


def media_features(ds, stage_cls, batch_size: int = 32, concurrency: int | None = None, **stage_kwargs):
    """Run a media feature stage as an actor pool with small batches —
    large binary payloads need batch × concurrency sized to worker heaps."""
    return ds.map_batches(
        stage_cls,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (tests/demos)."""
    rng = np.random.RandomState(seed)
    types = np.array(["image", "audio", "video"], dtype=object)[rng.randint(0, 3, n)]
    payloads = [rng.bytes(rng.randint(64, 512)) for _ in range(n)]
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(types, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(rng.randint(16, 1024, n).astype(np.int32)),
            "height": pa.array(rng.randint(16, 1024, n).astype(np.int32)),
            "sample_rate": pa.array(np.full(n, 16000, dtype=np.int32)),
            "n_frames": pa.array(rng.randint(1, 300, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )
