"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decoded / feature-extracted by actor-pool stages.

The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are STUBS: `DecodeImage(fake=True)` runs a
deterministic fake decode (dimensions/features derived from the bytes) so
the Ray-side plumbing -- schema, batch sizing, actor signature, output
layout -- is real and tested; `fake=False` raises NotImplementedError at
the exact point a codec would be called.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import hash_strings
from .util import pool

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # "image" | "audio" | "video"
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("meta", pa.string()),           # json sidecar (mime, source...)
])


def _fake_dims(payload_hashes: np.ndarray):
    """Deterministic fake image dimensions from payload hashes -- SHARED
    by DecodeImage and ResizeImage so the stubs compose (a resize of a
    decoded image sees the same original dimensions)."""
    w = (128 + (payload_hashes % np.uint64(512))).astype(np.int64)
    h = (128 + ((payload_hashes >> np.uint64(16)) % np.uint64(512))
         ).astype(np.int64)
    return w, h


class DecodeImage:
    """Actor-pool decode stage.  Real pipelines: small batch_size (payloads
    are MBs), concurrency sized to CPU, decode library loaded ONCE here."""

    def __init__(self, fake: bool = False, thumb: int = 8):
        self.fake = fake
        self.thumb = thumb
        if not fake:
            # the import would live here (once per actor):
            #   from PIL import Image
            self._codec = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "no image codec in this environment; construct with "
                "fake=True for the deterministic stub decode")
        h = hash_strings(batch["payload"])
        width, height = _fake_dims(h)
        t = self.thumb
        # fake "pixels": deterministic bytes derived from the payload hash
        feats = []
        for hv in h:
            rng = np.random.default_rng(int(hv) & 0xFFFFFFFF)
            feats.append(rng.integers(0, 256, t * t,
                                      dtype=np.uint8).astype(np.float32))
        return pa.table({
            "media_id": batch["media_id"],
            "width": pa.array(width),
            "height": pa.array(height),
            "thumb_feature": pa.array([f.tolist() for f in feats],
                                      pa.list_(pa.float32())),
        })


class ResizeImage:
    """Image resize stub: fake=True emits deterministic resized dimensions
    (aspect-preserving fit into max_side x max_side) + a fake thumbnail
    derived from the payload hash; fake=False raises where PIL's
    Image.resize would run."""

    def __init__(self, fake: bool = False, max_side: int = 64):
        self.fake = fake
        self.max_side = max_side
        if not fake:
            self._codec = None   # `from PIL import Image` would live here

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "no image codec in this environment; use fake=True")
        h = hash_strings(batch["payload"])
        wi, hi = _fake_dims(h)
        w, ht = wi.astype(np.float64), hi.astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, ht))
        return pa.table({
            "media_id": batch["media_id"],
            "orig_width": pa.array(w.astype(np.int64)),
            "orig_height": pa.array(ht.astype(np.int64)),
            "width": pa.array(np.round(w * scale).astype(np.int64)),
            "height": pa.array(np.round(ht * scale).astype(np.int64)),
        })


class ExtractAudioFeatures:
    """Audio feature-extraction stub (MFCC-shaped output): fake=True emits a
    deterministic (n_windows x n_mels) feature matrix derived from the
    payload bytes; fake=False raises at the exact point a codec
    (torchaudio/librosa) would be called -- the Ray-side plumbing (actor
    pool, small batches, list<list<float>> output) is real."""

    def __init__(self, fake: bool = False, n_mels: int = 8,
                 n_windows: int = 4):
        self.fake = fake
        self.n_mels = n_mels
        self.n_windows = n_windows
        if not fake:
            # the import would live here (once per actor):
            #   import torchaudio
            self._codec = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "no audio codec in this environment; use fake=True")
        h = hash_strings(batch["payload"])
        dur = (1 + (h % np.uint64(30))).astype(np.float64)
        feats = []
        for hv in h:
            rng = np.random.default_rng(int(hv) & 0xFFFFFFFF)
            feats.append(rng.standard_normal(
                self.n_windows * self.n_mels).astype(np.float32))
        return pa.table({
            "media_id": batch["media_id"],
            "duration_s": pa.array(dur),
            "mfcc": pa.array([f.tolist() for f in feats],
                             pa.list_(pa.float32())),
        })


class SampleFrames:
    """Video frame-sampling stub: emits `n_frames` pseudo-frames per video
    (flat_map shape: one output row per frame)."""

    def __init__(self, fake: bool = False, n_frames: int = 4):
        self.fake = fake
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "no video codec in this environment; use fake=True")
        h = hash_strings(batch["payload"])
        ids = np.asarray(batch["media_id"]).repeat(self.n_frames)
        frame_no = np.tile(np.arange(self.n_frames), len(batch))
        fh = (np.asarray(h).repeat(self.n_frames)
              + frame_no.astype(np.uint64))
        return pa.table({
            "media_id": pa.array(ids),
            "frame_no": pa.array(frame_no.astype(np.int32)),
            "frame_hash": pa.array(fh, pa.uint64()),
        })


def synth_media_dataset(n: int = 64, seed: int = 5, kind: str = "image"):
    """Deterministic synthetic media table for plumbing tests."""
    import json

    import ray.data as rd
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, 256 + int(rng.integers(0, 512)),
                               dtype=np.uint8).tobytes()
        rows.append({"media_id": i, "kind": kind, "payload": payload,
                     "meta": json.dumps({"mime": f"{kind}/fake"})})
    return rd.from_items(rows)


def decode_images(ds, fake: bool = True, concurrency: int = 2,
                  batch_size: int = 16):
    """Decode stage wiring: actor pool, small batches (binary payloads)."""
    return ds.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(fake=fake), concurrency=pool(concurrency))


def resize_images(ds, fake: bool = True, concurrency: int = 2,
                  batch_size: int = 16, max_side: int = 64):
    return ds.map_batches(
        ResizeImage, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(fake=fake, max_side=max_side),
        concurrency=pool(concurrency))


def extract_audio_features(ds, fake: bool = True, concurrency: int = 2,
                           batch_size: int = 16):
    return ds.map_batches(
        ExtractAudioFeatures, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(fake=fake), concurrency=pool(concurrency))


def sample_frames(ds, fake: bool = True, concurrency: int = 2,
                  batch_size: int = 16, n_frames: int = 4):
    return ds.map_batches(
        SampleFrames, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(fake=fake, n_frames=n_frames),
        concurrency=pool(concurrency))
