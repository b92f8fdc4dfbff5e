"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decoded / feature-extracted by actor-pool stages.

Codec libraries are OPTIONAL dependencies, imported once per actor in
__init__ (the stateful-stage pattern): `DecodeImage(fake=False)` uses
Pillow when importable and raises NotImplementedError at construction
when it is not (this container has no codecs).  `fake=True` runs a
deterministic fake decode (dimensions/features derived from the payload
bytes) with the IDENTICAL output schema, so the Ray-side plumbing --
schema, batch sizing, actor signature, output layout -- is real and
tested either way.  tests/test_text_ann.py exercises the real branch
under `pytest.importorskip` so it runs wherever Pillow exists.
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


def _import_pil():
    try:
        from PIL import Image
        return Image
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed in this "
            "environment; construct with fake=True for the deterministic "
            "stub decode") from e


class DecodeImage:
    """Actor-pool decode stage.  Real pipelines: small batch_size (payloads
    are MBs), concurrency sized to CPU, decode library loaded ONCE here
    (per actor, in __init__ -- missing codec fails at pool construction,
    not per batch)."""

    def __init__(self, fake: bool = False, thumb: int = 8):
        self.fake = fake
        self.thumb = thumb
        self._codec = None if fake else _import_pil()

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.thumb
        if not self.fake:
            import io
            widths, heights, feats = [], [], []
            for payload in batch["payload"].to_pylist():
                img = self._codec.open(io.BytesIO(payload))
                widths.append(img.size[0])
                heights.append(img.size[1])
                small = img.convert("L").resize((t, t))
                feats.append(np.asarray(small, dtype=np.float32).reshape(-1))
            return pa.table({
                "media_id": batch["media_id"],
                "width": pa.array(np.array(widths, np.int64)),
                "height": pa.array(np.array(heights, np.int64)),
                "thumb_feature": pa.array([f.tolist() for f in feats],
                                          pa.list_(pa.float32())),
            })
        h = hash_strings(batch["payload"])
        width, height = _fake_dims(h)
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
        self._codec = None if fake else _import_pil()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            import io
            ow, oh = [], []
            for payload in batch["payload"].to_pylist():
                img = self._codec.open(io.BytesIO(payload))
                ow.append(img.size[0])
                oh.append(img.size[1])
            wi = np.array(ow, np.int64)
            hi = np.array(oh, np.int64)
        else:
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
            try:
                import soundfile  # once per actor
                self._codec = soundfile
            except ImportError as e:
                raise NotImplementedError(
                    "audio decode requires soundfile (or similar), not "
                    "installed in this environment; use fake=True") from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            import io
            durs, feats = [], []
            for payload in batch["payload"].to_pylist():
                wav, sr = self._codec.read(io.BytesIO(payload))
                wav = np.asarray(wav, dtype=np.float32)
                if wav.ndim > 1:
                    wav = wav.mean(axis=1)
                durs.append(len(wav) / max(1, sr))
                # windowed RMS bands as the feature stand-in (real MFCC
                # would need a dsp lib): n_windows x n_mels grid; empty
                # segments (audio shorter than the grid) score 0, not NaN
                rows = []
                for w in np.array_split(wav, self.n_windows):
                    segs = np.array_split(w, self.n_mels)
                    rows.extend(
                        float(np.sqrt(np.mean(np.square(s)) + 1e-12))
                        if len(s) else 0.0 for s in segs)
                feats.append(np.array(rows, np.float32))
            return pa.table({
                "media_id": batch["media_id"],
                "duration_s": pa.array(np.array(durs, np.float64)),
                "mfcc": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
            })
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
        if not fake:
            try:
                import av  # PyAV, once per actor
                self._codec = av
            except ImportError as e:
                raise NotImplementedError(
                    "video decode requires PyAV, not installed in this "
                    "environment; use fake=True") from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            import io
            ids, frame_no, fh = [], [], []
            for mid, payload in zip(batch["media_id"].to_pylist(),
                                    batch["payload"].to_pylist()):
                with self._codec.open(io.BytesIO(payload)) as container:
                    frames = [f.to_ndarray(format="gray")
                              for f in container.decode(video=0)]
                step = max(1, len(frames) // self.n_frames)
                for j, fi in enumerate(range(0, len(frames), step)
                                       [:self.n_frames]):
                    ids.append(mid)
                    frame_no.append(j)
                    fh.append(hash_strings(
                        pa.array([frames[fi].tobytes()]))[0])
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(np.array(frame_no, np.int32)),
                "frame_hash": pa.array(np.array(fh, np.uint64), pa.uint64()),
            })
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
