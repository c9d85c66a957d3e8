"""Multimodal (image/audio/video) stage plumbing.

Treats media as opaque ``binary`` columns with typed metadata, exactly as a
100 TB training-data pipeline would. The Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested, and all three
modalities now have REAL pure-stdlib codecs behind the same contracts:

- image: ``RealImageDecoder`` (BMP / PPM / zlib PNG, ``imagecodec.py``);
- audio: ``RealAudioFeaturizer`` (PCM WAV, ``audiocodec.py``);
- video: ``RealVideoFrameSampler`` (uncompressed AVI, ``videocodec.py``).

Compressed formats (JPEG, MP3, H.264, ...) need codec libraries this
container doesn't ship; ``FakeImageDecoder`` / ``FakeAudioFeaturizer`` /
``FakeVideoFrameSampler`` remain as deterministic stand-ins so pipelines
over such payloads still exercise the schemas and actor shapes end-to-end.

Usage shape (the pattern that matters at scale)::

    ds.map_batches(FakeImageDecoder, batch_format="pyarrow",
                   batch_size=32,          # small: payload rows are MBs
                   concurrency=(2, 8),     # actor pool: decoder state loads once
                   num_cpus=1)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode for the containers a pure-stdlib codec can cover:
    BMP (24/32-bit uncompressed), PPM/PGM, and 8-bit non-interlaced PNG
    (all five scanline filters, zlib IDAT) — see ``stages/imagecodec.py``.
    Returns an (H, W, C) uint8 array. JPEG/WebP/etc. still need a codec
    library this container doesn't ship and raise ``ImageDecodeError``;
    every pipeline goes through the same (payload: binary) -> pixels
    contract either way."""
    from apache___solr_ray.stages.imagecodec import decode_image as _dec

    return _dec(payload)


class RealImageDecoder:
    """Actor-pool decode stage over REAL bytes (BMP/PPM/PNG): maps a batch
    of binary payloads to (width, height, channels, mean_px). Same shape
    as FakeImageDecoder — setup once per actor, small batch_size because
    payload rows are wide — but the pixels are genuinely decoded."""

    def __init__(self, payload_col: str = "payload"):
        from apache___solr_ray.stages.imagecodec import decode_image as dec

        self.col = payload_col
        self.dec = dec

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, cs, means = [], [], [], []
        for b in t.column(self.col).to_pylist():
            arr = self.dec(b)
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
            cs.append(arr.shape[2])
            means.append(float(np.floor(arr.mean() * 10000 + 0.5) / 10000))
        return (
            t.drop_columns([self.col])
            .append_column("width", pa.array(ws, pa.int32()))
            .append_column("height", pa.array(hs, pa.int32()))
            .append_column("channels", pa.array(cs, pa.int32()))
            .append_column("mean_px", pa.array(means, pa.float64()))
        )


class FakeImageDecoder:
    """Deterministic decoder stand-in: actor-pool stage.

    __init__ simulates one-time model/codec setup; __call__ maps a batch of
    binary payloads to (width, height, n_bytes, feat: list<float32>[8]).
    """

    def __init__(self, payload_col: str = "payload", feat_dim: int = 8):
        self.col = payload_col
        self.dim = feat_dim

    def _one(self, b: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.md5(b or b"").digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        feats = (np.frombuffer(h[: self.dim], dtype=np.uint8).astype(np.float32) / 255.0)
        return width, height, feats

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, nb, feats = [], [], [], []
        for b in t.column(self.col).to_pylist():
            w, h, f = self._one(b)
            ws.append(w)
            hs.append(h)
            nb.append(len(b or b""))
            feats.append(f)
        return (
            t.drop_columns([self.col])  # drop wide payload immediately after use
            .append_column("width", pa.array(ws, pa.int32()))
            .append_column("height", pa.array(hs, pa.int32()))
            .append_column("n_bytes", pa.array(nb, pa.int64()))
            .append_column("feat", pa.array([f.tolist() for f in feats], pa.list_(pa.float32())))
        )


class RealAudioFeaturizer:
    """Actor-pool audio-feature stage over REAL bytes (PCM WAV via the
    stdlib ``wave`` module — ``stages/audiocodec.py``): duration, channel
    count, sample rate, RMS, peak from decoded samples."""

    def __init__(self, payload_col: str = "payload"):
        from apache___solr_ray.stages.audiocodec import wav_features

        self.col = payload_col
        self.feat = wav_features

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = [self.feat(b) for b in t.column(self.col).to_pylist()]
        out = t.drop_columns([self.col])
        for name, typ in (
            ("n_frames", pa.int64()),
            ("channels", pa.int32()),
            ("rate", pa.int32()),
            ("duration_sec", pa.float64()),
            ("rms", pa.float64()),
            ("peak", pa.int64()),
        ):
            out = out.append_column(name, pa.array([r[name] for r in rows], typ))
        return out


class FakeAudioFeaturizer:
    """Deterministic audio featurizer stand-in (same contract pattern)."""

    def __init__(self, payload_col: str = "payload", frames: int = 4):
        self.col = payload_col
        self.frames = frames

    def __call__(self, t: pa.Table) -> pa.Table:
        durs, feats = [], []
        for b in t.column(self.col).to_pylist():
            h = hashlib.md5(b or b"").digest()
            durs.append(0.1 * (1 + h[2] % 600))
            feats.append([float(x) / 255.0 for x in h[: self.frames]])
        return (
            t.drop_columns([self.col])
            .append_column("duration_sec", pa.array(np.round(durs, 1)))
            .append_column("frames", pa.array(feats, pa.list_(pa.float64())))
        )


class ImageResizePlanner:
    """Aspect-preserving resize planning (actor-pool stage).

    The GEOMETRY is real (integer-exact round-half-up into a target box);
    only the pixel resample itself would need a codec. Input: (width,
    height) columns from the decode stage; output adds (rwidth, rheight).
    """

    def __init__(self, box: int = 224):
        self.box = box

    def __call__(self, t: pa.Table) -> pa.Table:
        w = t.column("width").to_numpy().astype(np.int64)
        h = t.column("height").to_numpy().astype(np.int64)
        m = np.maximum(w, h)
        rw = (w * 2 * self.box + m) // (2 * m)
        rh = (h * 2 * self.box + m) // (2 * m)
        return t.append_column("rwidth", pa.array(rw.astype(np.int32))).append_column(
            "rheight", pa.array(rh.astype(np.int32))
        )


class RealVideoFrameSampler:
    """Actor-pool frame-sampling stage over REAL bytes (uncompressed AVI
    via ``stages/videocodec.py``): decodes the RIFF container, samples
    every ``stride``-th frame and emits ONE ROW PER SAMPLED FRAME with the
    frame's true mean pixel value — the explode/flat-map shape of a real
    video pipeline, with genuinely decoded pixels."""

    def __init__(self, payload_col: str = "payload", id_col: str = "vid_id", stride: int = 5):
        from apache___solr_ray.stages.videocodec import avi_frame_stats

        self.col = payload_col
        self.id_col = id_col
        self.stride = stride
        self.stats = avi_frame_stats

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_numpy()
        out_id: list[int] = []
        idx_parts, ts_parts, mean_parts = [], [], []
        for i, b in enumerate(t.column(self.col).to_pylist()):
            st = self.stats(b, stride=self.stride)
            out_id.extend([int(ids[i])] * len(st["frame_idx"]))
            idx_parts.append(st["frame_idx"])
            ts_parts.append(st["ts_ms"])
            mean_parts.append(st["mean_px"])
        cat = np.concatenate
        return pa.table(
            {
                self.id_col: pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(cat(idx_parts) if idx_parts else np.array([], np.int64)),
                "ts_ms": pa.array(cat(ts_parts) if ts_parts else np.array([], np.int64)),
                "mean_px": pa.array(cat(mean_parts) if mean_parts else np.array([], np.float64)),
            }
        )


class FakeVideoFrameSampler:
    """Frame-sampling stage stand-in: one output ROW per sampled frame
    (the explode/flat-map shape of a real video pipeline). Frame count is
    derived deterministically from the payload; timestamps assume 25 fps.
    """

    def __init__(self, payload_col: str = "payload", stride: int = 5):
        self.col = payload_col
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        out_id, out_idx = [], []
        for i, b in enumerate(t.column(self.col).to_pylist()):
            hgs = hashlib.md5(b or b"").digest()
            n_frames = 8 + hgs[2] % 120
            idxs = list(range(0, n_frames, self.stride))
            out_id.extend([int(ids[i])] * len(idxs))
            out_idx.extend(idxs)
        idx = np.array(out_idx, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(idx),
                "ts_ms": pa.array(idx * 40),  # 25 fps
            }
        )
