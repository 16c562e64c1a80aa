"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract stages are actor-pool ``map_batches`` classes.  The actual
codecs (PIL/ffmpeg/torchaudio) are NOT available in this environment, so the
decode kernel is stubbed: if a real library import succeeds it is used,
otherwise a clearly-marked deterministic fake produces stable pseudo-features
from the payload bytes.  Everything Ray-side — schema, batch sizing, actor
lifecycle, zero-copy binary handling, output layout — is real and tested
(``tests/test_multimodal.py``).

Design notes for 100 TB media tables: binary payloads dominate block size,
so these stages run with small ``batch_size`` (payload-count based) and rely
on ``DataContext.target_max_block_size`` to keep blocks splittable; features
come out as fixed-width ``list<float32>`` columns that downstream similarity
stages consume without re-decoding.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("meta", pa.string()),            # JSON sidecar (dims, codec, duration)
])

FEATURE_DIM = 32


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (stub): stable pseudo-feature vector from
    payload bytes.  Replaced by a real codec when available.  Features are
    counter-prefixed md5 chains (``md5(b"<i>:" + payload)``) — md5, and a
    plain-text counter prefix, precisely so the driver oracle can rebuild
    the values in DuckDB (``md5(i::VARCHAR || ':' || text)`` plus a
    little-endian hex swizzle); uniformity is all a stand-in needs."""
    need = dim * 4
    chunks = []
    for i in range((need + 15) // 16):
        chunks.append(hashlib.md5(f"{i}:".encode() + payload).digest())
    v = np.frombuffer(b"".join(chunks)[:need], dtype="<u4").astype(np.float32)
    return v / np.float32(2 ** 32)


class DecodeMedia:
    """(media_id, payload, ...) -> + (n_bytes, feature: list<float32>).

    Actor pool stage: the codec handle is resolved ONCE per actor in
    ``__init__`` (real-library probe), batches only run the kernel.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM,
                 require_real: bool = False, device: str | None = None):
        # device pass-through (reference picks cuda per task and halves
        # precision to fit, api/working.py:40-50); the fake codec records
        # the choice so GPU placement is testable without hardware.  Pair
        # with map_batches(..., num_gpus=1) to reserve the slot.
        from .embed import EmbedDocs
        self.device = EmbedDocs._resolve_device(device)
        self.feature_dim = feature_dim
        self.codec = None
        try:  # real decoder if the environment has one
            import PIL.Image  # noqa: F401
            self.codec = "pil"
        except ImportError:
            self.codec = "fake"
        if require_real and self.codec == "fake":
            raise NotImplementedError(
                "no real media codec available in this environment; "
                "DecodeMedia runs with the deterministic fake decoder")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        nb = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                         count=len(payloads))
        feats = np.stack([_fake_decode(p, self.feature_dim) for p in payloads]) \
            if payloads else np.zeros((0, self.feature_dim), np.float32)
        offs = pa.array(np.arange(0, (len(payloads) + 1) * self.feature_dim,
                                  self.feature_dim, dtype=np.int32))
        feat_col = pa.ListArray.from_arrays(offs, pa.array(feats.reshape(-1),
                                                           pa.float32()))
        return batch.append_column("n_bytes", pa.array(nb, pa.int64())) \
                    .append_column("feature", feat_col)


class FrameSampler:
    """Video-style payloads -> one row per sampled frame (flat_map shape).

    Stub kernel: deterministic frame count from payload length; real frame
    extraction would replace ``_fake_decode`` per frame offset.
    """

    def __init__(self, every_n_bytes: int = 4096, max_frames: int = 8):
        self.every = every_n_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, feats = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            n = min(self.max_frames, max(1, len(payload) // self.every))
            for fi in range(n):
                lo = fi * self.every
                chunk = payload[lo:lo + self.every]
                ids.append(mid)
                frames.append(fi)
                feats.append(_fake_decode(chunk))
        offs = pa.array(np.arange(0, (len(ids) + 1) * FEATURE_DIM, FEATURE_DIM,
                                  dtype=np.int32))
        flat = np.concatenate(feats) if feats else np.zeros(0, np.float32)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame": pa.array(frames, pa.int32()),
            "feature": pa.ListArray.from_arrays(offs, pa.array(flat, pa.float32())),
        })


class ResizeMedia:
    """Binary -> binary transcode stage (image resize / audio resample by
    ``media_type``), meta JSON updated with the target params.

    Stub kernel (same contract as :class:`DecodeMedia`): a real PIL
    ``Image.resize`` / torchaudio ``Resample`` drops in per actor; the fake
    produces a deterministic payload of the RIGHT characteristic size
    (images scale by area ratio, audio by rate ratio) so downstream
    batch-size/memory behavior matches a real transcode.  Actor pool:
    target params + codec probe resolve once in ``__init__``.
    """

    def __init__(self, target_px: int = 224, target_rate: int = 16_000,
                 require_real: bool = False):
        self.target_px = target_px
        self.target_rate = target_rate
        # the resize KERNEL is always the deterministic fake in this repo
        # (a real PIL/torchaudio kernel replaces _fake_resize wholesale);
        # the codec field must say so even when PIL merely IMPORTS, or the
        # provenance stamped into meta below lies about the payload bytes
        self.codec = "fake"
        if require_real:
            raise NotImplementedError(
                "no real media transcode kernel is wired in this "
                "environment; ResizeMedia runs the deterministic fake")

    def _fake_resize(self, payload: bytes, media_type: str) -> bytes:
        # deterministic stand-in: sample the payload down to the size a
        # real transcode would produce (224x224 image ~ fixed size; audio
        # scales by rate ratio), keeping bytes payload-dependent
        if media_type == "image":
            out_len = max(16, self.target_px * self.target_px // 1024)
        else:  # audio/video: assume 48k source -> rate ratio
            out_len = max(16, int(len(payload) * self.target_rate / 48_000))
        idx = np.linspace(0, max(0, len(payload) - 1), out_len).astype(np.int64)
        arr = np.frombuffer(payload, dtype=np.uint8)
        return (arr[idx].tobytes() if arr.size else b"\0" * out_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        metas = batch["meta"].to_pylist()
        out_p, out_m = [], []
        for p, mt, mj in zip(payloads, mtypes, metas):
            out_p.append(self._fake_resize(p, mt))
            try:
                meta = json.loads(mj) if mj else {}
            except ValueError:
                meta = {}
            if not isinstance(meta, dict):  # valid JSON but not an object
                meta = {}
            meta["resized"] = {"target_px": self.target_px,
                               "target_rate": self.target_rate,
                               "codec": self.codec}
            out_m.append(json.dumps(meta, sort_keys=True))
        return pa.table({
            "media_id": batch["media_id"],
            "payload": pa.array(out_p, pa.binary()),
            "media_type": batch["media_type"],
            "meta": pa.array(out_m, pa.string()),
        })
