"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio libraries, so the *decode kernels* are
deterministic stubs behind an import-try (PIL is used when present), while
the Ray-side plumbing — binary Arrow columns, actor-pool map_batches
stages with per-actor init, small batch sizes for wide rows, schema of the
outputs — is real and tested. The synthetic payload format is:

    magic(4B: b"OPRI" image / b"OPRA" audio) | width u16 | height u16 |
    n_frames u16 | payload bytes

mirroring how a real pipeline would treat JPEG/WAV headers.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MAGIC_IMAGE = b"OPRI"
MAGIC_AUDIO = b"OPRA"


def make_payload(i: int, kind: str = "image") -> bytes:
    """Deterministic fake media blob for doc index ``i``."""
    rng = np.random.RandomState(i * 2654435761 % (2**31))
    w, h, frames = 8 + (i % 32), 8 + (i * 3 % 32), 1 + (i % 5)
    body = rng.bytes(w * h)
    magic = MAGIC_IMAGE if kind == "image" else MAGIC_AUDIO
    return magic + struct.pack("<HHH", w, h, frames) + body


def media_table(sf_dir_or_n, kind: str = "image"):
    """Synthetic media dataset: (media_id, kind, payload binary)."""
    import ray.data as rd

    if isinstance(sf_dir_or_n, int):
        n = sf_dir_or_n
    else:
        from open_parse_ray.sources.pages import sf_from_dir

        n = max(50, int(round(20_000 * sf_from_dir(sf_dir_or_n))))

    def gen(batch) -> pa.Table:
        ids = [int(v) for v in batch["id"]]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array([kind] * len(ids), pa.string()),
                pa.array([make_payload(i, kind) for i in ids], pa.binary()),
            ],
            names=["media_id", "kind", "payload"],
        )

    return rd.range(n).map_batches(gen, batch_format="numpy", batch_size=512)


class DecodeMedia:
    """Actor-pool decode stage. Real decoding (PIL) when available, else a
    deterministic header parse — the actor signature, per-actor init, and
    output schema are identical either way. NOTE: real image decode is
    STUBBED in this container (no PIL); swap ``_decode`` when present."""

    def __init__(self):
        self.has_pil = _HAS_PIL
        self.header = struct.Struct("<HHH")

    def _decode(self, payload: bytes):
        magic, rest = payload[:4], payload[4:]
        if magic not in (MAGIC_IMAGE, MAGIC_AUDIO):
            raise ValueError("unknown magic")
        w, h, frames = self.header.unpack(rest[: self.header.size])
        body = rest[self.header.size :]
        return w, h, frames, body

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, frames_, nbytes, checksums, statuses = (
            [], [], [], [], [], [], [],
        )
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            ids.append(media_id)
            try:
                w, h, f, body = self._decode(payload)
                widths.append(w)
                heights.append(h)
                frames_.append(f)
                nbytes.append(len(body))
                checksums.append(hashlib.md5(body).hexdigest()[:12])
                statuses.append("ok")
            except Exception as exc:
                widths.append(0)
                heights.append(0)
                frames_.append(0)
                nbytes.append(0)
                checksums.append("")
                statuses.append(f"error:{type(exc).__name__}")
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(frames_, pa.int32()),
                pa.array(nbytes, pa.int64()),
                pa.array(checksums, pa.string()),
                pa.array(statuses, pa.string()),
            ],
            names=["media_id", "width", "height", "n_frames", "n_bytes", "checksum", "status"],
        )


class ResizeStub:
    """Feature-extract/resize stage shape: consumes decoded meta + payload,
    emits fixed-size 'thumbnail' bytes. Deterministic stand-in for a
    vectorized resize kernel."""

    def __init__(self, out_size: int = 64):
        self.out_size = out_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = []
        for payload in batch["payload"].to_pylist():
            digest = hashlib.sha256(payload).digest()
            reps = (self.out_size + len(digest) - 1) // len(digest)
            thumbs.append((digest * reps)[: self.out_size])
        return batch.append_column("thumb", pa.array(thumbs, pa.binary()))


def frame_sample(batch: pa.Table, stride: int = 2) -> pa.Table:
    """Video-style frame sampling: explode payload into every
    ``stride``-th frame row (frames = equal slices of the body)."""
    hdr = struct.Struct("<HHH")
    out = {"media_id": [], "frame_idx": [], "frame_bytes": []}
    for media_id, payload in zip(
        batch["media_id"].to_pylist(), batch["payload"].to_pylist()
    ):
        w, h, n_frames, = hdr.unpack(payload[4 : 4 + hdr.size])
        body = payload[4 + hdr.size :]
        if n_frames <= 0 or not body:
            continue
        fsize = max(1, len(body) // n_frames)
        for fi in range(0, n_frames, stride):
            out["media_id"].append(media_id)
            out["frame_idx"].append(fi)
            out["frame_bytes"].append(len(body[fi * fsize : (fi + 1) * fsize]))
    return pa.Table.from_arrays(
        [
            pa.array(out["media_id"], pa.int64()),
            pa.array(out["frame_idx"], pa.int32()),
            pa.array(out["frame_bytes"], pa.int64()),
        ],
        names=["media_id", "frame_idx", "frame_bytes"],
    )


def decode_meta_pipeline(sf_dir: str):
    """media → actor-pool decode → meta table. Small batch size: wide
    binary rows must not blow a worker's heap."""
    ds = media_table(sf_dir)
    return ds.map_batches(
        DecodeMedia,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    )
