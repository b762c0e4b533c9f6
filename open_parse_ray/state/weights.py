"""Model-weight staging: local materialization + cluster broadcast.

The reference ships a weights CLI (reference: src/openparse/cli.py:7-48)
that downloads unitable checkpoints into a package-local weights dir,
skipping files already present; model modules then load that dir at
import time (tables/table_transformers/ml.py:58-66). This environment
has no network, so staging MATERIALIZES the deterministic model assets
this engine actually runs — the OCR bitmap typeface, the MinHash
permutation parameters, the cosine-LSH hyperplanes — as real ``.npz``
files under a weights dir with the same skip-if-present contract.

It also adds the cluster half the reference lacks:
:func:`stage_to_object_store` puts each staged weight into the Ray
object store ONCE (``ray.put``) so actor pools fetch a shared ref in
``__init__`` instead of every actor re-reading files — the broadcast
pattern used throughout this repo. At 10^12 docs a weights file read
per actor × thousands of actors is real S3/file-system load; one put +
zero-copy shared-memory reads per node is the correct shape.
"""

from __future__ import annotations

import io
import os
from typing import Callable, Dict, List

import numpy as np


def _build_typeface() -> Dict[str, np.ndarray]:
    """OCR typeface → arrays (chars as codepoints + stacked glyph bitmaps)."""
    from open_parse_ray.stages.ocr_vision import FONT

    chars = sorted(FONT)
    return {
        "chars": np.array([ord(c) for c in chars], dtype=np.int32),
        "glyphs": np.stack([FONT[c] for c in chars]).astype(np.uint8),
    }


def _build_minhash(num_perm: int = 128, seed: int = 42) -> Dict[str, np.ndarray]:
    from open_parse_ray.stages.dedup import FastMinHasher

    h = FastMinHasher(num_perm, seed)
    return {"a": h.a, "b": h.b, "p": np.array([h.p], dtype=np.uint64)}


def _build_lsh(dim: int = 64, n_bits: int = 12, seed: int = 42) -> Dict[str, np.ndarray]:
    from open_parse_ray.stages.similarity import HyperplaneLSH

    return {"planes": HyperplaneLSH(dim=dim, n_bits=n_bits, seed=seed).planes}


WEIGHT_BUILDERS: Dict[str, Callable[[], Dict[str, np.ndarray]]] = {
    "ocr_typeface.npz": _build_typeface,
    "minhash_params.npz": _build_minhash,
    "lsh_hyperplanes.npz": _build_lsh,
}


def stage_weights(dest_dir: str, verbose: bool = True) -> List[str]:
    """Materialize every weight file under ``dest_dir``, skipping files
    already present (the reference CLI's caching contract,
    cli.py:13-21). Returns the staged paths."""
    os.makedirs(dest_dir, exist_ok=True)
    paths = []
    for name, build in WEIGHT_BUILDERS.items():
        path = os.path.join(dest_dir, name)
        if not os.path.exists(path):
            if verbose:
                print(f"Staging weights to {path}...")
            arrays = build()
            buf = io.BytesIO()
            np.savez(buf, **arrays)
            with open(path, "wb") as f:  # atomic enough: single writer CLI
                f.write(buf.getvalue())
            if verbose:
                print("Staging complete.")
        elif verbose:
            print(f"Weights already present at {path}.")
        paths.append(path)
    return paths


def load_typeface(path: str) -> Dict[str, np.ndarray]:
    """ocr_typeface.npz → {char: (7, 5) bool glyph} — must reproduce
    ocr_vision.FONT exactly (gated in tests)."""
    z = np.load(path)
    return {
        chr(cp): g.astype(bool)
        for cp, g in zip(z["chars"], z["glyphs"])
    }


def templates_from_file(path: str) -> Dict[bytes, str]:
    """ocr_typeface.npz → the template-match lookup the OCR engine uses."""
    return {g.tobytes(): ch for ch, g in load_typeface(path).items()}


def minhasher_from_file(path: str):
    """minhash_params.npz → a FastMinHasher with the staged parameters
    (bit-identical signatures to the seed-derived construction)."""
    from open_parse_ray.stages.dedup import FastMinHasher

    z = np.load(path)
    h = FastMinHasher.__new__(FastMinHasher)
    h.num_perm = len(z["a"])
    h.a, h.b, h.p = z["a"], z["b"], np.uint64(z["p"][0])
    return h


def lsh_from_file(path: str):
    """lsh_hyperplanes.npz → a HyperplaneLSH with the staged planes."""
    from open_parse_ray.stages.similarity import HyperplaneLSH

    z = np.load(path)
    planes = z["planes"]
    lsh = HyperplaneLSH.__new__(HyperplaneLSH)
    lsh.planes = planes
    lsh.n_bits = planes.shape[1]
    return lsh


def stage_to_object_store(dest_dir: str) -> Dict[str, "object"]:
    """Stage locally if needed, then put each weight file's ARRAYS into
    the Ray object store once. Returns {name: ObjectRef}; actor stages
    take a ref in their constructor args and ``ray.get`` it in
    ``__init__`` (zero-copy from shared memory on every node)."""
    import ray

    refs = {}
    for path in stage_weights(dest_dir, verbose=False):
        z = np.load(path)
        refs[os.path.basename(path)] = ray.put({k: z[k] for k in z.files})
    return refs
