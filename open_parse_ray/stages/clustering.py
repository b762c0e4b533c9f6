"""Distributed k-means over the embeddings table (spherical / cosine
variant) — the corpus-curation clustering step (domain discovery,
curriculum buckets, IVF coarse-quantizer training).

Scale shape (classic Lloyd's as Ray Data passes; nothing ever gathers
the vectors):

- each iteration is ONE streaming task-pool map over the table: the
  centroids are broadcast with ``ray.put`` once per iteration and read
  zero-copy from plasma inside each task (task pool, not actors — six
  sequential rounds per fit would pay actor spin-up each round; see
  SCALE.md §10); each batch assigns by cosine and emits ≤k partial
  rows (cluster, count, quantized sum vector),
- the driver reduces batches×k tiny partials and updates centroids;
  empty clusters keep their previous centroid,
- a final pass emits (vec_id, cluster).

Bit-reproducibility at ANY block structure (the repo's determinism
invariant): float partial sums would make centroid updates depend on
batch boundaries (accumulation order), so vectors are quantized to
fixed-point int64 (2^-20 resolution) and partial sums are EXACT integer
arithmetic — order-independent by construction. Assignment dots are
computed with a fixed-length last-axis reduction (numpy's pairwise tree
over the 64-dim axis only), so they are bitwise identical regardless of
batch size. At 10^12 rows per-cluster int64 sums approach overflow
(2^20 scale × |x| × count); production would accumulate driver-side in
Python ints (arbitrary precision) — the partial shape is unchanged.

No reference counterpart (scale-layer addition); gated by a pytest
equivalence test against a single-process numpy reference and a
block-structure invariance test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from open_parse_ray.sources.tables import table_path

_SCALE = 1 << 20


def _quantize(emb: np.ndarray) -> np.ndarray:
    return np.round(emb * _SCALE).astype(np.int64)


def _assign(q_emb: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest centroid by cosine for fixed-point vectors. ``centroids``
    is float64 (k, d) and must be bitwise-identical across callers; the
    last-axis reduction makes the dots independent of batch size."""
    x = q_emb.astype(np.float64) / _SCALE
    c_norm = np.sqrt((centroids * centroids).sum(axis=1))
    c_norm[c_norm == 0] = 1.0
    # (B, k): fixed-length axis-2 reduction — deterministic per row
    dots = (x[:, None, :] * centroids[None, :, :]).sum(axis=2)
    return np.argmax(dots / c_norm[None, :], axis=1).astype(np.int64)


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])


def _init_centroids(sf_dir: str, k: int, dim: int) -> np.ndarray:
    """Deterministic init: the embeddings of the k smallest vec_ids,
    fetched with a pushed-down row filter (never a full scan)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        table_path(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=pads.field("vec_id") < k,
    )
    df = tbl.to_pandas().sort_values("vec_id")
    cents = np.array([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    if cents.shape != (k, dim):
        raise ValueError(f"init centroids shape {cents.shape} != ({k}, {dim})")
    return _quantize(cents).astype(np.float64) / _SCALE


def _partial_sums(b: pd.DataFrame, cent_ref) -> pd.DataFrame:
    """Task-pool stage: assigns a batch and emits ≤k (cluster, n,
    sums-bytes). Runs as a plain function, not an actor — six
    sequential rounds per fit would pay actor spin-up each time, while
    a task reuses warm workers and ``ray.get`` of the broadcast
    centroids is a zero-copy plasma read after the first fetch on each
    worker (measured ~5x on the whole fit at bench scale)."""
    import ray

    centroids = ray.get(cent_ref)
    q = _quantize(np.array([np.asarray(e, dtype=np.float64) for e in b["embedding"]]))
    a = _assign(q, centroids)
    rows = []
    for c in np.unique(a):
        sel = q[a == c]
        rows.append(
            {
                "cluster": int(c),
                "n": np.int64(sel.shape[0]),
                "sums": sel.sum(axis=0, dtype=np.int64).tobytes(),
            }
        )
    return pd.DataFrame(rows)


def _final_assign(b: pd.DataFrame, cent_ref) -> pd.DataFrame:
    import ray

    centroids = ray.get(cent_ref)
    q = _quantize(np.array([np.asarray(e, dtype=np.float64) for e in b["embedding"]]))
    return pd.DataFrame(
        {
            "vec_id": b["vec_id"].astype("int64"),
            "cluster": _assign(q, centroids),
        }
    )


def kmeans_fit(sf_dir: str, k: int = 8, iters: int = 5, dim: int = 64, batch_size: int = 4096) -> np.ndarray:
    """Run ``iters`` Lloyd iterations; returns the (k, dim) float64
    centroid matrix (a pure function of the quantized inputs).

    The input is materialized ONCE so the ``iters`` passes re-scan
    cached object-store blocks instead of re-executing the parquet read
    per iteration (recompute-vs-cache: embedding tables are the small
    derived table of the corpus — 10^12 docs × 256 B ≈ 0.25 PB worst
    case, at which point Ray spills blocks to disk and this is still
    cheaper than ``iters`` storage re-reads; centroids stay
    bit-identical either way because the int64 partial sums are
    order-independent)."""
    import ray

    ds = _read_embeddings(sf_dir).materialize()
    centroids = _init_centroids(sf_dir, k, dim)

    def combine_level(b: pd.DataFrame) -> pd.DataFrame:
        # tree-reduce level over partial rows: exact int64 sums are
        # order-independent, so folding ~512 partials into ≤k keeps the
        # driver stream bounded at any corpus size (chain for more)
        rows = []
        for c, grp in b.groupby("cluster"):
            s = np.zeros(dim, dtype=np.int64)
            for raw in grp["sums"]:
                s += np.frombuffer(raw, dtype=np.int64)
            rows.append(
                {"cluster": int(c), "n": np.int64(grp["n"].sum()), "sums": s.tobytes()}
            )
        return pd.DataFrame(rows)

    for _ in range(iters):
        cent_ref = ray.put(centroids)
        partials = (
            ds.map_batches(
                _partial_sums,
                fn_kwargs={"cent_ref": cent_ref},
                batch_format="pandas",
                batch_size=batch_size,
            )
            .map_batches(combine_level, batch_format="pandas", batch_size=512)
            .to_pandas()
        )
        new = centroids.copy()
        for c, grp in partials.groupby("cluster"):
            n = int(grp["n"].sum())
            if n == 0:
                continue
            s = np.zeros(dim, dtype=np.int64)
            for raw in grp["sums"]:
                s += np.frombuffer(raw, dtype=np.int64)
            new[int(c)] = s.astype(np.float64) / (_SCALE * n)
        centroids = new
    return centroids


def kmeans_clusters(sf_dir: str, k: int = 8, iters: int = 5, dim: int = 64, batch_size: int = 4096):
    """(vec_id, cluster) assignments after ``iters`` Lloyd rounds."""
    import ray

    centroids = kmeans_fit(sf_dir, k=k, iters=iters, dim=dim, batch_size=batch_size)
    cent_ref = ray.put(centroids)
    return _read_embeddings(sf_dir).map_batches(
        _final_assign,
        fn_kwargs={"cent_ref": cent_ref},
        batch_format="pandas",
        batch_size=4096,
    )


def pca_fit(sf_dir: str, n_components: int = 8, dim: int = 64, batch_size: int = 4096):
    """Distributed PCA fit over the embedding table — returns
    (components (n_components, dim) float64, explained_var
    (n_components,) float64, mean (dim,) float64), a pure function of
    the quantized inputs.

    Bit-determinism (the kmeans_fit argument, extended to second
    moments): per-batch partials are EXACT int64 (n, sum q, sum q q^T)
    over _SCALE-quantized embeddings; the driver folds partials with
    arbitrary-precision Python ints (the q q^T entries are bounded by
    2^40 per row, so batch partials fit int64, but a 10^12-row total
    does not — the object-dtype fold is the overflow guarantee, not a
    convenience). Mean and covariance are then two float64 expressions
    of exact integers, and numpy's eigh on the (dim, dim) covariance is
    deterministic on a fixed BLAS — so components are bit-identical at
    any batch size or block structure. Sign convention: each component
    is flipped so its largest-|coordinate| entry is positive
    (eigenvector sign is otherwise arbitrary).

    Scale shape: ONE streaming pass; each batch ships a single
    (8 + 8*dim + 8*dim^2)-byte partial row (dim=64: ~33 KB), bounded by
    batch count, not rows. The (dim, dim) eigendecomposition is
    driver-side and dimension-bounded."""
    ds = _read_embeddings(sf_dir)

    def moment_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype=object),
                                 "m": pd.Series(dtype=object)})
        q = _quantize(
            np.array([np.asarray(e, dtype=np.float64) for e in b["embedding"]])
        )
        return pd.DataFrame(
            {
                "n": [np.int64(q.shape[0])],
                "s": [q.sum(axis=0, dtype=np.int64).tobytes()],
                "m": [(q.T @ q).astype(np.int64).tobytes()],
            }
        )

    parts = ds.map_batches(
        moment_partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()

    n_total = int(parts["n"].sum())
    if n_total == 0:
        raise ValueError("empty embedding table")
    s_tot = np.zeros(dim, dtype=object)
    m_tot = np.zeros((dim, dim), dtype=object)
    for s_raw, m_raw in zip(parts["s"], parts["m"]):
        s_tot = s_tot + np.frombuffer(s_raw, dtype=np.int64).astype(object)
        m_tot = m_tot + np.frombuffer(m_raw, dtype=np.int64).reshape(dim, dim).astype(object)

    mean = s_tot.astype(np.float64) / (_SCALE * n_total)
    # E[xx^T] - mean mean^T, both from exact integer moments
    exx = m_tot.astype(np.float64) / (float(_SCALE) ** 2 * n_total)
    cov = exx - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    idx = np.argsort(w)[::-1][:n_components]
    comps = v[:, idx].T.copy()
    var = w[idx].copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, var, mean


def embedding_pca_coords(
    sf_dir: str, n_components: int = 8, dim: int = 64, batch_size: int = 4096
):
    """(vec_id, c0..c{n-1}) — every embedding projected onto the
    distributed-PCA components (centered, same quantized input as the
    fit, so coordinates are a deterministic function of the table)."""
    import ray

    comps, _var, mean = pca_fit(
        sf_dir, n_components=n_components, dim=dim, batch_size=batch_size
    )
    ref = ray.put((comps, mean))

    def project(b: pd.DataFrame) -> pd.DataFrame:
        cm, mu = ray.get(ref)
        q = _quantize(
            np.array([np.asarray(e, dtype=np.float64) for e in b["embedding"]])
        )
        x = q.astype(np.float64) / _SCALE - mu
        proj = x @ cm.T
        out = {"vec_id": b["vec_id"].astype("int64").to_numpy()}
        for i in range(cm.shape[0]):
            out[f"c{i}"] = proj[:, i]
        return pd.DataFrame(out)

    return _read_embeddings(sf_dir).map_batches(
        project, batch_format="pandas", batch_size=batch_size
    )
