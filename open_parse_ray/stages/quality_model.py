"""Distributed quality-classifier TRAINING — the CCNet/GPT-3 pattern
(train a cheap linear model to imitate/extend a rule-based quality
gate, then score the whole corpus with it).

Model: L2-regularized logistic regression fit by IRLS (Newton) over
per-document shape features, labels from the corpus' own Gopher gate
(stages/analysis.gopher_quality_batch — the exact rule the classifier
is distilled from). Each iteration is ONE streaming pass that ships a
single ~230-byte partial row per batch: exact int64 fixed-point sums
of the per-row gradient (5) and Hessian (5×5) contributions, quantized
per row at 2^24 with round-half-even. Like kmeans_fit/pca_fit, the
integer partials make the fit bit-identical at any batch size or block
structure; the driver folds partials with OBJECT-dtype Python ints (a
10^12-row total overflows int64 — the object fold is the overflow
guarantee), then takes one dimension-bounded Newton step in float64
from exact integers.

Gates (tests/test_clustering.py): distributed fit == sequential
local reference bit-for-bit; batch-size invariance; accuracy ≥ 0.9 on
the Gopher labels and strictly above the majority-class baseline;
per-row integer logit scores are block-structure exact (the dot
product is an explicit fixed-order elementwise sum, never a
batch-shaped BLAS call).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import pandas as pd

_QM_SCALE = float(1 << 24)
_QM_DIM = 5
_LOGIT_SCALE = float(1 << 20)
_LOG51 = math.log(51.0)


def _feature_frame(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, f0..f4, y) from raw text via the Gopher statistics.
    Features are centered at the gate's own rule boundaries (log word
    count crossing 0 at the 50-word minimum, mean word length at the
    band center, symbol and alpha ratios at their thresholds) so the
    linear model can actually represent the gate."""
    from open_parse_ray.stages.analysis import gopher_quality_batch

    g = gopher_quality_batch(b)
    n = g["n_words"].to_numpy(dtype=np.float64)
    tc = g["total_word_chars"].to_numpy(dtype=np.float64)
    nh = g["n_hash"].to_numpy(dtype=np.float64)
    ne = g["n_ellipsis"].to_numpy(dtype=np.float64)
    na = g["n_alpha_words"].to_numpy(dtype=np.float64)
    d = np.maximum(n, 1.0)
    return pd.DataFrame(
        {
            "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
            "f0": np.ones(len(g), dtype=np.float64),
            "f1": np.log1p(n) / _LOG51 - 1.0,
            "f2": tc / d - 6.5,
            "f3": 10.0 * (nh + ne) / d,
            "f4": 5.0 * na / d - 4.0,
            "y": g["passes_gopher"].to_numpy(dtype=np.float64),
        }
    )


def _fmatrix(b: pd.DataFrame) -> Tuple[np.ndarray, np.ndarray]:
    X = np.column_stack([b[f"f{i}"].to_numpy(dtype=np.float64) for i in range(_QM_DIM)])
    return X, b["y"].to_numpy(dtype=np.float64)


def _irls_partial_arrays(X: np.ndarray, y: np.ndarray, w: np.ndarray):
    """Exact int64 (n, gq[5], hq[5,5]) for one batch: per-row float64
    contributions quantized with round-half-even at 2^24, then summed
    as int64. The PER-ROW bound is min(2^53, 2^62 / batch_rows): the
    first term keeps rint exact in float64, the second guarantees the
    int64 batch sum cannot wrap (checking the sum after the fact would
    test the already-wrapped value) — a pathological doc raises instead
    of silently overflowing."""
    z = np.zeros(len(X), dtype=np.float64)
    for j in range(_QM_DIM):  # fixed-order accumulation, batch-shape free
        z += X[:, j] * w[j]
    p = 1.0 / (1.0 + np.exp(-z))
    r = p * (1.0 - p)
    grow = (p - y)[:, None] * X * _QM_SCALE
    hrow = (r[:, None, None] * X[:, :, None] * X[:, None, :]) * _QM_SCALE
    lim = float(min(2**53, (2**62) // max(len(X), 1)))
    assert np.abs(grow).max(initial=0.0) < lim
    assert np.abs(hrow).max(initial=0.0) < lim
    gq = np.rint(grow).astype(np.int64).sum(axis=0)
    hq = np.rint(hrow).astype(np.int64).sum(axis=0)
    return np.int64(len(X)), gq, hq


def _newton_step(
    w: np.ndarray, n_total: int, g_tot: np.ndarray, h_tot: np.ndarray, lam: float
) -> np.ndarray:
    """One damped Newton step from EXACT integer moments (object-dtype
    g_tot/h_tot). float64 only here, on dimension-bounded values."""
    gvec = g_tot.astype(np.float64) / _QM_SCALE + lam * n_total * w
    hmat = h_tot.astype(np.float64).reshape(_QM_DIM, _QM_DIM) / _QM_SCALE
    hmat = hmat + lam * n_total * np.eye(_QM_DIM)
    return w - np.linalg.solve(hmat, gvec)


def _feats_dataset(sf_dir: str, batch_size: int):
    """Features computed ONCE and materialized (the feature table is
    ~1% of the text bytes; Ray spills blocks if it outgrows the store —
    still cheaper than re-tokenizing the corpus every Newton pass)."""
    return (
        _read_docs(sf_dir)
        .map_batches(_feature_frame, batch_format="pandas", batch_size=batch_size)
        .materialize()
    )


def logreg_fit(
    sf_dir: str, iters: int = 6, lam: float = 1e-3, batch_size: int = 8192
) -> np.ndarray:
    """Fit the quality classifier; returns the (5,) float64 weight
    vector, a pure function of the corpus."""
    return _fit_on_feats(
        _feats_dataset(sf_dir, batch_size), iters, lam, batch_size
    )


def _fit_on_feats(
    feats, iters: int, lam: float, batch_size: int
) -> np.ndarray:
    w = np.zeros(_QM_DIM, dtype=np.float64)
    for _ in range(iters):
        import ray

        w_ref = ray.put(w.copy())

        def partial(b: pd.DataFrame, *, _w=w_ref) -> pd.DataFrame:
            import ray as _ray

            X, y = _fmatrix(b)
            n, gq, hq = _irls_partial_arrays(X, y, _ray.get(_w))
            return pd.DataFrame(
                {"n": [n], "g": [gq.tobytes()], "h": [hq.tobytes()]}
            )

        parts = feats.map_batches(
            partial, batch_format="pandas", batch_size=batch_size
        ).to_pandas()
        n_total = int(parts["n"].sum())
        if n_total == 0:
            raise ValueError("empty documents table")
        g_tot = np.zeros(_QM_DIM, dtype=object)
        h_tot = np.zeros(_QM_DIM * _QM_DIM, dtype=object)
        for g_raw, h_raw in zip(parts["g"], parts["h"]):
            g_tot = g_tot + np.frombuffer(g_raw, dtype=np.int64).astype(object)
            h_tot = h_tot + np.frombuffer(h_raw, dtype=np.int64).astype(object)
        w = _newton_step(w, n_total, g_tot, h_tot, lam)
    return w


def logreg_fit_local(
    docs: pd.DataFrame,
    iters: int = 6,
    lam: float = 1e-3,
    batch_size: int = 8192,
) -> np.ndarray:
    """Sequential reference implementing the identical spec (same
    per-row quantization, same Python-int totals, same Newton step) —
    the bit-equality oracle for the distributed fit."""
    f = _feature_frame(docs)
    w = np.zeros(_QM_DIM, dtype=np.float64)
    for _ in range(iters):
        n_total = 0
        g_tot = np.zeros(_QM_DIM, dtype=object)
        h_tot = np.zeros(_QM_DIM * _QM_DIM, dtype=object)
        for lo in range(0, len(f), batch_size):
            X, y = _fmatrix(f.iloc[lo : lo + batch_size])
            n, gq, hq = _irls_partial_arrays(X, y, w)
            n_total += int(n)
            g_tot = g_tot + gq.astype(object)
            h_tot = h_tot + hq.reshape(-1).astype(object)
        w = _newton_step(w, n_total, g_tot, h_tot, lam)
    return w


def _read_docs(sf_dir: str):
    from open_parse_ray.stages.analysis import read_documents

    return read_documents(sf_dir, columns=["doc_id", "text"])


def quality_logreg_scores(
    sf_dir: str, iters: int = 6, lam: float = 1e-3, batch_size: int = 8192
):
    """Score the whole corpus with the freshly fitted classifier:
    (doc_id, logit_fp, pred, label) where logit_fp is the fixed-point
    integer logit (round-half-even at 2^20) — integer output plus a
    fixed-order dot product make the scores exact under any block
    structure. pred = logit > 0; label is the Gopher gate (so the
    driver's rows check doubles as a live confusion-matrix source).
    Scoring reuses the feature table the fit just materialized — no
    second tokenize pass over the corpus."""
    import ray

    feats = _feats_dataset(sf_dir, batch_size)
    w = _fit_on_feats(feats, iters, lam, batch_size)
    w_ref = ray.put(w)

    def score(f: pd.DataFrame) -> pd.DataFrame:
        ww = ray.get(w_ref)
        z = np.zeros(len(f), dtype=np.float64)
        for j in range(_QM_DIM):
            z += f[f"f{j}"].to_numpy(dtype=np.float64) * ww[j]
        logit_fp = np.rint(z * _LOGIT_SCALE).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": f["doc_id"].to_numpy(dtype=np.int64),
                "logit_fp": logit_fp,
                "pred": (logit_fp > 0).astype(np.int64),
                "label": f["y"].to_numpy(dtype=np.int64),
            }
        )

    return feats.map_batches(
        score, batch_format="pandas", batch_size=batch_size
    )
