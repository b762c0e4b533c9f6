"""Gates for distributed spherical k-means (stages/clustering.py):
single-process numpy equivalence + block-structure invariance."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _reference_kmeans(emb: np.ndarray, vec_ids: np.ndarray, k: int, iters: int):
    """Single-process reference of the exact quantized algorithm."""
    from open_parse_ray.stages.clustering import _SCALE, _assign, _quantize

    q = _quantize(emb)
    order = np.argsort(vec_ids)
    cents = q[order[:k]].astype(np.float64) / _SCALE  # init = k smallest ids
    for _ in range(iters):
        a = _assign(q, cents)
        new = cents.copy()
        for c in range(k):
            sel = q[a == c]
            if len(sel):
                new[c] = sel.sum(axis=0, dtype=np.int64).astype(np.float64) / (
                    _SCALE * len(sel)
                )
        cents = new
    return cents, _assign(q, cents)


def _load():
    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id")
    emb = np.array([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    return emb, df["vec_id"].to_numpy(dtype=np.int64)


def test_kmeans_matches_single_process_reference(ray_session):
    from open_parse_ray.stages.clustering import kmeans_clusters, kmeans_fit

    emb, ids = _load()
    exp_cents, exp_assign = _reference_kmeans(emb, ids, k=8, iters=5)
    got_cents = kmeans_fit(SF, k=8, iters=5)
    assert np.array_equal(got_cents, exp_cents)  # bitwise, not allclose
    got = (
        kmeans_clusters(SF, k=8, iters=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["cluster"].to_numpy(), exp_assign)
    assert np.array_equal(got["vec_id"].to_numpy(), ids)


def test_kmeans_block_structure_invariance(ray_session):
    """Fixed-point partial sums make centroids bitwise identical no
    matter how Ray splits the batches."""
    from open_parse_ray.stages.clustering import kmeans_fit

    a = kmeans_fit(SF, k=4, iters=3, batch_size=64)
    b = kmeans_fit(SF, k=4, iters=3, batch_size=4096)
    assert np.array_equal(a, b)


def test_kmeans_clusters_nontrivial(ray_session):
    from open_parse_ray.stages.clustering import kmeans_clusters

    got = kmeans_clusters(SF, k=8, iters=3).to_pandas()
    assert got["cluster"].between(0, 7).all()
    assert got["cluster"].nunique() > 1  # data actually separates


def test_semdedup_pairs_match_bruteforce(ray_session):
    """SemDeDup pairs == local brute-force within-cluster cosine pairs
    (exact set equality), and the keep-list invariants hold."""
    from open_parse_ray.stages.clustering import _assign, _quantize, kmeans_fit
    from open_parse_ray.stages.similarity import semdedup_keep, semdedup_pairs

    got = (
        semdedup_pairs(SF)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
        .astype("int64")
    )
    emb, ids = _load()
    cents = kmeans_fit(SF, k=8, iters=5)
    lab = _assign(_quantize(emb), cents)
    n = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    sims = n @ n.T
    exp = sorted(
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if lab[i] == lab[j] and sims[i, j] >= 0.3
    )
    exp = pd.DataFrame(exp, columns=["id_a", "id_b"]).astype("int64")
    pd.testing.assert_frame_equal(got, exp)

    keep = semdedup_keep(SF).to_pandas()
    kept = set(keep[keep["kept"] == 1]["vec_id"])
    drop = keep[keep["kept"] == 0]
    assert len(keep) == len(ids)
    assert set(drop["rep_id"]) <= kept
    assert (drop["rep_id"] < drop["vec_id"]).all()
    # every kept vector is its own representative
    assert (keep[keep["kept"] == 1]["rep_id"] == keep[keep["kept"] == 1]["vec_id"]).all()
    # forced distributed path (labelprop + salted join) == driver path
    dist = (
        semdedup_keep(SF, max_driver_pairs=0)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        dist, keep.sort_values("vec_id").reset_index(drop=True)
    )


def test_pca_fit_matches_local_reference_bitwise(ray_session):
    """Distributed PCA == single-process numpy reference, bit-for-bit:
    the int64 moment partials are exact, so mean/cov — and therefore
    eigh — see identical float64 inputs regardless of distribution."""
    import pyarrow.parquet as pq

    from open_parse_ray.stages.clustering import _SCALE, _quantize, pca_fit

    sf = "/root/testdata/sf0.001"
    comps, var, mean = pca_fit(sf, n_components=8)

    tbl = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    q = _quantize(np.array([np.asarray(e, dtype=np.float64) for e in tbl["embedding"]]))
    n = q.shape[0]
    s = q.sum(axis=0, dtype=np.int64)
    m = (q.T @ q).astype(np.int64)
    mean_ref = s.astype(np.float64) / (_SCALE * n)
    cov_ref = m.astype(np.float64) / (float(_SCALE) ** 2 * n) - np.outer(
        mean_ref, mean_ref
    )
    w, v = np.linalg.eigh(cov_ref)
    idx = np.argsort(w)[::-1][:8]
    comps_ref = v[:, idx].T.copy()
    for i in range(8):
        j = int(np.argmax(np.abs(comps_ref[i])))
        if comps_ref[i, j] < 0:
            comps_ref[i] = -comps_ref[i]

    assert np.array_equal(mean, mean_ref)
    assert np.array_equal(var, w[idx])
    assert np.array_equal(comps, comps_ref)

    # batch-size invariance of the fit (int partials fold exactly)
    comps2, var2, mean2 = pca_fit(sf, n_components=8, batch_size=128)
    assert np.array_equal(comps, comps2)
    assert np.array_equal(var, var2)
    assert np.array_equal(mean, mean2)


def test_embedding_pca_coords_properties(ray_session):
    """Projection sanity: components orthonormal, per-component sample
    variance equals the eigenvalue (both computed over the same
    centered quantized data), coordinates' empirical mean ~ 0."""
    from open_parse_ray.stages.clustering import embedding_pca_coords, pca_fit

    sf = "/root/testdata/sf0.001"
    comps, var, _mean = pca_fit(sf, n_components=4)
    g = np.abs(comps @ comps.T - np.eye(4))
    assert g.max() < 1e-10

    out = embedding_pca_coords(sf, n_components=4).to_pandas()
    assert len(out) == 500
    X = out[[f"c{i}" for i in range(4)]].to_numpy()
    assert np.abs(X.mean(axis=0)).max() < 1e-9
    # biased (1/n) sample variance is exactly the eigenvalue of the cov
    v_emp = (X**2).mean(axis=0)
    assert np.abs(v_emp - var).max() < 1e-12 * max(1.0, np.abs(var).max())
    # explained variance is sorted descending
    assert np.all(np.diff(var) <= 1e-15)


def test_logreg_fit_matches_local_and_batch_invariant(ray_session):
    """Distributed IRLS fit == sequential local reference bit-for-bit
    (same per-row 2^24 quantization, Python-int totals, Newton step),
    and bit-identical across batch sizes (int64 partial sums are
    associative; the quantization is per ROW, never per batch)."""
    import pandas as pd

    from open_parse_ray.stages.quality_model import (
        logreg_fit,
        logreg_fit_local,
    )

    sf = "/root/testdata/sf0.001"
    w_d = logreg_fit(sf)
    docs = pd.read_parquet(
        sf + "/documents.parquet", columns=["doc_id", "text"]
    )
    w_l = logreg_fit_local(docs)
    assert np.array_equal(w_d, w_l)
    w_small = logreg_fit(sf, batch_size=256)
    assert np.array_equal(w_d, w_small)


def test_logreg_scores_accuracy_and_shape(ray_session):
    """The distilled classifier must beat the majority class by a wide
    margin on its own training labels (the Gopher gate) — ≥0.9 accuracy
    on this corpus — and emit one integer-logit row per doc."""
    from open_parse_ray.stages.quality_model import quality_logreg_scores

    out = quality_logreg_scores("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500 and out["doc_id"].nunique() == 500
    acc = float((out["pred"] == out["label"]).mean())
    base = max(out["label"].mean(), 1 - out["label"].mean())
    assert acc >= 0.9 and acc > base + 0.05
    assert (out["pred"] == (out["logit_fp"] > 0).astype("int64")).all()
