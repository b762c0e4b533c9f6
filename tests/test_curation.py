"""Composition gate for the end-to-end curation chain
(stages/curation.py): the chain's output must equal composing the
standalone (individually oracle-checked) operators locally."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _local_reference(k_tiers=4, train_pct=80, val_pct=10):
    from open_parse_ray.stages.analysis import (
        gopher_quality_batch,
        n_tokens_sql_semantics,
    )
    from open_parse_ray.stages.pii import scrub_text
    from open_parse_ray.stages.ranking import ntile_of_rank
    from open_parse_ray.stages.web import canonicalize_url, synth_messy_url

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    ).to_pandas()
    gate = gopher_quality_batch(docs)
    docs = docs[gate["passes_gopher"].to_numpy(dtype=bool)]
    rows = []
    for d, t, s in zip(docs["doc_id"], docs["text"], docs["source"]):
        red, e, i = scrub_text(t)
        rows.append(
            (
                int(d),
                canonicalize_url(synth_messy_url(int(d), s)),
                n_tokens_sql_semantics(red),
                e + i,
            )
        )
    df = pd.DataFrame(rows, columns=["doc_id", "canonical_url", "n_tokens", "n_pii"])
    df = df.sort_values(["canonical_url", "doc_id"]).groupby(
        "canonical_url", as_index=False
    ).first()
    df = df.sort_values(["n_tokens", "doc_id"]).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["tier"] = ntile_of_rank(df["rank"].to_numpy(), len(df), k_tiers)
    ids = df["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
    bucket = (((ids * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(100)).astype(
        np.int64
    )
    df["split"] = np.where(
        bucket < train_pct, "train", np.where(bucket < train_pct + val_pct, "val", "test")
    )
    cols = ["doc_id", "canonical_url", "n_tokens", "n_pii", "rank", "tier", "split"]
    return (
        df[cols]
        .astype({"doc_id": "int64", "n_tokens": "int64", "n_pii": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_curation_chain_matches_operator_composition(ray_session):
    from open_parse_ray.stages.curation import prepare_curated_corpus

    got = (
        prepare_curated_corpus(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _local_reference()
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_curation_chain_survivor_invariants(ray_session):
    from open_parse_ray.stages.curation import prepare_curated_corpus

    out = prepare_curated_corpus(SF).to_pandas()
    assert out["canonical_url"].is_unique
    assert sorted(out["rank"]) == list(range(1, len(out) + 1))
    assert set(out["split"]) <= {"train", "val", "test"}
    assert out["tier"].between(1, 4).all()
