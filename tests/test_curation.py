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


def test_curation_job_kill_resume_byte_identical(ray_session, tmp_path):
    """SCALE.md §14 two-phase resume, end to end: kill phase 1 after 2
    committed parts → resume; kill phase 2 (keyed checkpoint intact) →
    resume reruns ONLY phase 2. Both resumed outputs are byte-identical
    to an uninterrupted run AND to the one-shot prepare_curated_corpus
    query (the shared-kernel guarantee)."""
    import pytest

    from open_parse_ray.stages.curation import prepare_curated_corpus
    from open_parse_ray.state import curation_job

    # shard the documents table into 6 parquet files (the unit phase 1
    # resumes at)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    src = tmp_path / "docs_sharded"
    src.mkdir()
    n = len(docs)
    step = (n + 5) // 6
    for i in range(6):
        docs.iloc[i * step : (i + 1) * step].to_parquet(
            src / f"documents-{i:03d}.parquet", index=False
        )

    out_clean = str(tmp_path / "clean")
    out_p1 = str(tmp_path / "killed_phase1")
    out_p2 = str(tmp_path / "killed_phase2")

    res_clean = curation_job.run_curation_job(str(src), out_clean)
    assert res_clean["skipped"] == [] and res_clean["n_parts"] == 6
    full = curation_job.read_final(out_clean).to_pandas()

    # phase-1 crash after 2 parts → resume skips exactly those
    with pytest.raises(RuntimeError, match="phase-1 failure"):
        curation_job.run_curation_job(str(src), out_p1, fail_after_parts=2)
    res = curation_job.run_curation_job(str(src), out_p1)
    assert res["skipped"] == [0, 1]
    assert sorted(res["ran"] + res["skipped"]) == list(range(6))
    pd.testing.assert_frame_equal(
        curation_job.read_final(out_p1).to_pandas(), full
    )

    # phase-2 crash: keyed checkpoint complete, no final output yet;
    # resume runs zero phase-1 shards and still commits the final table
    with pytest.raises(RuntimeError, match="phase-2 failure"):
        curation_job.run_curation_job(str(src), out_p2, fail_phase2=True)
    with pytest.raises(ValueError, match="no committed final"):
        curation_job.read_final(out_p2)
    res2 = curation_job.run_curation_job(str(src), out_p2)
    assert res2["ran"] == [] and res2["skipped"] == list(range(6))
    pd.testing.assert_frame_equal(
        curation_job.read_final(out_p2).to_pandas(), full
    )

    # the job output equals the one-shot query (sorted by doc_id)
    query = (
        prepare_curated_corpus(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full[query.columns], query)

    # per-part content hashes are run-independent (determinism)
    import json

    ha = {r["part"]: r["content_hash"] for r in res_clean["lineage"]}
    hb = {
        p: json.load(open(f"{out_p1}/keyed/part={p:05d}/lineage.json"))[
            "content_hash"
        ]
        for p in range(6)
    }
    assert ha == hb
