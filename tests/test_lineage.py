"""Resume-from-checkpoint gate: kill mid-run, re-run, verify no
duplicate / missing urls and byte-identical output vs an uninterrupted run."""

import shutil

import pytest

from open_parse_ray.sources.pages import ensure_pages_parquet
from open_parse_ray.state import lineage


@pytest.fixture(scope="module")
def pages_dir(ray_session):
    return ensure_pages_parquet(0.001)


def _sorted_pairs(tbl):
    return sorted(
        zip(tbl["url"].to_pylist(), tbl["extracted_text"].to_pylist())
    )


def test_resume_after_injected_failure(pages_dir, tmp_path_factory):
    out_a = str(tmp_path_factory.mktemp("job_interrupted"))
    out_b = str(tmp_path_factory.mktemp("job_clean"))

    # clean reference run
    res_clean = lineage.run_job(pages_dir, out_b)
    assert res_clean["skipped"] == []
    full = lineage.read_result(out_b)

    # interrupted run: crash after 2 committed shards
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.run_job(pages_dir, out_a, fail_after_parts=2)
    assert len(lineage.done_parts(out_a)) == 2

    # resume skips the committed shards and finishes the rest
    res = lineage.run_job(pages_dir, out_a)
    assert res["skipped"] == [0, 1]
    assert sorted(res["ran"] + res["skipped"]) == list(range(res["n_parts"]))

    resumed = lineage.read_result(out_a)
    assert resumed.num_rows == full.num_rows  # no dups, no missing
    assert _sorted_pairs(resumed) == _sorted_pairs(full)  # byte-identical

    m = lineage.job_metrics(out_a)
    assert m["n_docs"] == full.num_rows
    assert m["n_errors"] == 0
    assert m["n_parts"] == res["n_parts"]

    # per-partition content hashes match across independent runs
    ha = {r["part"]: r["content_hash"] for r in res_clean["lineage"]}
    hb = {
        p: lineage.job_metrics.__globals__["json"].load(
            open(f"{out_a}/part={p:05d}/lineage.json")
        )["content_hash"]
        for p in lineage.done_parts(out_a)
    }
    assert ha == hb

    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)
