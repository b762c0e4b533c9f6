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


def test_job_json_sink(ray_session, tmp_path):
    """The resumable job can write JSON partitions (parsed.json() analog):
    same lineage/_SUCCESS layout, rows readable, resume skips."""
    import glob
    import json
    import pandas as pd

    from open_parse_ray.sources.pages import ensure_pages_parquet
    from open_parse_ray.state import lineage

    src = ensure_pages_parquet(0.001)
    out = str(tmp_path / "json_out")
    res = lineage.run_job(src, out, shard_size=4, format="json")
    assert res["ran"] and not res["skipped"]
    parts = glob.glob(f"{out}/part=*/_SUCCESS")
    assert parts
    files = [
        f for f in glob.glob(f"{out}/part=*/*.json")
        if not f.endswith("lineage.json")
    ]
    assert files
    df = pd.concat([pd.read_json(f, lines=True) for f in files], ignore_index=True)
    assert len(df) == 200 and "extracted_text" in df.columns
    total = sum(
        json.load(open(p))["n_docs"]
        for p in glob.glob(f"{out}/part=*/lineage.json")
    )
    assert total == 200
    # resume: nothing re-runs
    res2 = lineage.run_job(src, out, shard_size=4, format="json")
    assert not res2["ran"] and len(res2["skipped"]) == res["n_parts"]


def test_run_job_warc_input_byte_identical_to_parquet(ray_session, tmp_path):
    """The resumable job over WARC shards commits partitions whose
    merged content equals the parquet-input job's — the container is
    invisible to lineage, metrics, and the extraction kernel. Resume
    (kill after 1 part → rerun) also works over WARC input."""
    import pytest

    from open_parse_ray.sources.pages import ensure_pages_parquet
    from open_parse_ray.sources.warc import export_pages_warc
    from open_parse_ray.state import lineage

    pq_dir = ensure_pages_parquet(0.001)
    warc_dir = str(tmp_path / "warc_in")
    export_pages_warc(0.001, warc_dir)

    out_pq = str(tmp_path / "out_pq")
    out_warc = str(tmp_path / "out_warc")
    lineage.run_job(pq_dir, out_pq, shard_size=4)
    with pytest.raises(RuntimeError):
        lineage.run_job(warc_dir, out_warc, shard_size=4, fail_after_parts=1)
    res = lineage.run_job(warc_dir, out_warc, shard_size=4)
    assert res["skipped"]  # the committed part survived the crash

    def merged(out):
        t = lineage.read_result(out).to_pandas()
        return (
            t.sort_values("url")[["url", "extracted_text"]].reset_index(drop=True)
        )

    import pandas as pd

    pd.testing.assert_frame_equal(merged(out_warc), merged(out_pq))


def test_changed_input_invalidates_its_partition(ray_session, tmp_path):
    """The staleness hole resume-by-index would have: after a completed
    job, one input shard's CONTENT changes (a recrawl) — re-running the
    job must re-run exactly that partition (input_fp mismatch) and skip
    the rest, and the re-run output must reflect the new input."""
    import glob as _g
    import shutil

    import pyarrow.parquet as pq

    from open_parse_ray.sources.pages import ensure_pages_parquet
    from open_parse_ray.state import lineage

    src = ensure_pages_parquet(0.001)
    indir = str(tmp_path / "in")
    shutil.copytree(src, indir)
    files = sorted(_g.glob(indir + "/*.parquet"))
    assert len(files) >= 3

    out = str(tmp_path / "out")
    r1 = lineage.run_job(indir, out, pipeline="basic", shard_size=1)
    assert r1["ran"] and not r1["skipped"]

    # clean resume: nothing invalidated, nothing re-run
    r2 = lineage.run_job(indir, out, pipeline="basic", shard_size=1)
    assert r2["ran"] == [] and r2["invalidated"] == []
    assert len(r2["skipped"]) == len(files)

    # mutate shard 1's content (drop half its rows) — mtime/size change
    t = pq.read_table(files[1])
    pq.write_table(t.slice(0, t.num_rows // 2), files[1])

    r3 = lineage.run_job(indir, out, pipeline="basic", shard_size=1)
    assert r3["invalidated"] == [1]
    assert r3["ran"] == [1]
    assert 1 not in r3["skipped"] and len(r3["skipped"]) == len(files) - 1

    # the re-run partition reflects the new (halved) input
    import json as _json
    import os

    with open(os.path.join(out, "part=00001", "lineage.json")) as f:
        rec = _json.load(f)
    assert rec["n_docs"] == t.num_rows // 2


def test_curation_job_changed_input_invalidates(ray_session, tmp_path):
    """The curation job's phase-1 resume applies the same input-
    fingerprint contract: a changed input shard re-runs exactly its
    keyed partition, stale/orphan partitions never feed phase 2, and
    the resumed final equals a from-scratch run over the new input."""
    import glob as _g
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from open_parse_ray.state import curation_job

    import os

    indir = str(tmp_path / "docs_in")
    os.makedirs(indir)
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)] + ["the", "and", "of", "to", "in"]
    for f in range(3):
        ids = np.arange(f * 100, f * 100 + 100, dtype=np.int64)
        texts = [
            ". ".join(
                " ".join(rng.choice(vocab, 12)) for _ in range(8)
            )
            + "."
            for _ in ids
        ]
        pd.DataFrame(
            {
                "doc_id": ids,
                "text": texts,
                "lang": "en",
                "source": "s",
                "n_chars": [len(t) for t in texts],
            }
        ).to_parquet(f"{indir}/docs_{f}.parquet")

    out = str(tmp_path / "job")
    r1 = curation_job.run_curation_job(indir, out, shard_size=1)
    assert len(r1["ran"]) == 3

    # clean resume: all skipped, nothing invalidated
    r2 = curation_job.run_curation_job(indir, out, shard_size=1)
    assert r2["ran"] == [] and r2["invalidated"] == []

    # change shard 2's content
    f2 = sorted(_g.glob(indir + "/*.parquet"))[2]
    t = pq.read_table(f2)
    pq.write_table(t.slice(0, 50), f2)
    r3 = curation_job.run_curation_job(indir, out, shard_size=1)
    assert r3["invalidated"] == [2] and r3["ran"] == [2]

    # resumed final == from-scratch final over the new input
    fresh = str(tmp_path / "fresh")
    curation_job.run_curation_job(indir, fresh, shard_size=1)
    a = curation_job.read_final(out).to_pandas()
    b = curation_job.read_final(fresh).to_pandas()
    assert a.equals(b)


def test_curation_job_all_filtered_shard_commits_empty(ray_session, tmp_path):
    """A shard whose every doc fails the quality gates (4-word-vocab
    spam) must COMMIT an empty keyed partition — not crash the metrics
    read or stall resume — and the job completes with a final output
    from the surviving shards."""
    import os

    import numpy as np
    import pandas as pd

    from open_parse_ray.state import curation_job

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    rng = np.random.default_rng(5)
    # shard 0: spam (all filtered); shard 1: real-looking docs
    pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "text": [
                " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], 30))
                for _ in range(100)
            ],
            "lang": "en",
            "source": "s",
            "n_chars": 100,
        }
    ).to_parquet(f"{indir}/a_spam.parquet")
    vocab = [f"w{i}" for i in range(200)] + ["the", "and", "of"]
    texts = [
        ". ".join(" ".join(rng.choice(vocab, 12)) for _ in range(8)) + "."
        for _ in range(100)
    ]
    pd.DataFrame(
        {
            "doc_id": np.arange(1000, 1100, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{indir}/b_real.parquet")

    out = str(tmp_path / "job")
    r = curation_job.run_curation_job(indir, out, shard_size=1)
    assert sorted(r["ran"]) == [0, 1]
    rec = {x["part"]: x for x in r["lineage"]}
    assert rec[0]["n_docs"] == 0          # spam shard committed empty
    assert rec[1]["n_docs"] > 0
    final = curation_job.read_final(out).to_pandas()
    assert len(final) > 0
    assert (final["doc_id"] >= 1000).all()  # only the real shard survives


def test_compaction_job_kill_resume_and_staleness(ray_session, tmp_path):
    """Compaction job resumability contract: (1) a run killed after 3
    committed partitions resumes to a final state byte-identical to a
    from-scratch run (per-partition content hashes equal); (2) a clean
    re-run skips every partition; (3) job == query: the compacted
    corpus' (doc_id, md5(text)) set equals apply_changelog's output."""
    import hashlib
    import json
    import os

    import pytest

    from open_parse_ray.stages.incremental import apply_changelog
    from open_parse_ray.state.compaction_job import (
        read_compacted,
        run_compaction,
    )

    SFD = "/root/testdata/sf0.001"
    clean = str(tmp_path / "clean")
    run_compaction(SFD, clean)

    killed = str(tmp_path / "killed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_compaction(SFD, killed, fail_after_parts=3)
    s = run_compaction(SFD, killed)  # resume
    assert s["n_skipped"] == 3 and s["n_compacted"] == 13

    def hashes(root):
        out = {}
        for p in sorted(os.listdir(root)):
            if p.startswith("part="):
                with open(os.path.join(root, p, "lineage.json")) as f:
                    out[p] = json.load(f)["content_hash"]
        return out

    assert hashes(clean) == hashes(killed)
    comp = read_compacted(clean)
    fps_job = {
        (int(d), hashlib.md5(t.encode()).hexdigest())
        for d, t in zip(comp["doc_id"], comp["text"])
    }
    q = apply_changelog(SFD).to_pandas()
    assert fps_job == {(int(d), f) for d, f in zip(q["doc_id"], q["fp"])}
    s2 = run_compaction(SFD, clean)
    assert s2["n_compacted"] == 0 and s2["n_skipped"] == s2["n_buckets"]


def test_compaction_job_changed_input_invalidates(ray_session, tmp_path):
    """A changed bucket input (extra content-addressed part file in one
    bucket) invalidates EXACTLY that partition at resume, and the
    resumed output equals a from-scratch run over the new input."""
    import json
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_parse_ray.sources.bucketed import bucket_of, ensure_bucketed_table
    from open_parse_ray.state.compaction_job import read_compacted, run_compaction

    SFD = "/root/testdata/sf0.001"
    out = str(tmp_path / "out")
    run_compaction(SFD, out)

    # append one new doc to its routed bucket in the staged layout
    broot = ensure_bucketed_table(
        SFD, "documents", "doc_id", 16,
        columns=["doc_id", "text", "lang", "source"],
    )
    new_id = np.int64(10_000_019)  # prime, no changelog mods fire
    b = int(bucket_of(np.array([new_id]), 16)[0])
    t = pa.table(
        {
            "doc_id": pa.array([new_id], pa.int64()),
            "text": pa.array(["brand new doc"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["synthetic"], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(broot, f"bucket={b}", "part-zzznew.parquet"))
    try:
        s = run_compaction(SFD, out)
        assert s["n_compacted"] == 1 and s["n_skipped"] == 15
        scratch = str(tmp_path / "scratch")
        run_compaction(SFD, scratch)
        a, c = read_compacted(out), read_compacted(scratch)
        assert a.equals(c)
        assert new_id in set(a["doc_id"])
    finally:
        os.remove(os.path.join(broot, f"bucket={b}", "part-zzznew.parquet"))
        shutil.rmtree(out, ignore_errors=True)
