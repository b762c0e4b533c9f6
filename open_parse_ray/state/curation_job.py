"""Resumable curated-corpus job — the SCALE.md §14 two-phase checkpoint
shape, wired into the same shard-granular lineage machinery as the
extraction job (state/lineage.py; reference analog: the eval runner
seam, src/evals/run_evals.py:10-27).

Phase 1 (resumable, >95% of compute at 10^12 docs): per input shard,
run the shard-local curation kernel (Gopher gate → PII scrub → token
count → canonical key, stages/curation.curation_keyed_batch — reads and
scrubs the TEXT) and commit the compact keyed projection
(doc_id, canonical_url, n_tokens, n_pii) as ``keyed/part=N`` partitions
with ``_SUCCESS`` markers and lineage records. Resume = skip committed
parts, byte-identically (the kernel is deterministic per row, and the
partition content hash is order-insensitive).

Phase 2 (restartable, 3-4 orders of magnitude smaller input): URL-dedup
exchange → exact global rank + tiers → hash split over the keyed
Parquet (stages/curation.curate_from_keyed), committed atomically to
``final/``. A crash in phase 2 reruns phase 2 only — never the text
scan.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq


def _part_dir(root: str, part: int) -> str:
    return os.path.join(root, f"part={part:05d}")


def _done_parts(root: str) -> List[int]:
    return sorted(
        int(os.path.basename(os.path.dirname(p)).split("=")[1])
        for p in glob.glob(os.path.join(root, "part=*", "_SUCCESS"))
    )


def _keyed_hash(tbl: pa.Table) -> str:
    """Order-insensitive content hash of a keyed partition (XOR of
    per-row sha1) — same commutativity argument as lineage._content_hash."""
    acc = 0
    for d, u, nt, np_ in zip(
        tbl["doc_id"].to_pylist(),
        tbl["canonical_url"].to_pylist(),
        tbl["n_tokens"].to_pylist(),
        tbl["n_pii"].to_pylist(),
    ):
        h = hashlib.sha1(f"{d}|{u}|{nt}|{np_}".encode()).digest()
        acc ^= int.from_bytes(h[:16], "big")
    return f"{acc:032x}"


def _run_keyed_shard(part: int, files: List[str], keyed_dir: str) -> Dict:
    """Phase-1 unit of work: one shard of document files → one committed
    keyed partition (idempotent tmp-write + atomic rename)."""
    import ray.data as rd

    from open_parse_ray.stages.curation import curation_keyed_batch
    from open_parse_ray.state.lineage import _CONSTRUCT_LOCK

    t0 = time.perf_counter()
    pdir = _part_dir(keyed_dir, part)
    # clear stale tmp dirs from ANY previous pid — a kill -9 mid-write
    # leaves part=N.tmp.<oldpid> behind, and phase 2 must never see it
    for stale in glob.glob(pdir + ".tmp.*"):
        shutil.rmtree(stale, ignore_errors=True)
    tmp = pdir + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    # Dataset construction serialized for the same fsspec lazy-import
    # race lineage._run_shard guards against; execution stays concurrent
    with _CONSTRUCT_LOCK:
        ds = rd.read_parquet(files, columns=["doc_id", "text", "source"])
    ds.map_batches(
        curation_keyed_batch, batch_format="pandas", batch_size=8192
    ).write_parquet(tmp)

    # an all-filtered shard (every doc failed the quality gates — WILL
    # happen at corpus scale) writes ZERO parquet files; commit an
    # explicit empty partition with the keyed schema instead of letting
    # the metrics read crash on an empty directory
    if not glob.glob(os.path.join(tmp, "*.parquet")):
        import pandas as _pd

        empty = curation_keyed_batch(
            _pd.DataFrame({"doc_id": _pd.Series([], dtype="int64"),
                           "text": _pd.Series([], dtype=object),
                           "source": _pd.Series([], dtype=object)})
        )
        pq.write_table(
            pa.Table.from_pandas(empty, preserve_index=False),
            os.path.join(tmp, "empty.parquet"),
        )

    from open_parse_ray.state.lineage import _shard_fp

    tbl = pq.read_table(tmp)
    lineage = {
        "part": part,
        "input_files": files,
        "input_fp": _shard_fp(files),
        "n_docs": tbl.num_rows,
        "content_hash": _keyed_hash(tbl),
        "wall_s": round(time.perf_counter() - t0, 3),
    }
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump(lineage, f)
    shutil.rmtree(pdir, ignore_errors=True)
    os.rename(tmp, pdir)
    with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return lineage


def run_curation_job(
    input_dir: str,
    out_dir: str,
    k_tiers: int = 4,
    train_pct: int = 80,
    val_pct: int = 10,
    shard_size: int = 1,
    shard_concurrency: int = 4,
    fail_after_parts: Optional[int] = None,
    fail_phase2: bool = False,
) -> Dict:
    """Run (or resume) the two-phase curated-corpus job.

    ``input_dir`` holds the documents table as one or more parquet files
    (each file = the unit that shards group). ``fail_after_parts``
    injects a crash after N newly-committed phase-1 parts (forces
    sequential order so the committed prefix is deterministic);
    ``fail_phase2`` injects a crash after phase 1 completes — resume
    must then rerun ONLY phase 2. Returns phase-1 lineage + the final
    partition path.
    """
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {input_dir}")
    shards = [files[i : i + shard_size] for i in range(0, len(files), shard_size)]

    keyed_dir = os.path.join(out_dir, "keyed")
    final_dir = os.path.join(out_dir, "final")
    os.makedirs(keyed_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(
            {
                "input_dir": input_dir,
                "n_parts": len(shards),
                "k_tiers": k_tiers,
                "train_pct": train_pct,
                "val_pct": val_pct,
                "shards": {str(i): fs for i, fs in enumerate(shards)},
            },
            f,
            indent=1,
        )

    # staleness check (the lineage.run_job contract): a committed keyed
    # partition only counts as done if its recorded input fingerprint
    # still matches; stale and orphan (index >= len(shards)) partitions
    # are REMOVED so phase 2's committed-parts glob can never feed old
    # rows into the global dedup/rank
    from open_parse_ray.state.lineage import _shard_fp

    done = set()
    invalidated = []
    for i in _done_parts(keyed_dir):
        pdir = _part_dir(keyed_dir, i)
        ok = False
        if i < len(shards):
            try:
                with open(os.path.join(pdir, "lineage.json")) as f:
                    ok = json.load(f).get("input_fp") == _shard_fp(shards[i])
            except OSError:
                ok = False
        if ok:
            done.add(i)
        else:
            invalidated.append(i)
            shutil.rmtree(pdir, ignore_errors=True)
    pending = [i for i in range(len(shards)) if i not in done]
    completed: List[Dict] = []
    if fail_after_parts is not None:
        for i in pending:
            completed.append(_run_keyed_shard(i, shards[i], keyed_dir))
            if len(completed) >= fail_after_parts:
                raise RuntimeError(
                    f"injected phase-1 failure after {len(completed)} parts"
                )
    else:
        from concurrent.futures import ThreadPoolExecutor

        from open_parse_ray.state.lineage import _preseed_fsspec_http

        _preseed_fsspec_http()
        with ThreadPoolExecutor(max_workers=max(1, shard_concurrency)) as pool:
            futs = [
                pool.submit(_run_keyed_shard, i, shards[i], keyed_dir)
                for i in pending
            ]
            for fut in futs:
                completed.append(fut.result())
        completed.sort(key=lambda r: r["part"])

    if fail_phase2:
        raise RuntimeError("injected phase-2 failure (keyed checkpoint intact)")

    # ---- phase 2: global dedup + rank + split over the keyed parquet.
    # Always (re)computed from the checkpoint — it is orders of magnitude
    # cheaper than phase 1 and rerunning beats partial-commit complexity.
    import ray.data as rd

    from open_parse_ray.stages.curation import curate_from_keyed

    # ONLY _SUCCESS-committed partitions feed phase 2: a bare
    # "part=*/*.parquet" glob would also match stale "part=N.tmp.<pid>"
    # dirs left by a killed writer and silently merge partial/duplicate
    # rows (the done_parts discipline of state/lineage.py)
    part_files = sorted(
        f
        for p in _done_parts(keyed_dir)
        for f in glob.glob(os.path.join(_part_dir(keyed_dir, p), "*.parquet"))
    )
    keyed = rd.read_parquet(part_files)
    out = curate_from_keyed(
        keyed, k_tiers=k_tiers, train_pct=train_pct, val_pct=val_pct
    )
    tmp = final_dir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    out.write_parquet(tmp)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp, final_dir)
    with open(os.path.join(final_dir, "_SUCCESS"), "w") as f:
        f.write("ok")

    # resume-accurate totals: sum over EVERY committed part's lineage,
    # not just the parts that ran in this invocation
    n_docs_keyed = 0
    for p in _done_parts(keyed_dir):
        with open(os.path.join(_part_dir(keyed_dir, p), "lineage.json")) as f:
            n_docs_keyed += json.load(f)["n_docs"]
    return {
        "n_parts": len(shards),
        "skipped": sorted(done),
        "invalidated": sorted(invalidated),
        "ran": [c["part"] for c in completed],
        "lineage": completed,
        "n_docs_keyed": n_docs_keyed,
        "final": final_dir,
    }


def read_final(out_dir: str) -> pa.Table:
    """The committed curated table, sorted by doc_id (canonical order for
    comparisons; the job itself never needs a global sort)."""
    final_dir = os.path.join(out_dir, "final")
    if not os.path.exists(os.path.join(final_dir, "_SUCCESS")):
        raise ValueError(f"curation job at {out_dir} has no committed final output")
    tbl = pq.read_table(final_dir)
    import pyarrow.compute as pc

    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))
