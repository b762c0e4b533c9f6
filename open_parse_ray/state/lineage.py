"""Resumable partitioned extraction job with per-partition lineage + metrics.

North-star requirement (BASELINE.json): "resumable from checkpoint with
per-partition lineage + metrics" at 10^12-document scale. The reference
has no checkpointing at all — any exception aborts the caller loop
(reference: src/evals/run_evals.py:12-25); here the unit of recovery is
an input shard (one or more source Parquet files), NOT a row: at 10^12
rows a row-granular manifest would itself be a big-data problem, while a
shard-granular one is O(number of input files).

Layout under ``out_dir``::

    part=00003/            extracted rows for input shard 3 (Parquet)
    part=00003/_SUCCESS    commit marker (written after rename)
    part=00003/lineage.json  input files, row counts, error counts,
                             order-insensitive content hash, wall time
    _manifest.json         shard → input-file assignment for the run

Resume = re-run the same command: shards whose ``_SUCCESS`` exists are
skipped (anti-join of done partitions against the input manifest); a
partially-written shard is left in a ``.tmp`` dir and rewritten
idempotently. Each shard is an independent streaming Ray Data pipeline
parallel across its row groups; size ``shard_size`` (files per shard) so
one shard saturates the cluster — recovery granularity trades off
against scheduling overhead, not parallelism.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import threading
import time
from typing import Dict, List, Optional

_CONSTRUCT_LOCK = threading.Lock()


def _preseed_fsspec_http() -> None:
    """Make Ray's lazy fsspec-http probe thread-safe.

    aiohttp is absent in this environment, so importing
    ``fsspec.implementations.http`` always fails — but the *failed* module
    is removed from sys.modules each time, and two driver threads
    first-importing it concurrently race into a partial-module
    ``ImportError`` that Ray's ``except ModuleNotFoundError`` does not
    catch (ray/data/datasource/path_util.py:153). Pre-seeding a stub
    module whose ``HTTPFileSystem`` matches no real filesystem makes
    every later import a deterministic cache hit. No-op when the real
    module imports fine."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        mod = types.ModuleType("fsspec.implementations.http")

        class _NeverHTTPFileSystem:
            pass

        mod.HTTPFileSystem = _NeverHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod

import pyarrow as pa
import pyarrow.parquet as pq


def _detect_input_format(input_dir: str) -> str:
    if glob.glob(os.path.join(input_dir, "*.parquet")):
        return "parquet"
    if glob.glob(os.path.join(input_dir, "*.warc")) or glob.glob(
        os.path.join(input_dir, "*.warc.gz")
    ):
        return "warc"
    if glob.glob(os.path.join(input_dir, "*.jsonl")) or glob.glob(
        os.path.join(input_dir, "*.jsonl.gz")
    ):
        return "jsonl"
    if glob.glob(os.path.join(input_dir, "*.csv")) or glob.glob(
        os.path.join(input_dir, "*.csv.gz")
    ):
        return "csv"
    raise FileNotFoundError(
        f"no parquet, warc, jsonl or csv files under {input_dir}"
    )


def _shard_inputs(
    input_dir: str, shard_size: int = 1, input_format: str = "parquet"
) -> List[List[str]]:
    if input_format == "warc":
        files = sorted(
            glob.glob(os.path.join(input_dir, "*.warc"))
            + glob.glob(os.path.join(input_dir, "*.warc.gz"))
        )
    elif input_format == "jsonl":
        files = sorted(
            glob.glob(os.path.join(input_dir, "*.jsonl"))
            + glob.glob(os.path.join(input_dir, "*.jsonl.gz"))
        )
    elif input_format == "csv":
        files = sorted(
            glob.glob(os.path.join(input_dir, "*.csv"))
            + glob.glob(os.path.join(input_dir, "*.csv.gz"))
        )
    else:
        files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no {input_format} files under {input_dir}")
    return [files[i : i + shard_size] for i in range(0, len(files), shard_size)]


def _shard_fp(files) -> str:
    """Input-shard fingerprint: md5 over (abspath, size, mtime_ns) per
    file — the same cheap stat-based identity the /tmp staging caches
    key on. Recorded in every partition's lineage and REQUIRED to match
    at resume: a partition whose input changed (recrawled file, or a
    re-shard that shifted which files part i covers) is stale and must
    re-run, not be skipped — without this check, resume-by-index
    silently serves old output over new input."""
    h = hashlib.md5()
    for f in files:
        st = os.stat(f)
        h.update(
            f"{os.path.abspath(f)}|{st.st_size}|{st.st_mtime_ns}\x00".encode()
        )
    return h.hexdigest()


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def _content_hash(tbl: pa.Table) -> str:
    """Order-insensitive content hash: XOR of per-row sha1(url || text).

    Commutative so the hash is invariant to block order / parallelism —
    two runs of the same shard agree byte-for-byte regardless of task
    scheduling.
    """
    acc = 0
    urls = tbl["url"].to_pylist()
    texts = tbl["extracted_text"].to_pylist() if "extracted_text" in tbl.column_names else [""] * len(urls)
    for u, t in zip(urls, texts):
        h = hashlib.sha1()
        h.update(u.encode())
        h.update(b"\x00")
        h.update((t or "").encode())
        acc ^= int.from_bytes(h.digest()[:16], "big")
    return f"{acc:032x}"


def _run_shard(
    part: int,
    files: List[str],
    out_dir: str,
    pipeline: str,
    batch_size: int,
    format: str = "parquet",
    input_format: str = "parquet",
) -> Dict:
    """Extract one input shard → committed partition dir + lineage record."""
    import ray.data as rd

    from open_parse_ray.pipelines.extraction import extract

    t0 = time.perf_counter()
    pdir = _part_dir(out_dir, part)
    tmp = pdir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    # Dataset *construction* is serialized: Ray's driver-side path
    # resolution lazily imports fsspec.implementations.http, and two
    # threads importing it concurrently race into a partial-module
    # ImportError that Ray's `except ModuleNotFoundError` doesn't catch.
    # Construction is cheap metadata work; *execution* (write_parquet)
    # stays fully concurrent across shards.
    with _CONSTRUCT_LOCK:
        if input_format == "warc":
            from open_parse_ray.sources.warc import read_pages_warc

            ds = read_pages_warc(files, columns=["url", "html"])
        elif input_format == "jsonl":
            from open_parse_ray.sources.jsonl import read_pages_jsonl

            ds = read_pages_jsonl(files, columns=["url", "html"])
        elif input_format == "csv":
            from open_parse_ray.sources.csvpages import read_pages_csv

            ds = read_pages_csv(files, columns=["url", "html"])
        else:
            ds = rd.read_parquet(files)
        out = extract(ds, pipeline=pipeline, output="docs", batch_size=batch_size)
    if format == "json":
        # the reference's parsed.json() serialization analog
        out.write_json(tmp)
    else:
        out.write_parquet(tmp)

    # per-partition metrics from the written files (small: one shard)
    if format == "json":
        tbl = _read_json_partition(tmp)
    else:
        tbl = pq.read_table(tmp)
    n_err = 0
    if "status" in tbl.column_names:
        import pyarrow.compute as pc

        n_err = int(pc.sum(pc.equal(tbl["status"], "error")).as_py() or 0)
    lineage = {
        "part": part,
        "input_files": files,
        "input_fp": _shard_fp(files),
        "n_docs": tbl.num_rows,
        "n_errors": n_err,
        "n_nodes": int(pa.compute.sum(tbl["n_nodes"]).as_py() or 0),
        "content_hash": _content_hash(tbl),
        "wall_s": round(time.perf_counter() - t0, 3),
    }
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump(lineage, f)

    # idempotent commit: replace any stale partition, then mark success
    shutil.rmtree(pdir, ignore_errors=True)
    os.rename(tmp, pdir)
    with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return lineage


def _read_json_partition(part_dir: str) -> pa.Table:
    """Read a JSON-format partition back against the explicit DOC_SCHEMA.

    pandas' default dtype inference would widen int32 columns (n_nodes,
    n_pages) to int64 and could coerce numeric-looking strings; casting
    to DOC_SCHEMA keeps JSON and Parquet partitions concat-compatible."""
    import pandas as _pd

    from open_parse_ray.pipelines.extraction import DOC_SCHEMA

    frames = [
        _pd.read_json(p, lines=True, dtype=False)
        for p in sorted(glob.glob(os.path.join(part_dir, "*.json")))
        if not p.endswith("lineage.json")
    ]
    df = _pd.concat(frames, ignore_index=True)
    return pa.Table.from_pandas(
        df[DOC_SCHEMA.names], preserve_index=False
    ).cast(DOC_SCHEMA)


def done_parts(out_dir: str) -> List[int]:
    out = []
    for p in glob.glob(os.path.join(out_dir, "part=*", "_SUCCESS")):
        out.append(int(os.path.basename(os.path.dirname(p)).split("=")[1]))
    return sorted(out)


def run_job(
    input_dir: str,
    out_dir: str,
    pipeline: str = "basic",
    shard_size: int = 1,
    batch_size: int = 32,
    fail_after_parts: Optional[int] = None,
    shard_concurrency: int = 4,
    format: str = "parquet",
    input_format: str = "auto",
) -> Dict:
    """Run (or resume) the extraction job over all input shards.
    ``input_format`` 'auto' detects parquet vs WARC shards from the
    input directory; both flow through the identical extraction plan.

    ``shard_concurrency`` shard pipelines are in flight at once (driver
    threads; Ray interleaves their tasks), so small shards — the unit of
    recovery — don't serialize the cluster: one shard's row groups may be
    fewer than the cluster's cores, but several shards together saturate
    it. ``fail_after_parts`` injects a crash after N newly-completed
    shards (resume test); it forces sequential execution so the committed
    prefix is deterministic.
    """
    os.makedirs(out_dir, exist_ok=True)
    if input_format == "auto":
        input_format = _detect_input_format(input_dir)
    shards = _shard_inputs(input_dir, shard_size, input_format)
    # a job directory is single-format: resuming with a different --format
    # would mix parquet and json partitions and read_result would fail or
    # silently drift dtypes — refuse up front
    mpath = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
        if prev.get("format", "parquet") != format:
            raise ValueError(
                f"job dir {out_dir} was started with format="
                f"{prev.get('format', 'parquet')!r}; cannot resume with {format!r}"
            )
    manifest = {
        "input_dir": input_dir,
        "format": format,
        "input_format": input_format,
        "n_parts": len(shards),
        "shards": {str(i): fs for i, fs in enumerate(shards)},
    }
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1)

    done = set()
    invalidated = []
    for i in done_parts(out_dir):
        if i >= len(shards):
            continue  # input shrank; orphan partitions are ignored
        try:
            with open(os.path.join(_part_dir(out_dir, i), "lineage.json")) as f:
                rec = json.load(f)
        except OSError:
            invalidated.append(i)
            continue
        if rec.get("input_fp") == _shard_fp(shards[i]):
            done.add(i)
        else:
            invalidated.append(i)
    pending = [i for i in range(len(shards)) if i not in done]
    completed: List[Dict] = []
    if fail_after_parts is not None:
        for i in pending:
            completed.append(
                _run_shard(
                    i, shards[i], out_dir, pipeline, batch_size, format, input_format
                )
            )
            if len(completed) >= fail_after_parts:
                raise RuntimeError(f"injected failure after {len(completed)} parts")
    else:
        from concurrent.futures import ThreadPoolExecutor

        _preseed_fsspec_http()
        with ThreadPoolExecutor(max_workers=max(1, shard_concurrency)) as pool:
            futs = {
                pool.submit(
                    _run_shard, i, shards[i], out_dir, pipeline, batch_size,
                    format, input_format,
                ): i
                for i in pending
            }
            for fut in futs:
                completed.append(fut.result())
        completed.sort(key=lambda r: r["part"])
    return {
        "n_parts": len(shards),
        "skipped": sorted(done),
        "invalidated": sorted(invalidated),
        "ran": [c["part"] for c in completed],
        "lineage": completed,
    }


def read_result(out_dir: str) -> pa.Table:
    """Read all committed partitions (ignores uncommitted .tmp dirs)."""
    parts = [
        os.path.join(_part_dir(out_dir, p))
        for p in done_parts(out_dir)
    ]
    tables = []
    for p in parts:
        for f in sorted(glob.glob(os.path.join(p, "*.parquet"))):
            tables.append(pq.read_table(f))
        data_json = [
            f
            for f in glob.glob(os.path.join(p, "*.json"))
            if not f.endswith("lineage.json")
        ]
        if data_json:
            tables.append(_read_json_partition(p))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


def job_metrics(out_dir: str) -> Dict:
    """Aggregate per-partition lineage into job-level metrics."""
    recs = []
    for p in done_parts(out_dir):
        with open(os.path.join(_part_dir(out_dir, p), "lineage.json")) as f:
            recs.append(json.load(f))
    return {
        "n_parts": len(recs),
        "n_docs": sum(r["n_docs"] for r in recs),
        "n_nodes": sum(r["n_nodes"] for r in recs),
        "n_errors": sum(r["n_errors"] for r in recs),
        "wall_s": round(sum(r["wall_s"] for r in recs), 3),
    }
