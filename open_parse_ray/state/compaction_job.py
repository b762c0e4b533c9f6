"""Changelog COMPACTION job: merge-on-read → a new materialized base.

stats_after_changelog proves reads can stay O(changes) without ever
materializing the merged corpus — but a changelog that grows forever
eventually costs every reader more than one rewrite would. This job is
the rewrite: apply the CDC stream to the base corpus ONCE, bucket by
bucket, and emit a fresh compacted base with the same resumability
contract as the extraction job (per-partition lineage with input
fingerprints, atomic commits, idempotent re-runs).

Partitioning rides the bucketed-layout routing contract
(sources/bucketed.bucket_of): the base is staged into doc_id-hash
buckets once (content-addressed, reused across runs), and each bucket
compacts INDEPENDENTLY — base rows and changelog events for a doc live
in exactly one bucket, so last-writer-wins needs no cross-bucket
exchange at all. A failed run resumes by re-running only the buckets
whose partition is missing or whose INPUT fingerprint changed (the
lineage.py staleness rule).

The changelog event stream mirrors incremental._changelog_rows' modulo
synth (upsert ' rev1' at seq 1 for doc_id%5, delete at seq 2 for %7,
resurrect ' rev2' at seq 3 for %35) but carries the new TEXT, because
compaction materializes state rather than fingerprints. Drift between
the two synths — or between this job and the apply_changelog query —
is pinned by the job==query fingerprint-set equality gate.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
from typing import Dict, Optional

import numpy as np
import pandas as pd

from open_parse_ray.state.lineage import _shard_fp


def _changelog_events_with_text(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, seq, op, text) event rows — the text-carrying twin of
    incremental._changelog_rows (same modulo stream, same seq/op
    semantics; op 1 = upsert, 0 = delete with text='')."""
    out = {"doc_id": [], "seq": [], "op": [], "text": []}

    def emit(d, seq, op, text):
        out["doc_id"].append(d)
        out["seq"].append(seq)
        out["op"].append(op)
        out["text"].append(text)

    for d, t in zip(df["doc_id"].to_numpy(dtype=np.int64), df["text"]):
        d = int(d)
        emit(d, 0, 1, t)
        if d % 5 == 0:
            emit(d, 1, 1, t + " rev1")
        if d % 7 == 0:
            emit(d, 2, 0, "")
        if d % 35 == 0:
            emit(d, 3, 1, t + " rev2")
    return pd.DataFrame(
        {
            "doc_id": np.asarray(out["doc_id"], dtype=np.int64),
            "seq": np.asarray(out["seq"], dtype=np.int64),
            "op": np.asarray(out["op"], dtype=np.int64),
            "text": out["text"],
        }
    )


def _compact_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Generic last-writer-wins replay over one bucket's base rows:
    max-seq event per doc wins, delete winners drop the doc, upsert
    winners materialize their text (n_chars recomputed from it).
    lang/source are carried from the base row."""
    ev = _changelog_events_with_text(df)
    if len(ev) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "text": pd.Series([], dtype="object"),
                "lang": pd.Series([], dtype="object"),
                "source": pd.Series([], dtype="object"),
                "n_chars": pd.Series([], dtype="int64"),
            }
        )
    win = ev.loc[ev.groupby("doc_id")["seq"].idxmax()]
    keep = win[win["op"] == 1][["doc_id", "text"]]
    base = df[["doc_id", "lang", "source"]]
    out = keep.merge(base, on="doc_id", how="inner").sort_values("doc_id")
    return pd.DataFrame(
        {
            "doc_id": out["doc_id"].astype("int64").to_numpy(),
            "text": out["text"].to_numpy(),
            "lang": out["lang"].to_numpy(),
            "source": out["source"].to_numpy(),
            "n_chars": np.asarray([len(t) for t in out["text"]], dtype=np.int64),
        }
    )


def _bucket_content_hash(df: pd.DataFrame) -> str:
    """Order-insensitive per-partition content hash (XOR of row md5s) —
    the same commutative identity lineage.py uses, over this schema."""
    acc = 0
    for d, t in zip(df["doc_id"], df["text"]):
        h = hashlib.md5(f"{int(d)}\x00{t}".encode()).digest()
        acc ^= int.from_bytes(h, "big")
    return f"{acc:032x}"


def run_compaction(
    sf_dir: str,
    out_dir: str,
    n_buckets: int = 16,
    fail_after_parts: Optional[int] = None,
) -> Dict:
    """Compact base + changelog into ``out_dir/part=K`` partitions.
    Resumable: finished partitions with matching input fingerprints are
    skipped; stale ones (changed bucket input) re-run; a partial run
    killed mid-way (``fail_after_parts`` injects that) resumes to a
    byte-identical final state. Returns a summary dict."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from open_parse_ray.sources.bucketed import ensure_bucketed_table

    broot = ensure_bucketed_table(
        sf_dir, "documents", "doc_id", n_buckets,
        columns=["doc_id", "text", "lang", "source"],
    )
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def one_bucket(b: int, files, fp: str) -> Dict:
        frames = [pq.read_table(f).to_pandas() for f in files]
        df = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {c: [] for c in ["doc_id", "text", "lang", "source"]}
            )
        )
        out = _compact_frame(df)
        pdir = os.path.join(out_dir, f"part={b:05d}")
        tmp = pdir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False),
            os.path.join(tmp, "data.parquet"),
        )
        lineage = {
            "part": b,
            "input_files": list(files),
            "input_fp": fp,
            "n_docs": int(len(out)),
            "content_hash": _bucket_content_hash(out),
        }
        with open(os.path.join(tmp, "lineage.json"), "w") as f:
            json.dump(lineage, f)
        shutil.rmtree(pdir, ignore_errors=True)
        os.rename(tmp, pdir)
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write("ok")
        return lineage

    pending, skipped = [], 0
    for b in range(n_buckets):
        files = sorted(glob.glob(os.path.join(broot, f"bucket={b}", "part-*.parquet")))
        fp = _shard_fp(files)
        pdir = os.path.join(out_dir, f"part={b:05d}")
        lj = os.path.join(pdir, "lineage.json")
        if os.path.exists(os.path.join(pdir, "_SUCCESS")) and os.path.exists(lj):
            with open(lj) as f:
                rec = json.load(f)
            if rec.get("input_fp") == fp:
                skipped += 1
                continue
        pending.append((b, files, fp))

    if fail_after_parts is None:
        completed = ray.get([one_bucket.remote(*p) for p in pending])
    else:  # deterministic sequential commits for the kill-resume gate
        completed = []
        for p in pending:
            completed.append(ray.get(one_bucket.remote(*p)))
            if len(completed) >= fail_after_parts:
                raise RuntimeError(
                    f"injected failure after {len(completed)} partitions"
                )

    return {
        "n_buckets": n_buckets,
        "n_skipped": skipped,
        "n_compacted": len(completed),
        "n_docs": int(
            sum(r["n_docs"] for r in completed)
        ),
        "out_dir": out_dir,
    }


def read_compacted(out_dir: str) -> pd.DataFrame:
    """All partitions concatenated (test-scale helper)."""
    import pyarrow.parquet as pq

    parts = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet")))
    return pd.concat(
        [pq.read_table(p).to_pandas() for p in parts], ignore_index=True
    ).sort_values("doc_id").reset_index(drop=True)
