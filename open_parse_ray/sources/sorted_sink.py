"""Distributed SORTED write: globally-ordered, partitioned parquet.

sources/clustered.py and sources/zorder.py stage their layouts with a
single-process sort — right for a /tmp cache of test-scale tables,
wrong for 10^12 rows. This module is the cluster-scale path those
layouts name: the same histogram→boundary machinery global_rank uses
for exact ranks range-partitions the table (one exchange), each
partition sorts LOCALLY and writes its own pid-addressed parquet file
(bounded row groups), and a tiny MANIFEST (pid, path, key min/max,
rows, content md5) makes global order, pruning, and resume all
metadata-level facts:

- global order: partition key ranges are disjoint by construction
  (cut keys come from one shared boundary array), so file pid order
  IS total order — gated by reading the concatenation back.
- pruning: a range scan intersects the manifest first (file level),
  then per-file footer stats (row-group level) — same contract as
  sources/clustered.py, now over many files.
- resume/idempotence: files are written atomically under a name
  containing the content md5; re-running a finished partition
  produces byte-identical output and replaces nothing.

Ties are total-ordered by (key, id) through the same value<<40|id
composite global_rank uses, so the layout is deterministic for any
block structure.
"""

from __future__ import annotations

import hashlib
import os
from typing import Tuple

import numpy as np
import pandas as pd

ROW_GROUP_SIZE = 8192


def write_sorted(
    keyed,
    out_dir: str,
    num_parts: int = 16,
) -> pd.DataFrame:
    """Sort a Dataset of (doc_id:int64, n_chars:int64, …payload) rows
    globally by (n_chars, doc_id) into ``out_dir``. Returns the manifest
    DataFrame ordered by pid. One exchange total; the driver holds only
    the value histogram and the manifest."""
    import pyarrow.parquet as pq
    import ray

    from open_parse_ray.stages.dedup import salted_groupby
    from open_parse_ray.stages.ranking import _boundaries, _composite, _fold
    from open_parse_ray.stages.relational import _combine_partials

    os.makedirs(out_dir, exist_ok=True)
    keyed = keyed.materialize()

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "v": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                    "max_id": pd.Series([], dtype="int64"),
                }
            )
        vc = b["n_chars"].value_counts()
        return pd.DataFrame(
            {
                "v": vc.index.to_numpy(dtype=np.int64),
                "cnt": vc.to_numpy(dtype=np.int64),
                "max_id": np.int64(b["doc_id"].max()),
            }
        )

    hp = _combine_partials(
        _fold(
            keyed.map_batches(hist_partial, batch_format="pandas", batch_size=65536),
            ["v"],
            {"cnt": "sum", "max_id": "max"},
        ),
        ["v"],
        {"cnt": "sum", "max_id": "max"},
    ).to_pandas()
    if len(hp) == 0:
        return pd.DataFrame(
            {
                "pid": pd.Series([], dtype="int64"),
                "path": pd.Series([], dtype="object"),
                "n_rows": pd.Series([], dtype="int64"),
                "v_lo": pd.Series([], dtype="int64"),
                "v_hi": pd.Series([], dtype="int64"),
                "md5": pd.Series([], dtype="object"),
            }
        )
    bounds = _boundaries(
        hp[["v", "cnt"]], int(hp["max_id"].max()), num_parts
    )
    bounds_ref = ray.put(bounds)

    def pid_of(b: pd.DataFrame) -> pd.Series:
        bs = ray.get(bounds_ref)
        key = _composite(
            b["n_chars"].to_numpy(dtype=np.int64),
            b["doc_id"].to_numpy(dtype=np.int64),
        )
        return pd.Series(
            np.searchsorted(bs, key, side="right").astype(np.int64), index=b.index
        )

    n_parts_eff = len(bounds) + 1

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        g = g.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        pid = int(pid_of(g.iloc[:1]).iloc[0])
        t = pa.Table.from_pandas(g, preserve_index=False)
        buf = pa.BufferOutputStream()
        pq.write_table(t, buf, row_group_size=ROW_GROUP_SIZE)
        data = buf.getvalue().to_pybytes()
        digest = hashlib.md5(data).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{pid:05d}-{digest}.parquet")
        if not os.path.exists(path):  # idempotent re-run / resume skip
            tmp = path + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        return pd.DataFrame(
            {
                "pid": [np.int64(pid)],
                "path": [path],
                "n_rows": [np.int64(len(g))],
                "v_lo": [np.int64(g["n_chars"].iloc[0])],
                "v_hi": [np.int64(g["n_chars"].iloc[-1])],
                "md5": [digest],
            }
        )

    manifest = (
        salted_groupby(keyed, pid_of, write_part, num_parts=n_parts_eff)
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    manifest.to_parquet(os.path.join(out_dir, "_manifest.parquet"))
    return manifest


def range_scan_sorted(
    out_dir: str, v_lo: int, v_hi: int
) -> Tuple["object", int, int]:
    """Range scan over a write_sorted layout: manifest prunes FILES,
    footer stats prune ROW GROUPS inside survivors, survivors filter
    exactly. Returns (pyarrow.Table, n_groups_read, n_groups_total) with
    group totals counted across all files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    man = pd.read_parquet(os.path.join(out_dir, "_manifest.parquet"))
    total, read, tables = 0, 0, []
    for r in man.itertuples():
        f = pq.ParquetFile(r.path)
        md = f.metadata
        total += md.num_row_groups
        if r.v_hi < v_lo or r.v_lo > v_hi:
            continue
        groups = []
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                c = rg.column(i)
                if c.path_in_schema == "n_chars":
                    if c.statistics.max >= v_lo and c.statistics.min <= v_hi:
                        groups.append(g)
                    break
        if not groups:
            continue
        read += len(groups)
        t = f.read_row_groups(groups)
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        tables.append(t.filter((v >= v_lo) & (v <= v_hi)))
    if not tables:
        first = pq.ParquetFile(man["path"].iloc[0]).schema_arrow.empty_table()
        return first, 0, total
    return pa.concat_tables(tables), read, total


def sorted_range_docs(sf_dir: str):
    """Corpus query: documents whose n_chars lies in the middle quintile
    of the corpus range, served from the distributed-sorted layout
    (manifest + footer pruning). Bounds derive from the global column
    min/max so the SQL oracle mirrors them with subqueries. Returns
    (doc_id, n_chars, lang)."""
    import ray.data as rd

    from open_parse_ray.sources.tables import table_path

    src = table_path(sf_dir, "documents")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}|sorted_v1".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join("/tmp/opr_cache/sorted_v1", key)
    if not os.path.exists(os.path.join(out_dir, "_manifest.parquet")):
        ds = rd.read_parquet(src, columns=["doc_id", "n_chars", "lang"])
        write_sorted(ds, out_dir)
    man = pd.read_parquet(os.path.join(out_dir, "_manifest.parquet"))
    lo, hi = int(man["v_lo"].min()), int(man["v_hi"].max())
    a = lo + ((hi - lo) * 40) // 100
    b = lo + ((hi - lo) * 60) // 100
    t, _, _ = range_scan_sorted(out_dir, a, b)
    df = t.to_pandas()
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_chars": df["n_chars"].to_numpy(dtype=np.int64),
                "lang": df["lang"],
            }
        )
    )


SORTED_RANGE_DOCS_SQL = """
    WITH b AS (
      SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents
    ),
    bb AS (
      SELECT lo + ((hi - lo) * 40) // 100 AS a,
             lo + ((hi - lo) * 60) // 100 AS c
      FROM b
    )
    SELECT doc_id, n_chars, lang
    FROM documents, bb
    WHERE n_chars BETWEEN a AND c
"""
