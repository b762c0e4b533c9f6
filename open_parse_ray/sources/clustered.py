"""Key-clustered storage + metadata-pruned point lookups.

A 10^12-row fact table answers "give me these 20 keys" by reading row
GROUPS, not rows — but min/max pruning only helps if the layout is
CLUSTERED on the key (the source files here interleave keys, so every
row group's [min, max] spans the whole domain and nothing prunes).
This module stages a one-time sorted copy with bounded row groups
(disjoint key ranges by construction), and serves point lookups by
binary-searching the row-group statistics and reading ONLY the groups
whose range can contain a requested key.

The same /tmp staging contract as sources/tables.py (keyed by source
size+mtime+key, atomic os.replace); the sibling of sources/bucketed.py:
bucketing co-locates for JOINs, clustering co-locates for POINT ACCESS.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Tuple

import numpy as np

_CACHE_ROOT = "/tmp/opr_cache/clustered_v1"
ROW_GROUP_SIZE = 8192


def ensure_clustered_table(sf_dir: str, name: str, key_col: str) -> str:
    """One-time sorted (by ``key_col``, stable) parquet copy with
    bounded row groups. Returns the clustered file path."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, f"{name}.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}|{key_col}|"
        f"{ROW_GROUP_SIZE}".encode()
    ).hexdigest()[:16]
    dst_dir = os.path.join(_CACHE_ROOT, key)
    dst = os.path.join(dst_dir, f"{name}.parquet")
    if os.path.exists(dst):
        return dst
    os.makedirs(dst_dir, exist_ok=True)
    t = pq.read_table(src)
    t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending")]))
    tmp = dst + f".tmp.{os.getpid()}"
    pq.write_table(t, tmp, row_group_size=ROW_GROUP_SIZE)
    os.replace(tmp, dst)
    return dst


def _row_group_ranges(path: str, key_col: str) -> List[Tuple[int, int]]:
    """Per-row-group (min, max) of the cluster key, straight from the
    parquet footer — the index IS the file metadata, nothing extra to
    maintain or keep consistent."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out = []
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema == key_col:
                out.append((int(c.statistics.min), int(c.statistics.max)))
                break
    return out


def lookup_rows(path: str, key_col: str, ids: np.ndarray):
    """Point lookup: read ONLY the row groups whose [min, max] range can
    contain a requested id (disjoint ranges after clustering → each id
    touches at most one group), then filter exactly. Returns
    (pyarrow.Table, n_groups_read, n_groups_total)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(ids, dtype=np.int64))
    ranges = _row_group_ranges(path, key_col)
    mins = np.asarray([r[0] for r in ranges], dtype=np.int64)
    maxs = np.asarray([r[1] for r in ranges], dtype=np.int64)
    # clustered ⇒ mins are sorted; candidate group for id x is the last
    # group with min <= x; it matches iff x <= that group's max
    gi = np.searchsorted(mins, ids, side="right") - 1
    ok = (gi >= 0) & (ids <= maxs[np.clip(gi, 0, len(maxs) - 1)])
    groups = sorted(set(int(g) for g in gi[ok]))
    f = pq.ParquetFile(path)
    if not groups:
        empty = f.schema_arrow.empty_table()
        return empty, 0, len(ranges)
    t = f.read_row_groups(groups)
    keep = pc.is_in(t[key_col], value_set=pa.array(ids, t[key_col].type))
    return t.filter(keep), len(groups), len(ranges)


def point_lookup_orders(sf_dir: str, every: int = 997):
    """Corpus query: point-fetch the orders whose key is a multiple of
    ``every`` (a deterministic id set derivable WITHOUT scanning —
    mirrored by the oracle's modulo predicate) through the clustered
    layout. At sf0.01 this reads ~every-th row group instead of the
    table; the pruning ratio is asserted by the pytest gate, the values
    by the SQL oracle. Returns (o_orderkey, o_custkey, price_cents)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from open_parse_ray.stages.relational import _cents

    path = ensure_clustered_table(sf_dir, "orders", "o_orderkey")
    md = pq.ParquetFile(path).metadata
    # max key from footer stats — no data read
    hi = max(r[1] for r in _row_group_ranges(path, "o_orderkey"))
    ids = np.arange(0, hi + 1, every, dtype=np.int64)
    t, _, _ = lookup_rows(path, "o_orderkey", ids)
    df = t.to_pandas()
    import pandas as pd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64),
                "o_custkey": df["o_custkey"].to_numpy(dtype=np.int64),
                "price_cents": _cents(df["o_totalprice"]),
            }
        )
    )
