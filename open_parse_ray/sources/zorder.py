"""Z-order (Morton-curve) MULTI-column clustering + box scans.

sources/clustered.py serves point lookups on ONE key; real fact tables
get range predicates on TWO dimensions at once (customer × date,
domain × crawl-time). Sorting by either column alone leaves the other
scattered: a box covering 1/4 of each dimension (1/16 of the data)
still reads 1/4 of the row groups. Interleaving the bits of both
columns (the Morton curve) keeps 2-D-close rows file-close, so BOTH
columns' per-row-group [min, max] footer ranges are tight and the
standard per-column stats pruning — no new index structure, the
parquet footer IS the index, exactly like Delta Lake's OPTIMIZE
ZORDER — reads ~area + perimeter of the box instead of a full stripe.

Same /tmp staging contract as sources/clustered.py (content-keyed by
source size+mtime+columns, atomic os.replace). Pruning can only SKIP
row groups whose stats exclude the box; survivors are filtered
exactly, so layout never affects answers (gated bitwise vs a full
scan) — only the number of groups read (gated too).
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Tuple

import numpy as np

_CACHE_ROOT = "/tmp/opr_cache/zorder_v1"
ROW_GROUP_SIZE = 8192
_EPOCH_DAY = np.datetime64("1970-01-01", "D")


def _spread16(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between the bits of a 16-bit value (uint32 out):
    the classic Morton magic-mask ladder, vectorized."""
    x = x.astype(np.uint32)
    x = (x | (x << np.uint32(8))) & np.uint32(0x00FF00FF)
    x = (x | (x << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    x = (x | (x << np.uint32(2))) & np.uint32(0x33333333)
    x = (x | (x << np.uint32(1))) & np.uint32(0x55555555)
    return x


def _zvalue(a: np.ndarray, b: np.ndarray, bounds) -> np.ndarray:
    """Morton code of two int64 columns: each is range-bucketized to 16
    bits with pure-integer scaling ((v-lo)*65535)//max(hi-lo,1), then
    bit-interleaved. Bucketization only affects LAYOUT QUALITY — all
    query-time pruning uses the raw column stats, so a skewed or
    widened domain can never mis-prune."""
    (alo, ahi), (blo, bhi) = bounds
    qa = ((a - alo) * 65535) // max(ahi - alo, 1)
    qb = ((b - blo) * 65535) // max(bhi - blo, 1)
    return (
        (_spread16(qa.astype(np.uint32)).astype(np.uint64) << np.uint64(1))
        | _spread16(qb.astype(np.uint32)).astype(np.uint64)
    ).astype(np.int64)


def _day_ints(arr: np.ndarray) -> np.ndarray:
    """timestamp → integer days since epoch (the SQL mirror is
    datediff('day', DATE '1970-01-01', col))."""
    return arr.astype("datetime64[D]").astype(np.int64)


def _col_as_int(t, col: str) -> np.ndarray:
    v = t[col].to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.datetime64):
        return _day_ints(v)
    return v.astype(np.int64)


def ensure_zorder_table(sf_dir: str, name: str, col_a: str, col_b: str) -> str:
    """One-time Z-order-clustered parquet copy with bounded row groups.
    Timestamp columns cluster on their day number. Returns the path."""
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, f"{name}.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}|{col_a}|{col_b}|"
        f"{ROW_GROUP_SIZE}".encode()
    ).hexdigest()[:16]
    dst_dir = os.path.join(_CACHE_ROOT, key)
    dst = os.path.join(dst_dir, f"{name}.parquet")
    if os.path.exists(dst):
        return dst
    os.makedirs(dst_dir, exist_ok=True)
    t = pq.read_table(src)
    a, b = _col_as_int(t, col_a), _col_as_int(t, col_b)
    bounds = ((int(a.min()), int(a.max())), (int(b.min()), int(b.max())))
    z = _zvalue(a, b, bounds)
    order = np.argsort(z, kind="stable")
    tmp = dst + f".tmp.{os.getpid()}"
    pq.write_table(t.take(order), tmp, row_group_size=ROW_GROUP_SIZE)
    os.replace(tmp, dst)
    return dst


def _rg_stat_ranges(path: str, col: str) -> List[Tuple[int, int]]:
    """Per-row-group (min, max) of ``col`` as int64 (timestamps as day
    numbers), straight from the parquet footer."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out = []
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema == col:
                lo, hi = c.statistics.min, c.statistics.max
                if hasattr(lo, "toordinal"):  # datetime/date stats
                    lo = int(np.datetime64(lo, "us").astype("datetime64[D]").astype(int))
                    hi = int(np.datetime64(hi, "us").astype("datetime64[D]").astype(int))
                out.append((int(lo), int(hi)))
                break
    return out


def box_scan(
    path: str,
    col_a: str,
    a_lo: int,
    a_hi: int,
    col_b: str,
    b_lo: int,
    b_hi: int,
):
    """2-D box scan: skip every row group whose per-column footer range
    misses the box on EITHER column (Z-clustering makes both ranges
    tight), read the survivors, filter exactly. Returns
    (pyarrow.Table, n_groups_read, n_groups_total)."""
    import pyarrow.parquet as pq

    ra = _rg_stat_ranges(path, col_a)
    rb = _rg_stat_ranges(path, col_b)
    groups = [
        g
        for g in range(len(ra))
        if ra[g][1] >= a_lo and ra[g][0] <= a_hi
        and rb[g][1] >= b_lo and rb[g][0] <= b_hi
    ]
    f = pq.ParquetFile(path)
    if not groups:
        return f.schema_arrow.empty_table(), 0, len(ra)
    t = f.read_row_groups(groups)
    a, b = _col_as_int(t, col_a), _col_as_int(t, col_b)
    keep = (a >= a_lo) & (a <= a_hi) & (b >= b_lo) & (b <= b_hi)
    return t.filter(keep), len(groups), len(ra)


def zorder_box_orders(sf_dir: str):
    """Corpus query: orders in a (custkey × orderdate) box — a ~10%
    customer-key slice crossed with the middle decile of the date range
    — served through the Z-order layout. Both box bounds derive from
    the table's GLOBAL column min/max (footer-only, no scan), so the
    SQL oracle reproduces them with min()/max() subqueries and the
    identical integer arithmetic. Returns
    (o_orderkey, o_custkey, order_day, price_cents)."""
    import pandas as pd
    import ray.data as rd

    from open_parse_ray.stages.relational import _cents

    path = ensure_zorder_table(sf_dir, "orders", "o_custkey", "o_orderdate")
    ck = _rg_stat_ranges(path, "o_custkey")
    dy = _rg_stat_ranges(path, "o_orderdate")
    ck_lo, ck_hi = min(r[0] for r in ck), max(r[1] for r in ck)
    d_lo, d_hi = min(r[0] for r in dy), max(r[1] for r in dy)
    a_lo = ck_lo + ((ck_hi - ck_lo) * 50) // 100
    a_hi = a_lo + max((ck_hi - ck_lo) // 10, 1)
    b_lo = d_lo + ((d_hi - d_lo) * 45) // 100
    b_hi = d_lo + ((d_hi - d_lo) * 55) // 100
    t, _, _ = box_scan(path, "o_custkey", a_lo, a_hi, "o_orderdate", b_lo, b_hi)
    df = t.to_pandas()
    return rd.from_pandas(
        pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64),
                "o_custkey": df["o_custkey"].to_numpy(dtype=np.int64),
                "order_day": _day_ints(df["o_orderdate"].to_numpy()),
                "price_cents": _cents(df["o_totalprice"]),
            }
        )
    )


ZORDER_BOX_ORDERS_SQL = """
    WITH b AS (
      SELECT min(o_custkey) AS ck_lo, max(o_custkey) AS ck_hi,
             min(datediff('day', DATE '1970-01-01', o_orderdate)) AS d_lo,
             max(datediff('day', DATE '1970-01-01', o_orderdate)) AS d_hi
      FROM orders
    ),
    bb AS (
      SELECT ck_lo + ((ck_hi - ck_lo) * 50) // 100 AS a_lo,
             ck_lo + ((ck_hi - ck_lo) * 50) // 100
               + greatest((ck_hi - ck_lo) // 10, 1) AS a_hi,
             d_lo + ((d_hi - d_lo) * 45) // 100 AS b_lo,
             d_lo + ((d_hi - d_lo) * 55) // 100 AS b_hi
      FROM b
    )
    SELECT o_orderkey, o_custkey,
           CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
             AS order_day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders, bb
    WHERE o_custkey BETWEEN a_lo AND a_hi
      AND datediff('day', DATE '1970-01-01', o_orderdate)
            BETWEEN b_lo AND b_hi
"""
