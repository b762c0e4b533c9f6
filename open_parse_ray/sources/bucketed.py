"""Hash-bucketed storage layout — co-partitioning at REST.

Every salted join in this repo pays one exchange to co-locate matching
keys. When the same table is joined on the same key run after run (the
fact/dimension pattern of a recurring pipeline), that exchange can be
paid ONCE at write time instead: route rows to ``bucket =
hash(key) % n_buckets`` directories, and any two tables bucketed with
the same (hash, n_buckets) join bucket-by-bucket with NO shuffle at
all — each join task reads exactly one bucket directory from each
side. This is Hive/Iceberg bucketing re-expressed for Ray Data; the
brief's "pick ONE partitioning key and reuse it across stages" made a
storage property.

Determinism rules honored: the bucket hash is a fixed multiplicative
mix (no seed, no process state); output files are CONTENT-ADDRESSED
(md5 of the serialized batch names the file), so re-running a failed
write converges on byte-identical layout instead of appending
duplicates — the resumability argument for the staging pass itself.
The staging cache is keyed by (source size, mtime, key, n_buckets),
mirroring sources/tables.table_path.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional

import numpy as np
import pandas as pd

_CACHE_ROOT = "/tmp/opr_cache/bucketed_v1"
_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 multiplier (public)


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id per int64 key — one vectorized
    multiplicative mix (top bits, which is where the multiply mixes
    best). Writer and joiner MUST share this function; that shared
    identity is the whole co-location guarantee."""
    k = keys.astype(np.uint64, copy=False)
    h = (k * _MIX) >> np.uint64(40)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds, out_dir: str, key_col: str, n_buckets: int = 16) -> str:
    """Write a Dataset into ``out_dir/bucket=K/part-<md5>.parquet``.
    Each task splits its block by bucket and writes one content-
    addressed file per non-empty bucket (idempotent: identical content
    converges on the same filename; os.replace keeps partial writes
    invisible)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for b in range(n_buckets):
        os.makedirs(os.path.join(out_dir, f"bucket={b}"), exist_ok=True)

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        bk = bucket_of(batch[key_col].to_numpy(dtype=np.int64), n_buckets)
        out_rows = []
        for b in np.unique(bk):
            part = batch[bk == b]
            t = pa.Table.from_pandas(part, preserve_index=False)
            sink = pa.BufferOutputStream()
            pq.write_table(t, sink)
            buf = sink.getvalue().to_pybytes()
            name = hashlib.md5(buf).hexdigest()
            dst = os.path.join(out_dir, f"bucket={int(b)}", f"part-{name}.parquet")
            if not os.path.exists(dst):
                tmp = dst + f".tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(buf)
                os.replace(tmp, dst)
            out_rows.append((int(b), len(part)))
        return pd.DataFrame(
            {
                "bucket": np.asarray([r[0] for r in out_rows], dtype=np.int64),
                "n": np.asarray([r[1] for r in out_rows], dtype=np.int64),
            }
        )

    # count() drives the streaming write to completion
    ds.map_batches(emit, batch_format="pandas", batch_size=65536).count()
    return out_dir


def ensure_bucketed_table(
    sf_dir: str,
    name: str,
    key_col: str,
    n_buckets: int = 16,
    columns: Optional[list] = None,
) -> str:
    """One-time bucketed staging of ``{sf_dir}/{name}.parquet`` under
    /tmp, keyed by (source size, mtime, key, n_buckets, columns) so a
    regenerated source re-stages. Returns the bucketed root dir."""
    import ray.data as rd

    from open_parse_ray.sources.tables import table_path

    src = os.path.join(sf_dir, f"{name}.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}|{key_col}|"
        f"{n_buckets}|{columns}".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join(_CACHE_ROOT, f"{name}-{key}")
    done = os.path.join(out_dir, "_STAGED")
    if os.path.exists(done):
        return out_dir
    write_bucketed(
        rd.read_parquet(table_path(sf_dir, name), columns=columns),
        out_dir,
        key_col,
        n_buckets,
    )
    with open(done + f".tmp.{os.getpid()}", "w") as f:
        f.write("ok")
    os.replace(done + f".tmp.{os.getpid()}", done)
    return out_dir


def bucketed_join(
    left_dir: str,
    right_dir: str,
    n_buckets: int,
    join_fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
):
    """Shuffle-FREE join of two co-bucketed layouts: one task per
    bucket reads its pair of bucket directories (pyarrow, local column
    IO — never an object-store exchange) and runs the vectorized
    ``join_fn``. Correct because both layouts share bucket_of: a key's
    rows on both sides live in the same bucket index by construction."""
    import pyarrow.parquet as pq
    import ray.data as rd

    def one_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in batch["item"].tolist():
            ldir = os.path.join(left_dir, f"bucket={int(b)}")
            rdir = os.path.join(right_dir, f"bucket={int(b)}")
            lf = sorted(os.listdir(ldir)) if os.path.isdir(ldir) else []
            rf = sorted(os.listdir(rdir)) if os.path.isdir(rdir) else []
            if not lf or not rf:
                continue
            import pyarrow as pa

            lt = pa.concat_tables(
                [pq.read_table(os.path.join(ldir, f)) for f in lf]
            ).to_pandas()
            rt = pa.concat_tables(
                [pq.read_table(os.path.join(rdir, f)) for f in rf]
            ).to_pandas()
            outs.append(join_fn(lt, rt))
        if not outs:
            return join_fn(pd.DataFrame(), pd.DataFrame())
        return pd.concat(outs, ignore_index=True)

    return rd.from_items(list(range(n_buckets))).map_batches(
        one_bucket, batch_format="pandas", batch_size=1
    )


def bucketed_join_orders(sf_dir: str, n_buckets: int = 16):
    """The orders ⋈ customer join of relational.orders_customer_join,
    run over bucketed STORAGE instead of a salted exchange — same
    result (equality-gated bitwise), zero shuffle at query time; the
    exchange was paid once at staging and is reused by every subsequent
    join on the key. Returns (o_orderkey, o_custkey, c_nationkey,
    price_cents)."""
    from open_parse_ray.stages.relational import _cents

    odir = ensure_bucketed_table(
        sf_dir, "orders", "o_custkey", n_buckets,
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cdir = ensure_bucketed_table(
        sf_dir, "customer", "c_custkey", n_buckets,
        columns=["c_custkey", "c_nationkey"],
    )

    def join(o: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        if len(o) == 0 or len(c) == 0:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "o_custkey": pd.Series([], dtype="int64"),
                    "c_nationkey": pd.Series([], dtype="int64"),
                    "price_cents": pd.Series([], dtype="int64"),
                }
            )
        out = o.merge(
            c, left_on="o_custkey", right_on="c_custkey", how="inner"
        )
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"].astype("int64"),
                "o_custkey": out["o_custkey"].astype("int64"),
                "c_nationkey": out["c_nationkey"].astype("int64"),
                "price_cents": _cents(out["o_totalprice"]),
            }
        )

    return bucketed_join(odir, cdir, n_buckets, join)
