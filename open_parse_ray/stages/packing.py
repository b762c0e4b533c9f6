"""Training-sequence packing: the distributed PREFIX-SCAN primitive.

Pretraining data loaders concatenate documents in a fixed order and cut
the token stream into fixed-length sequences; each document therefore
needs its GLOBAL token offset — a running sum over 10^12 rows, which no
``groupby`` expresses. This module implements the classic two-phase
distributed scan:

1. bucket partial sums: ``bucket = doc_id // bucket_size`` →
   per-batch partial (bucket, sum) rows → tiny combine (cardinality =
   n_docs / bucket_size, NOT n_docs);
2. the driver cumsums the bucket totals (bounded: at 10^12 docs and
   bucket_size 4096 that is ~2.4e8 int pairs — shard the bucket table
   and recurse the same scan if that ever outgrows one machine) and
   broadcasts the per-bucket base offsets via ``ray.put``;
3. a salted shuffle co-locates each bucket's rows; inside a partition
   one vectorized sort + exclusive cumsum adds the base offset.

Everything is integer-exact, so the DuckDB window-function oracle
(``SUM(...) OVER (ORDER BY doc_id)``) hash-matches bit for bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pack_offsets(sf_dir: str, seq_len: int = 512, bucket_size: int = 4096):
    """Per-document global token offsets + packed-sequence assignment.

    Returns (doc_id, n_tokens, global_offset, start_seq, end_seq,
    start_pos): the document's tokens occupy the concatenated stream at
    [global_offset, global_offset + n_tokens), i.e. packed sequences
    ``start_seq`` .. ``end_seq`` (docs may straddle sequence borders,
    exactly like concat-then-chunk pretraining loaders), starting at
    ``start_pos`` within ``start_seq``. Zero-token docs get
    start_seq = end_seq = global_offset // seq_len and start_pos =
    global_offset %% seq_len."""
    import ray
    import ray.data as rd

    from open_parse_ray.stages.analysis import n_tokens_sql_semantics
    from open_parse_ray.stages.dedup import salted_groupby
    from open_parse_ray.stages.relational import _combine_partials

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tokens_and_bucket(b: pd.DataFrame) -> pd.DataFrame:
        n = np.asarray(
            [n_tokens_sql_semantics(t) for t in b["text"]], dtype=np.int64
        )
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": ids, "n_tokens": n, "bucket": ids // bucket_size}
        )

    tok = ds.map_batches(tokens_and_bucket, batch_format="pandas", batch_size=8192)

    # phase 1: bucket partial sums (bounded-cardinality combine)
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("bucket", as_index=False).agg(s=("n_tokens", "sum"))

    bucket_sums = _combine_partials(
        tok.map_batches(partial, batch_format="pandas", batch_size=8192),
        ["bucket"],
        {"s": "sum"},
    ).to_pandas()

    # phase 2: driver cumsum over the tiny bucket table → base offsets
    bucket_sums = bucket_sums.sort_values("bucket").reset_index(drop=True)
    bases = np.concatenate(
        ([0], np.cumsum(bucket_sums["s"].to_numpy(dtype=np.int64))[:-1])
    ) if len(bucket_sums) else np.array([], dtype=np.int64)
    base_of = dict(
        zip(bucket_sums["bucket"].astype(np.int64), bases.astype(np.int64))
    )
    base_ref = ray.put(base_of)

    # phase 3: per-bucket exclusive cumsum + base, fully vectorized
    def assign(part: pd.DataFrame) -> pd.DataFrame:
        bases_local = ray.get(base_ref)
        g = part.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        buckets = g["bucket"].to_numpy(dtype=np.int64)
        # exclusive cumsum restarting at every bucket boundary
        cs = np.concatenate(([0], np.cumsum(n)[:-1]))
        starts = np.flatnonzero(
            np.concatenate(([True], buckets[1:] != buckets[:-1]))
        )
        seg_base = np.repeat(cs[starts], np.diff(np.append(starts, len(n))))
        within = cs - seg_base
        base = np.array([bases_local[b] for b in buckets], dtype=np.int64)
        off = base + within
        end = off + np.maximum(n - 1, 0)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "n_tokens": n,
                "global_offset": off,
                "start_seq": off // seq_len,
                "end_seq": end // seq_len,
                "start_pos": off % seq_len,
            }
        )

    return salted_groupby(tok, lambda b: b["bucket"], assign)
