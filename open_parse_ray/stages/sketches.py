"""Mergeable quantile sketch with a TRACKED exact rank-error budget.

Completes the approximate-analytics family (HyperLogLog distinct
counts, Misra–Gries heavy hitters, Bloom membership): a bounded-memory
single-pass quantile summary in the MRL/KLL compactor style. The exact
distributed quantiles in stages/quantiles.py take 4 histogram passes
over the data; this sketch answers ANY quantile after ONE pass with
O(k log(n/k)) memory — the streaming/telemetry trade, and the shape a
10^12-row pipeline uses for per-partition distribution monitoring
where a second pass is unaffordable.

Design choices that make it auditable rather than probabilistic:
- compaction offsets alternate DETERMINISTICALLY per level (no RNG),
  so a given insertion order reproduces bit-for-bit;
- every compaction at weight w adds exactly w to a carried
  ``err_budget`` — the classic compactor bound (discarding alternate
  elements of a weight-w sorted run perturbs any rank by at most w).
  The sketch therefore SELF-CERTIFIES: |true_rank(estimate(p)) −
  target_rank(p)| ≤ err_budget is a theorem about this instance, and
  the tests assert it against brute force on every distribution they
  throw at it (uniform, sorted, reverse, constant, zipf, and the
  corpus itself).

Estimates depend on insertion/merge order (inherent to compacting
sketches), so this operator is documented OUT of the block-structure
invariance list — the err_budget bound, not bit-equality, is its
correctness contract (the same carve-out as pca_fit's float coords).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd


class MergeQuantileSketch:
    """KLL/MRL-style compactor stack over int64 values.

    ``levels[l]`` holds a sorted int64 array of items with weight 2^l.
    A level exceeding ``2k`` items compacts: keep alternate elements
    (offset toggles per compaction), promote to level l+1, add 2^l to
    the error budget.
    """

    __slots__ = ("k", "levels", "coins", "n", "err_budget")

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: List[np.ndarray] = [np.array([], dtype=np.int64)]
        self.coins: List[int] = [0]
        self.n = 0
        self.err_budget = 0

    def _compact(self) -> None:
        l = 0
        while l < len(self.levels):
            buf = self.levels[l]
            if len(buf) <= 2 * self.k:
                l += 1
                continue
            buf = np.sort(buf, kind="stable")
            off = self.coins[l] & 1
            self.coins[l] += 1
            keep = buf[off::2]
            if l + 1 == len(self.levels):
                self.levels.append(np.array([], dtype=np.int64))
                self.coins.append(0)
            self.levels[l + 1] = np.concatenate([self.levels[l + 1], keep])
            self.levels[l] = np.array([], dtype=np.int64)
            self.err_budget += 1 << l
            l += 1

    def insert(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.int64)
        if len(v) == 0:
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()

    def merge(self, other: "MergeQuantileSketch") -> None:
        assert other.k == self.k
        for l in range(len(other.levels)):
            while l >= len(self.levels):
                self.levels.append(np.array([], dtype=np.int64))
                self.coins.append(0)
            self.levels[l] = np.concatenate([self.levels[l], other.levels[l]])
        self.n += other.n
        self.err_budget += other.err_budget
        self._compact()

    def _weighted(self):
        vals, wts = [], []
        for l, buf in enumerate(self.levels):
            if len(buf):
                vals.append(buf)
                wts.append(np.full(len(buf), 1 << l, dtype=np.int64))
        if not vals:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        o = np.argsort(v, kind="stable")
        return v[o], w[o]

    def quantile(self, p: int) -> Optional[int]:
        """Estimated value at the exact-rank rule 1 + (p*(n-1))//100 —
        the same integer rank arithmetic the exact quantile family
        pins. None when empty."""
        if self.n == 0:
            return None
        v, w = self._weighted()
        target = 1 + (p * (self.n - 1)) // 100
        cum = np.cumsum(w)
        i = int(np.searchsorted(cum, target, side="left"))
        return int(v[min(i, len(v) - 1)])

    def to_bytes(self) -> bytes:
        """Fixed little-endian serialization for shipping partials."""
        import struct

        parts = [struct.pack("<qqq", self.k, self.n, self.err_budget)]
        parts.append(struct.pack("<q", len(self.levels)))
        for buf, c in zip(self.levels, self.coins):
            parts.append(struct.pack("<qq", len(buf), c))
            parts.append(np.ascontiguousarray(buf, dtype="<i8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MergeQuantileSketch":
        import struct

        k, n, eb = struct.unpack_from("<qqq", data, 0)
        (nl,) = struct.unpack_from("<q", data, 24)
        sk = cls(k)
        sk.n, sk.err_budget = n, eb
        sk.levels, sk.coins = [], []
        off = 32
        for _ in range(nl):
            ln, c = struct.unpack_from("<qq", data, off)
            off += 16
            sk.levels.append(
                np.frombuffer(data, dtype="<i8", count=ln, offset=off).astype(
                    np.int64
                )
            )
            sk.coins.append(int(c))
            off += 8 * ln
        if not sk.levels:
            sk.levels, sk.coins = [np.array([], dtype=np.int64)], [0]
        return sk


def events_value_sketch_quantiles(
    sf_dir: str, k: int = 256, percents=(1, 5, 25, 50, 75, 95, 99)
):
    """One-pass sketched quantiles of events.value in integer cents:
    each block folds into ONE serialized sketch row (O(k log n) bytes),
    the bounded partial set merges on a single task, and the estimates
    ship with their self-certified error budget. Returns
    (p, est_cents, n, err_budget) — pytest pins |true_rank(est) −
    target_rank| ≤ err_budget against brute force, plus budget ≪ n."""
    import ray.data as rd

    from open_parse_ray.sources.tables import table_path
    from open_parse_ray.stages.relational import _cents

    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sk = MergeQuantileSketch(k)
        sk.insert(_cents(b["value"].to_numpy()))
        return pd.DataFrame({"sk": [sk.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        acc = MergeQuantileSketch(k)
        for blob in b["sk"]:
            acc.merge(MergeQuantileSketch.from_bytes(blob))
        rows = [(p, acc.quantile(p)) for p in percents]
        return pd.DataFrame(
            {
                "p": np.asarray([r[0] for r in rows], dtype=np.int64),
                "est_cents": np.asarray(
                    [r[1] if r[1] is not None else 0 for r in rows],
                    dtype=np.int64,
                ),
                "n": np.full(len(rows), acc.n, dtype=np.int64),
                "err_budget": np.full(len(rows), acc.err_budget, dtype=np.int64),
            }
        )

    return parts.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
