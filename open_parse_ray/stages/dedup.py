"""Corpus-level deduplication: exact, MinHash+LSH, SimHash, n-gram
Jaccard, char-set Jaccard.

Scale shapes (the part that matters at 100 TB):
- exact: hash in a vectorized map (shrinks the shuffle key from full text
  to 16 bytes) → ``groupby(fp)`` → per-group first. One shuffle, keyed on
  a short uniform hash — no skew.
- MinHash-LSH: per-batch numpy signatures → explode to (band, band_hash,
  doc_id) rows → ``groupby`` on the band key → candidate pairs per bucket
  → signature-estimated Jaccard filter. The only all-to-all is over the
  tiny band table (bands × docs rows of 3 ints), never the texts.
- SimHash: 64-bit signature per doc, 4×16-bit band blocking for
  hamming<=3-style candidates, same explode/groupby shape.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _read_sample_docs(sf_dir: str, sample_mod: int) -> pd.DataFrame:
    """Stream documents.parquet batch-by-batch, keeping only rows with
    doc_id %% sample_mod == 0: driver memory stays proportional to the
    SAMPLE, not the corpus (pyarrow expressions have no modulo, so the
    filter runs per record batch instead of inside the scan)."""
    import pyarrow.dataset as pads

    kept = []
    scanner = pads.dataset(f"{sf_dir}/documents.parquet").scanner(
        columns=["doc_id", "text", "lang"], batch_size=8192
    )
    for rb in scanner.to_batches():
        ids = rb.column("doc_id").to_numpy(zero_copy_only=False)
        mask = ids % sample_mod == 0
        if mask.any():
            kept.append(rb.filter(pa.array(mask)))
    if not kept:
        return pd.DataFrame({"doc_id": [], "text": [], "lang": []})
    return pa.Table.from_batches(kept).to_pandas()



def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


# word → 64-bit md5 cache (vocabulary-bounded; cleared if it ever grows
# past the cap so a pathological corpus can't exhaust worker memory)
_WORD_HASH_CACHE: dict = {}
_WORD_HASH_CACHE_CAP = 1_000_000
_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _hash_words(words) -> np.ndarray:
    cache = _WORD_HASH_CACHE
    get = cache.get
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = get(w)
        if h is None:
            if len(cache) >= _WORD_HASH_CACHE_CAP:
                cache.clear()
            h = _md5_64(w)
            cache[w] = h
        out[i] = h
    return out


def _word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashed k-word shingles (uint64). One md5 per DISTINCT word (cached
    across documents — vocabulary-bounded), then a vectorized wrapping
    polynomial combine over k consecutive word hashes; order-sensitive and
    deterministic, ~100x fewer hash calls than per-shingle md5."""
    words = text.split()
    if len(words) < k:
        return (
            np.array([_md5_64(text)], dtype=np.uint64)
            if words
            else np.array([], dtype=np.uint64)
        )
    wh = _hash_words(words)
    n = len(words) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):  # wrapping uint64 polynomial: acc = acc*MIX + wh[j:j+n]
        acc = acc * _SHINGLE_MIX + wh[j : j + n]
    return acc


class MinHasher:
    """num_perm universal-hash minhash signatures; (a*x+b) mod p family.
    Permutation parameters derive from a fixed seed → deterministic
    everywhere. Built once per actor."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (P, S) matrix of hashed values, min over shingles
        x = shingles.astype(np.object_)  # exact modular arithmetic via python ints
        sig = np.empty(self.num_perm, dtype=np.uint64)
        for p in range(self.num_perm):
            vals = (int(self.a[p]) * x + int(self.b[p])) % _MERSENNE
            sig[p] = np.uint64(min(vals))
        return sig


class FastMinHasher(MinHasher):
    """Vectorized variant using float-safe 32-bit hashing: h = (a*x+b)
    mod p with 31-bit ranges so uint64 arithmetic never overflows."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        p = np.uint64((1 << 31) - 1)
        self.p = p
        self.a = rng.randint(1, int(p), size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, int(p), size=num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = (shingles % self.p)[None, :]  # (1, S) values < 2^31
        h = (self.a[:, None] * x + self.b[:, None]) % self.p  # fits in uint64
        return h.min(axis=1)


def minhash_band_rows(
    batch: pd.DataFrame,
    hasher: FastMinHasher,
    bands: int = 16,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """doc rows → (band_id, band_hash, doc_id) rows (LSH banding)."""
    rows_band, rows_hash, rows_doc = [], [], []
    rpb = hasher.num_perm // bands
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        sig = hasher.signature(_word_shingles(text, shingle_k)).astype(np.uint16)
        for b in range(bands):
            chunk = sig[b * rpb : (b + 1) * rpb]
            bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            rows_band.append(b)
            rows_hash.append(bh)
            rows_doc.append(doc_id)
    return pd.DataFrame(
        {"band_id": rows_band, "band_hash": rows_hash, "doc_id": rows_doc}
    )


def minhash_signatures(batch: pd.DataFrame, hasher: FastMinHasher, shingle_k=3):
    """Signatures stored as uint16 components (256B at 128 perms, not
    1KB): minhash components are only ever compared for EQUALITY, so
    truncating to 16 bits adds a 2^-16 per-component collision — an
    est_jaccard bias of +0.000015 — while cutting every downstream
    shuffle of signatures 4x. At 10^12 docs the LSH band shuffle ships
    sig bytes with every band row; this is the difference between 4 TB
    and 16 TB of exchange per 10^9 docs."""
    sigs = [
        hasher.signature(_word_shingles(t, shingle_k)).astype(np.uint16).tobytes()
        for t in batch["text"]
    ]
    return pd.DataFrame({"doc_id": batch["doc_id"], "sig": sigs})


def estimate_jaccard(sig_a: bytes, sig_b: bytes, dtype=np.uint16) -> float:
    """Fraction of equal signature components. Default dtype matches the
    uint16 storage format emitted by ``minhash_signatures``."""
    a = np.frombuffer(sig_a, dtype=dtype)
    b = np.frombuffer(sig_b, dtype=dtype)
    return float((a == b).mean())


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over word features (multiplicity-weighted).

    Vectorized: md5 once per *unique* word, bit-unpack as a (U, 64)
    matrix, weight rows by word counts — identical result to the
    textbook per-word ±1 accumulation, without the 64-iteration Python
    inner loop (which dominated the stage at scale)."""
    from collections import Counter

    counts = Counter(text.split())
    if not counts:
        return 0
    hs = _hash_words(list(counts))  # cached md5 per distinct word (bit-identical)
    w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    out_bits = np.where(v > 0, np.uint64(1), np.uint64(0))
    return int((out_bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    sh = [simhash64(t) for t in batch["text"]]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "simhash": np.array(sh, dtype=np.uint64).astype(np.int64),  # arrow int64
        }
    )


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(zip(*[a.split()[i:] for i in range(k)])) if len(a.split()) >= k else {a}
    sb = set(zip(*[b.split()[i:] for i in range(k)])) if len(b.split()) >= k else {b}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def char_jaccard(a: str, b: str) -> float:
    """Character-set Jaccard — matches DuckDB's jaccard() exactly."""
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------


def salted_groupby(ds, salt_of, fn, num_parts: int = 32):
    """Shuffle on a LOW-cardinality salt of the real key, then run ``fn``
    vectorized over each whole partition.

    Ray Data's groupby machinery costs ~3ms of Python per group; with
    fine-grained keys (text hashes, LSH buckets, user ids) that dwarfs the
    actual work. Salting the key down to ``num_parts`` partitions keeps
    the co-location guarantee — every row of one real key lands in one
    partition, because the salt is a function of the key — while paying
    the per-group overhead only ``num_parts`` times; inside a partition
    ``fn`` uses pandas groupby (vectorized dispatch, ~µs per group).
    At cluster scale set ``num_parts`` ≈ cores × a small factor so one
    partition fits a worker's heap.

    ``salt_of(batch) -> int Series`` computes the salt per row.
    """

    def add_salt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_part"] = (salt_of(b) % num_parts).astype("int64")
        return b

    salted = ds.map_batches(add_salt, batch_format="pandas", batch_size=8192)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_part"]))

    return salted.groupby("_part").map_groups(run, batch_format="pandas")


def exact_dedup_groups(sf_dir: str):
    """(doc_id = min id per distinct text, n_copies). Shuffles a 16-byte
    fp (never the text), salted to 32 partitions (see salted_groupby)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fp": [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]],
            }
        )

    hashed = ds.map_batches(add_fp, batch_format="pandas", batch_size=8192)

    def groups(part: pd.DataFrame) -> pd.DataFrame:
        out = part.groupby("fp", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return out[["doc_id", "n_copies"]].astype(
            {"doc_id": "int64", "n_copies": "int64"}
        )

    return salted_groupby(
        hashed, lambda b: b["fp"].str[:8].apply(int, base=16), groups
    )


def minhash_neardup_pairs(
    sf_dir: str,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """Candidate pairs from LSH banding, verified by signature-estimated
    Jaccard >= threshold. Returns (doc_a, doc_b, est_jaccard)."""
    import ray.data as rd

    hasher = FastMinHasher(num_perm)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    sigs = ds.map_batches(
        lambda b: minhash_signatures(b, hasher, shingle_k),
        batch_format="pandas",
        batch_size=4096,
    )

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        # bucket = int64 from md5(band_id || band bytes): one integer
        # column replaces (band_id, 16-char hex) and salts vectorized
        rpb = num_perm // bands
        out_h, out_d, out_s = [], [], []
        for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
            arr = np.frombuffer(sig, dtype=np.uint16)
            for b in range(bands):
                chunk = arr[b * rpb : (b + 1) * rpb]
                digest = hashlib.md5(bytes([b]) + chunk.tobytes()).digest()
                out_h.append(int.from_bytes(digest[:8], "little", signed=True))
                out_d.append(doc_id)
                out_s.append(sig)
        return pd.DataFrame(
            {
                "bucket": pd.Series(out_h, dtype="int64"),
                "doc_id": out_d,
                "sig": out_s,
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pandas", batch_size=4096)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "est_jaccard": pd.Series(dtype="float64"),
                }
            )
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        sigs_ = g["sig"].tolist()
        ra, rb, rj = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                ej = estimate_jaccard(sigs_[i], sigs_[j], dtype=np.uint16)
                if ej >= threshold:
                    ra.append(ids[i])
                    rb.append(ids[j])
                    rj.append(ej)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(ra, dtype="int64"),
                "doc_b": pd.Series(rb, dtype="int64"),
                "est_jaccard": pd.Series(rj, dtype="float64"),
            }
        )

    def pairs_in_partition(part: pd.DataFrame) -> pd.DataFrame:
        # all rows of any one bucket are co-located here (salt is a
        # function of the bucket key)
        outs = [
            pairs_in_bucket(g)
            for _, g in part.groupby("bucket", sort=False)
            if len(g) > 1
        ]
        if not outs:
            return pairs_in_bucket(part.iloc[:0])
        return pd.concat(outs, ignore_index=True)

    pairs = salted_groupby(banded, lambda b: b["bucket"], pairs_in_partition)

    # dedupe pairs found in multiple bands (salt on the pair key)
    def uniq_pairs(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(["doc_a", "doc_b"])

    return salted_groupby(
        pairs, lambda b: b["doc_a"] * 1000003 + b["doc_b"], uniq_pairs
    ).select_columns(["doc_a", "doc_b", "est_jaccard"])


def simhash_table(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pandas", batch_size=4096)


def simhash_neardup_pairs(sf_dir: str, max_hamming: int = 3):
    """4×16-bit band blocking: any pair with hamming <= 3 shares at least
    one exact 16-bit band (pigeonhole). Returns (doc_a, doc_b, hamming)."""
    import ray.data as rd

    sh = simhash_table(sf_dir)

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, h in zip(batch["doc_id"], batch["simhash"]):
            h = int(np.uint64(h))
            for b in range(4):
                out.append(
                    {
                        "band_id": b,
                        "band_val": (h >> (16 * b)) & 0xFFFF,
                        "doc_id": doc_id,
                        "simhash": h if h < (1 << 63) else h - (1 << 64),
                    }
                )
        return pd.DataFrame(out)

    banded = sh.map_batches(bands, batch_format="pandas", batch_size=4096)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "hamming": pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        hs = [int(np.uint64(v)) for v in g["simhash"]]
        ra, rb, rh = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming and ids[i] != ids[j]:
                    ra.append(ids[i])
                    rb.append(ids[j])
                    rh.append(d)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(ra, dtype="int64"),
                "doc_b": pd.Series(rb, dtype="int64"),
                "hamming": pd.Series(rh, dtype="int64"),
            }
        )

    def pairs_in_partition(part: pd.DataFrame) -> pd.DataFrame:
        outs = [
            pairs(g)
            for _, g in part.groupby(["band_id", "band_val"], sort=False)
            if len(g) > 1
        ]
        if not outs:
            return pairs(part.iloc[:0])
        return pd.concat(outs, ignore_index=True)

    cand = salted_groupby(
        banded, lambda b: b["band_val"] * 7 + b["band_id"], pairs_in_partition
    )
    return salted_groupby(
        cand, lambda b: b["doc_a"] * 1000003 + b["doc_b"],
        lambda part: part.drop_duplicates(["doc_a", "doc_b"]),
    ).select_columns(["doc_a", "doc_b", "hamming"])


def ngram_jaccard_pairs(
    sf_dir: str, sample_mod: int = 50, threshold: float = 0.2, k: int = 3
):
    """Word k-gram Jaccard near-dup vs a broadcast sample of query docs
    (same no-shuffle design as char_jaccard_pairs). Tokenization is
    SQL-compatible: split trim(text) on runs of whitespace, so the DuckDB
    list-function oracle reproduces it exactly. Returns
    (query_id, doc_id, jac) for same-lang pairs with jac >= threshold."""
    import re as _re

    import ray
    import ray.data as rd

    ws = _re.compile(r"\s+")

    def shingles(text: str):
        words = ws.split(text.strip()) if text.strip() else []
        if len(words) < k:
            return None
        return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    # sample side: stream the scan and keep only sample rows — driver
    # memory is bounded by the sample (n/sample_mod rows), never the corpus
    sample_tbl = _read_sample_docs(sf_dir, sample_mod)
    sample = [
        (int(r.doc_id), r.lang, shingles(r.text))
        for r in sample_tbl.itertuples()
    ]
    sample_ref = ray.put([s for s in sample if s[2] is not None])

    class CompareNgrams:
        def __init__(self, ref):
            self.sample = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            qa, qb, jj = [], [], []
            for doc_id, text, lang in zip(
                batch["doc_id"], batch["text"], batch["lang"]
            ):
                cs = shingles(text)
                if cs is None:
                    continue
                for qid, qlang, qset in self.sample:
                    if qid == doc_id or qlang != lang:
                        continue
                    j = len(qset & cs) / len(qset | cs)
                    if j >= threshold:
                        qa.append(qid)
                        qb.append(int(doc_id))
                        jj.append(j)
            return pd.DataFrame(
                {
                    "query_id": pd.Series(qa, dtype="int64"),
                    "doc_id": pd.Series(qb, dtype="int64"),
                    "jac": pd.Series(jj, dtype="float64"),
                }
            )

    return docs.map_batches(
        CompareNgrams,
        fn_constructor_args=(sample_ref,),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 8),
    )


def char_jaccard_pairs(sf_dir: str, sample_mod: int = 50, threshold: float = 0.5):
    """Broadcast-join near-dup check: a small sample of query docs
    (doc_id % sample_mod == 0) is broadcast via ray.put once; every batch
    compares its rows against the sample without any shuffle. Matches the
    DuckDB jaccard() oracle exactly (char-set Jaccard, same-lang pairs)."""
    import ray
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    # sample side: stream the scan and keep only sample rows — driver
    # memory is bounded by the sample (n/sample_mod rows), never the corpus
    sample_tbl = _read_sample_docs(sf_dir, sample_mod)
    sample_ref = ray.put(
        [(int(r.doc_id), r.text, r.lang, set(r.text)) for r in sample_tbl.itertuples()]
    )

    class CompareToSample:
        def __init__(self, ref):
            self.sample = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            qa, qb, jj = [], [], []
            for doc_id, text, lang in zip(
                batch["doc_id"], batch["text"], batch["lang"]
            ):
                cs = set(text)
                for qid, qtext, qlang, qset in self.sample:
                    if qid == doc_id or qlang != lang:
                        continue
                    j = len(qset & cs) / len(qset | cs)
                    if j >= threshold:
                        qa.append(qid)
                        qb.append(int(doc_id))
                        jj.append(j)
            return pd.DataFrame({"query_id": qa, "doc_id": qb, "jac": jj})

    return docs.map_batches(
        CompareToSample,
        fn_constructor_args=(sample_ref,),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 8),
    )
