"""JSONL pages connector — the third container for the SAME logical
pages schema (Parquet: sources/pages.py; WARC/WET: sources/warc.py).

Line format (one JSON object per page):
    {"url": str, "warc_ts_us": int, "html_b64": str, "lang": str}

html travels base64 (JSON cannot carry bytes); `text` is NOT stored —
the reader recomputes it with the same visible_text kernel that derived
the Parquet column, which is exactly how the WARC reader guarantees
byte-identity across containers (tests pin all three equal).

Export mirrors export_pages_warc's determinism contract: one shard per
input block written BY THE TASK that holds it (no driver funnel),
content-addressed shard names (md5 of first url + row count), atomic
os.replace. Optional gzip (.jsonl.gz), one gzip stream per shard.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import json
import os
from typing import List

import pyarrow as pa


def export_pages_jsonl(sf_or_dir, out_dir: str, gz: bool = True) -> str:
    """Write the pages corpus as JSONL shards. Returns out_dir."""
    from open_parse_ray.sources.pages import read_pages

    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl" + (".gz" if gz else "")

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "n_records": pa.array([], pa.int64())}
            )
        urls = t["url"].to_pylist()
        tss = [int(v.value) for v in t["warc_ts"]]
        htmls = t["html"].to_pylist()
        langs = t["lang"].to_pylist()
        lines = []
        for u, ts, h, lg in zip(urls, tss, htmls, langs):
            lines.append(
                json.dumps(
                    {
                        "url": u,
                        "warc_ts_us": ts,
                        "html_b64": base64.b64encode(h).decode("ascii"),
                        "lang": lg,
                    },
                    separators=(",", ":"),
                    sort_keys=True,
                )
            )
        blob = ("\n".join(lines) + "\n").encode("utf-8")
        if gz:
            # mtime=0 → deterministic bytes (the no-wall-clock rule)
            blob = gzip.compress(blob, mtime=0)
        name = hashlib.md5(
            f"{urls[0]}\x00{t.num_rows}".encode("utf-8")
        ).hexdigest()[:16]
        path = os.path.join(out_dir, f"shard-{name}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]),
             "n_records": pa.array([t.num_rows], pa.int64())}
        )

    manifest = (
        read_pages(sf_or_dir, columns=["url", "warc_ts", "html", "lang"])
        .map_batches(write_shard, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    assert manifest["n_records"].sum() > 0
    return out_dir


def pages_from_jsonl_bytes(data: bytes) -> List[dict]:
    """One .jsonl(.gz) shard → page dicts (url, warc_ts_us, html, lang).
    A malformed LINE raises (the shard is the error-isolation unit; the
    extraction kernels downstream count per-page errors)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: List[dict] = []
    for line in data.split(b"\n"):
        if not line.strip():
            continue
        obj = json.loads(line)
        rows.append(
            {
                "url": obj["url"],
                "warc_ts_us": int(obj["warc_ts_us"]),
                "html": base64.b64decode(obj["html_b64"]),
                "lang": obj.get("lang"),
            }
        )
    return rows


def read_pages_jsonl(path: str, columns=None):
    """Pages Dataset from JSONL shards — same logical schema as the
    Parquet and WARC readers (url, warc_ts, html, text, lang); text is
    recomputed from html with the shared visible_text kernel, so all
    three containers are byte-identical (gated)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from open_parse_ray.functions.html import visible_text

    def parse_shard(t: pa.Table) -> pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for blob in t["bytes"].to_pylist():
            for row in pages_from_jsonl_bytes(blob):
                urls.append(row["url"])
                tss.append(row["warc_ts_us"])
                htmls.append(row["html"])
                texts.append(visible_text(row["html"].decode("utf-8")))
                langs.append(row.get("lang"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pc.cast(pa.array(tss, pa.int64()), pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    ds = rd.read_binary_files(path).map_batches(
        parse_shard, batch_format="pyarrow", batch_size=None
    )
    return ds.select_columns(columns) if columns else ds
