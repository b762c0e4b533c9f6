"""CSV pages connector — the fourth container for the SAME logical
pages schema (Parquet: sources/pages.py; WARC/WET: sources/warc.py;
JSONL: sources/jsonl.py).

Wire format: RFC 4180. Header row `url,warc_ts_us,html_b64,lang`;
fields containing the delimiter, a double quote, CR or LF are quoted,
with `"` escaped as `""`. html travels base64 (CSV is a text format);
`text` is NOT stored — the reader recomputes it with the shared
visible_text kernel, the same cross-container byte-identity argument
the WARC and JSONL readers use (all four containers are gated equal).

The reader is a REAL RFC 4180 state machine (quoted fields may contain
embedded delimiters, quotes and newlines — line-splitting parsers are
wrong), strictly advancing per the fuzz-every-parser-loop rule:
an unterminated quote or a quote in the middle of an unquoted field
RAISES (the shard is the error-isolation unit). Accepts LF, CRLF and
lone-CR record ends.

Export mirrors the JSONL determinism contract: one shard per input
block written by the task that holds it, content-addressed shard names
(md5 of first url + row count), atomic os.replace, gzip mtime=0.

Relation to sources/pages.read_pages_csv: that reader ingests ad-hoc
Arrow-CSV drops (stored text column, pyarrow.csv parser) for format-
invariance tests; THIS module is the byte-identity container (own
RFC 4180 state machine, recomputed text, gzip shards, run_job
auto-detection) that joins parquet/warc/jsonl in the all-containers-
equal gate.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import os
from typing import List

import pyarrow as pa

_HEADER = ["url", "warc_ts_us", "html_b64", "lang"]


def _csv_field(s: str, delimiter: str = ",") -> str:
    if (
        delimiter in s
        or '"' in s
        or "\n" in s
        or "\r" in s
    ):
        return '"' + s.replace('"', '""') + '"'
    return s


def parse_csv(data: str, delimiter: str = ",") -> List[List[str]]:
    """RFC 4180 parse → list of records (lists of field strings).
    Blank records (empty lines) are skipped. Malformed input raises."""
    # fast path: no quotes anywhere → plain line/field splits
    if '"' not in data:
        rows = []
        for line in data.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
            if line:
                rows.append(line.split(delimiter))
        return rows
    rows: List[List[str]] = []
    row: List[str] = []
    field: List[str] = []
    started = False  # current record has consumed any char / delimiter
    i, n = 0, len(data)
    in_quotes = False
    while i < n:
        c = data[i]
        if in_quotes:
            if c == '"':
                if i + 1 < n and data[i + 1] == '"':
                    field.append('"')
                    i += 2
                    continue
                in_quotes = False
                i += 1
                if i < n and data[i] not in (delimiter, "\n", "\r"):
                    raise ValueError(
                        f"char after closing quote at offset {i}"
                    )
                continue
            field.append(c)
            i += 1
        elif c == '"':
            if field:
                raise ValueError(f"quote inside unquoted field at offset {i}")
            in_quotes = True
            started = True
            i += 1
        elif c == delimiter:
            row.append("".join(field))
            field = []
            started = True
            i += 1
        elif c in ("\n", "\r"):
            if c == "\r" and i + 1 < n and data[i + 1] == "\n":
                i += 2
            else:
                i += 1
            if started or field:
                row.append("".join(field))
                rows.append(row)
            row, field, started = [], [], False
        else:
            field.append(c)
            started = True
            i += 1
    if in_quotes:
        raise ValueError("unterminated quoted field at end of data")
    if started or field:
        row.append("".join(field))
        rows.append(row)
    return rows


def _render_csv(records: List[List[str]], delimiter: str = ",") -> str:
    return (
        "\n".join(
            delimiter.join(_csv_field(f, delimiter) for f in rec)
            for rec in records
        )
        + "\n"
    )


def _encode_lang(lg, url: str) -> str:
    """null lang → empty field. An empty-STRING lang would silently
    round-trip to null (the reader maps '' → None), so reject it loudly
    — the pages schema never emits '' and the container cannot encode
    the distinction."""
    if lg == "":
        raise ValueError(
            f"empty-string lang for {url!r}: not representable in the "
            "CSV container (use null)"
        )
    return lg or ""


def export_pages_csv(sf_or_dir, out_dir: str, gz: bool = True) -> str:
    """Write the pages corpus as RFC 4180 CSV shards. Returns out_dir."""
    from open_parse_ray.sources.pages import read_pages

    os.makedirs(out_dir, exist_ok=True)
    ext = ".csv" + (".gz" if gz else "")

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
        recs = [list(_HEADER)]
        for u, ts, h, lg in zip(urls, tss, htmls, langs):
            recs.append(
                [u, str(ts), base64.b64encode(h).decode("ascii"),
                 _encode_lang(lg, u)]
            )
        blob = _render_csv(recs).encode("utf-8")
        if gz:
            blob = gzip.compress(blob, mtime=0)  # deterministic bytes
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


def pages_from_csv_bytes(data: bytes) -> List[dict]:
    """One .csv(.gz) shard → page dicts (url, warc_ts_us, html, lang).
    The header row names the columns (order-independent); a missing
    header column or a record whose field count differs from the
    header (short OR long) raises."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    recs = parse_csv(data.decode("utf-8"))
    if not recs:
        return []
    header = recs[0]
    idx = {name: header.index(name) for name in _HEADER}
    rows: List[dict] = []
    for rec in recs[1:]:
        if len(rec) != len(header):
            # both directions: a LONG record means an unescaped
            # delimiter upstream shifted fields — malformed even when
            # the four named columns still parse
            raise ValueError(f"record/header field-count mismatch: {rec!r}")
        rows.append(
            {
                "url": rec[idx["url"]],
                "warc_ts_us": int(rec[idx["warc_ts_us"]]),
                "html": base64.b64decode(rec[idx["html_b64"]]),
                "lang": rec[idx["lang"]] or None,
            }
        )
    return rows


def read_pages_csv(path, columns=None):
    """Pages Dataset from CSV shards — same logical schema as the
    Parquet/WARC/JSONL readers (url, warc_ts, html, text, lang); text
    recomputed from html via the shared visible_text kernel so all four
    containers are byte-identical (gated)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from open_parse_ray.functions.html import visible_text

    def parse_shard(t: pa.Table) -> pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for blob in t["bytes"].to_pylist():
            for row in pages_from_csv_bytes(blob):
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
