"""WARC / WET container source + sink (ISO 28500, the Common Crawl
wire format — the container a real web-scale extraction job actually
reads; reference analog: the file-ingest seam of ``Pdf.__init__`` /
``text.ingest``, src/openparse/pdf.py:89-106, which this generalizes to
the archive container the north-star corpus ships in).

Format notes (public spec + Common Crawl conventions):

- A ``.warc.gz`` is a CONCATENATION OF GZIP MEMBERS, one WARC record
  per member — that is what makes the format splittable at record
  granularity without an index; this writer follows it and the reader's
  member loop strictly advances or raises (fuzz-gated, like every
  binary parser in this repo).
- Records are framed by an exact ``Content-Length`` header — the body
  is NEVER delimited by scanning for a separator (payload bytes may
  contain anything), mirroring the /Length discipline in functions/pdf.
- ``response`` records carry an HTTP/1.1 response (status line +
  headers + raw html bytes); ``conversion`` records (WET) carry the
  extracted plain text; a leading ``warcinfo`` record describes the
  shard. ``WARC-Identified-Content-Language`` is the real CC field for
  the lang column.
- Record IDs must be unique but nothing requires randomness:
  they are md5-derived from (url, timestamp) — deterministic, so
  export shards are byte-identical run-to-run (repo invariant).

Scale shape: the export is a per-block ``map_batches`` task writing one
shard per input block (deterministic content-addressed names → rerun
overwrites, never duplicates — resumable like state/lineage sinks); the
read is ``read_binary_files`` → a stateless parse stage, so WARC shards
stream through the same downstream plan as Parquet with no extra
exchange. Timestamps round-trip losslessly (WARC-Date written with
microsecond precision; bare-seconds dates from third-party archives
parse too).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import os
import struct
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

import pyarrow as pa

_CRLF = b"\r\n"
_SOFTWARE = b"open-parse-ray-warc/1.0"


# ---------------------------------------------------------------------------
# record build / parse (pure bytes, no Ray)
# ---------------------------------------------------------------------------


def _warc_date(ts_us: int) -> bytes:
    dt = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(ts_us))
    return (
        f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}T"
        f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}.{dt.microsecond:06d}Z"
    ).encode("ascii")


def _parse_warc_date(s: str) -> int:
    """WARC-Date → epoch microseconds. Accepts both the microsecond form
    this writer emits and the bare-seconds form Common Crawl uses."""
    s = s.strip()
    if not s.endswith("Z"):
        raise ValueError(f"non-UTC WARC-Date: {s!r}")
    body = s[:-1]
    frac_us = 0
    if "." in body:
        body, frac = body.split(".", 1)
        if not frac.isdigit():
            raise ValueError(f"bad WARC-Date fraction: {s!r}")
        frac_us = int(frac.ljust(6, "0")[:6])
    dt = _dt.datetime.strptime(body, "%Y-%m-%dT%H:%M:%S")
    return int((dt - _dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000 + frac_us


def _check_uri(url: str) -> str:
    """WARC-Target-URI is a URI: whitespace or control characters in a
    header VALUE would corrupt record framing (header injection), so
    the writer rejects them outright — a crawl URL containing a literal
    space is already invalid and must be percent-encoded upstream."""
    if any(ord(c) <= 0x20 or ord(c) == 0x7F for c in url):
        raise ValueError(f"URI contains whitespace/control bytes: {url!r}")
    return url


def _record_id(url: str, ts_us: int) -> bytes:
    h = hashlib.md5(f"{url}\x00{ts_us}".encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    ).encode("ascii")


def _record(warc_type: bytes, headers: List[Tuple[bytes, bytes]], body: bytes) -> bytes:
    out = [b"WARC/1.0" + _CRLF, b"WARC-Type: " + warc_type + _CRLF]
    for k, v in headers:
        out.append(k + b": " + v + _CRLF)
    out.append(b"Content-Length: " + str(len(body)).encode("ascii") + _CRLF)
    out.append(_CRLF)
    out.append(body)
    out.append(_CRLF + _CRLF)  # spec: two CRLFs terminate the record
    return b"".join(out)


def warcinfo_record(filename: str) -> bytes:
    body = b"software: " + _SOFTWARE + _CRLF + b"format: WARC File Format 1.0" + _CRLF
    return _record(
        b"warcinfo",
        [
            (b"WARC-Record-ID", _record_id("warcinfo:" + filename, 0)),
            (b"WARC-Date", _warc_date(0)),
            (b"WARC-Filename", filename.encode("utf-8")),
            (b"Content-Type", b"application/warc-fields"),
        ],
        body,
    )


def response_record(url: str, ts_us: int, html: bytes, lang: Optional[str]) -> bytes:
    _check_uri(url)
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=UTF-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode("ascii") + _CRLF
        + _CRLF
        + html
    )
    headers = [
        (b"WARC-Record-ID", _record_id(url, ts_us)),
        (b"WARC-Date", _warc_date(ts_us)),
        (b"WARC-Target-URI", url.encode("utf-8")),
        (b"Content-Type", b"application/http; msgtype=response"),
    ]
    if lang is not None:
        headers.append(
            (b"WARC-Identified-Content-Language", lang.encode("ascii"))
        )
    return _record(b"response", headers, http)


def _url_host_path(url: str) -> Tuple[str, str]:
    """(host, absolute path) for the HTTP request line/Host header."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    return parts.netloc, path


def request_record(url: str, ts_us: int) -> bytes:
    """``WARC-Type: request`` twin of :func:`response_record` — the
    record type real Common Crawl WARCs interleave with responses. The
    body is an HTTP/1.1 request block (request line + Host), framed by
    the record Content-Length exactly like the response; the
    WARC-Concurrent-To header carries the paired response's record id
    (CC convention for request/response linkage)."""
    _check_uri(url)
    host, path = _url_host_path(url)
    http = (
        b"GET " + path.encode("utf-8") + b" HTTP/1.1" + _CRLF
        + b"Host: " + host.encode("utf-8") + _CRLF
        + b"User-Agent: " + _SOFTWARE + _CRLF
        + b"Accept: text/html" + _CRLF
        + _CRLF
    )
    headers = [
        (b"WARC-Record-ID", _record_id("request:" + url, ts_us)),
        (b"WARC-Date", _warc_date(ts_us)),
        (b"WARC-Target-URI", url.encode("utf-8")),
        (b"WARC-Concurrent-To", _record_id(url, ts_us)),
        (b"Content-Type", b"application/http; msgtype=request"),
    ]
    return _record(b"request", headers, http)


def conversion_record(url: str, ts_us: int, text: str, lang: Optional[str]) -> bytes:
    _check_uri(url)
    headers = [
        (b"WARC-Record-ID", _record_id("conversion:" + url, ts_us)),
        (b"WARC-Date", _warc_date(ts_us)),
        (b"WARC-Target-URI", url.encode("utf-8")),
        (b"WARC-Refers-To", _record_id(url, ts_us)),
        (b"Content-Type", b"text/plain"),
    ]
    if lang is not None:
        headers.append(
            (b"WARC-Identified-Content-Language", lang.encode("ascii"))
        )
    return _record(b"conversion", headers, text.encode("utf-8"))


def _gzip_member(record: bytes) -> bytes:
    """One gzip member per record (mtime pinned to 0 — byte-determinism;
    ``gzip.compress`` would stamp wall-clock time into the header)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    # wbits=31 emits a gzip header with MTIME=0 already (zlib's gzip
    # header writer leaves mtime zero unless told otherwise)
    return co.compress(record) + co.flush()


def gunzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a concatenated-members file; plain
    (uncompressed) input yields itself. Strictly advances or raises."""
    if not data[:2] == b"\x1f\x8b":
        yield data
        return
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(31)
        out = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member")
        yield out
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member scan failed to advance")
        pos += consumed
        # tolerate zero-byte padding between members (some writers pad)
        while pos < n and data[pos] == 0:
            pos += 1


def iter_warc_records(buf: bytes) -> Iterator[Tuple[Dict[str, str], bytes]]:
    """(headers, body) per record over a plaintext WARC buffer.
    Header keys are lower-cased. Content-Length framing only; the scan
    strictly advances or raises."""
    pos = 0
    n = len(buf)
    while pos < n:
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version at offset {pos}")
        hdr_end = buf.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        head = buf[pos:hdr_end].decode("utf-8", "replace")
        headers: Dict[str, str] = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if not _ or not k.strip():
                raise ValueError(f"malformed WARC header line: {line!r}")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length")
        if clen < 0:
            raise ValueError("negative Content-Length")
        body_start = hdr_end + 4
        body = buf[body_start : body_start + clen]
        if len(body) != clen:
            raise ValueError("truncated WARC record body")
        new_pos = body_start + clen
        if new_pos <= pos:
            raise ValueError("WARC record scan failed to advance")
        pos = new_pos
        yield headers, body


def dechunk_http(payload: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer coding (hex size line, chunk,
    CRLF, ... zero-size terminator; chunk extensions after ';' and any
    trailer headers are ignored). Third-party crawl WARCs store the raw
    wire bytes, chunked framing included. Strictly advances or raises
    (fuzz-gated like every binary parser in this repo)."""
    out: List[bytes] = []
    pos = 0
    while True:
        eol = payload.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("chunked: missing size line")
        tok = payload[pos:eol].split(b";", 1)[0].strip()
        if not tok or any(c not in b"0123456789abcdefABCDEF" for c in tok):
            raise ValueError(f"chunked: bad size token {tok!r}")
        size = int(tok, 16)
        pos = eol + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) are ignored
        chunk = payload[pos : pos + size]
        if len(chunk) != size:
            raise ValueError("chunked: truncated chunk")
        out.append(chunk)
        pos += size
        if payload[pos : pos + 2] != _CRLF:
            raise ValueError("chunked: missing chunk terminator")
        pos += 2


def parse_http_response(body: bytes) -> bytes:
    """Payload bytes of an HTTP response block. Framing precedence per
    RFC 7230 §3.3.3 (what real Common Crawl responses need): chunked
    Transfer-Encoding is decoded first; else Content-Length slices; else
    everything past the header block. Header names match
    case-insensitively; the status code is not interpreted (a 404 body
    is still the payload — callers filter)."""
    sep = body.find(_CRLF + _CRLF)
    if sep < 0 or not body.startswith(b"HTTP/"):
        raise ValueError("malformed HTTP response block")
    head = body[:sep].decode("latin-1")
    payload = body[sep + 4 :]
    clen: Optional[int] = None
    chunked = False
    for line in head.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        key = k.strip().lower()
        if key == "transfer-encoding" and "chunked" in v.strip().lower():
            chunked = True
        elif key == "content-length" and v.strip().isdigit():
            clen = int(v.strip())
    if chunked:
        return dechunk_http(payload)
    if clen is not None:
        if clen > len(payload):
            raise ValueError("truncated HTTP payload")
        return payload[:clen]
    return payload


def pages_from_warc_bytes(data: bytes) -> List[dict]:
    """One .warc(.gz) shard → page dicts. ``response`` records yield
    (url, warc_ts_us, html, lang); ``conversion`` (WET) records yield
    (url, warc_ts_us, text, lang); warcinfo/request/metadata skip."""
    rows: List[dict] = []
    plain = b"".join(gunzip_members(data))
    for headers, body in iter_warc_records(plain):
        wtype = headers.get("warc-type", "")
        if wtype not in ("response", "conversion"):
            continue
        url = headers.get("warc-target-uri", "")
        ts_us = _parse_warc_date(headers.get("warc-date", "1970-01-01T00:00:00Z"))
        lang = headers.get("warc-identified-content-language")
        if wtype == "response":
            rows.append(
                {"url": url, "warc_ts_us": ts_us,
                 "html": parse_http_response(body), "lang": lang}
            )
        else:
            rows.append(
                {"url": url, "warc_ts_us": ts_us,
                 "text": body.decode("utf-8"), "lang": lang}
            )
    return rows


# ---------------------------------------------------------------------------
# Ray source / sink
# ---------------------------------------------------------------------------


def export_pages_warc(
    sf_or_dir, out_dir: str, wet: bool = False, gz: bool = True,
    requests: bool = False,
) -> str:
    """Write the pages corpus as WARC (or WET) shards, one shard per
    input block, written BY THE TASK that holds the block (no driver
    funnel). Shard names are content-addressed (md5 of the first url +
    row count) → deterministic, rerun-idempotent. ``requests=True``
    interleaves a ``request`` record before each response (the full
    Common Crawl WARC shape; readers skip them, so extracted pages are
    byte-identical either way). Returns out_dir."""
    from open_parse_ray.sources.pages import read_pages

    os.makedirs(out_dir, exist_ok=True)
    ext = (".warc.wet" if wet else ".warc") + (".gz" if gz else "")

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        urls = t["url"].to_pylist()
        tss = [int(v.value) for v in t["warc_ts"]]  # timestamp[us] → us
        langs = t["lang"].to_pylist()
        name = hashlib.md5(
            f"{urls[0]}\x00{t.num_rows}".encode("utf-8")
        ).hexdigest()[:16]
        fname = f"shard-{name}{ext}"
        records = [warcinfo_record(fname)]
        if wet:
            texts = t["text"].to_pylist()
            for u, ts, x, lg in zip(urls, tss, texts, langs):
                records.append(conversion_record(u, ts, x, lg))
        else:
            htmls = t["html"].to_pylist()
            for u, ts, h, lg in zip(urls, tss, htmls, langs):
                if requests:
                    records.append(request_record(u, ts))
                records.append(response_record(u, ts, h, lg))
        blob = (
            b"".join(_gzip_member(r) for r in records)
            if gz
            else b"".join(records)
        )
        path = os.path.join(out_dir, fname)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic → safe under resume/retry
        return pa.table(
            {"path": pa.array([path]), "n_records": pa.array([t.num_rows], pa.int64())}
        )

    cols = ["url", "warc_ts", "text", "lang"] if wet else ["url", "warc_ts", "html", "lang"]
    manifest = (
        read_pages(sf_or_dir, columns=cols)
        .map_batches(write_shard, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    assert manifest["n_records"].sum() > 0
    return out_dir


def read_pages_warc(path: str, columns=None):
    """Pages Dataset from WARC shards: read_binary_files → stateless
    parse stage → the SAME logical schema as the Parquet reader (url,
    warc_ts, html, text, lang), so every downstream stage is
    container-agnostic. ``text`` is recomputed from html with the same
    kernel that derived the Parquet column (visible_text) → the two
    sources are byte-identical. WET shards yield text without html."""
    import pyarrow.compute as pc
    import ray.data as rd

    from open_parse_ray.functions.html import visible_text

    def parse_shard(t: pa.Table) -> pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for blob in t["bytes"].to_pylist():
            for row in pages_from_warc_bytes(blob):
                urls.append(row["url"])
                tss.append(row["warc_ts_us"])
                langs.append(row.get("lang"))
                if "html" in row:
                    htmls.append(row["html"])
                    texts.append(visible_text(row["html"].decode("utf-8")))
                else:
                    htmls.append(None)
                    texts.append(row["text"])
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
    # sort by url inside each shard-batch is unnecessary: record order
    # within a shard IS the corpus order the exporter wrote
    return ds.select_columns(columns) if columns else ds
