"""Charset sniffing + decoding for crawl HTML payloads.

Real Common-Crawl responses arrive as BYTES in a zoo of encodings; the
reference pipeline only ever sees Python strings (open-parse ingests
already-decoded text, text/parse.py:9-23), so at corpus scale the
decode step is ours to own. The detector follows the practical subset
of the WHATWG encoding sniff every production crawler implements:

1. **BOM** — EF BB BF → utf-8-sig, FF FE → utf-16-le, FE FF →
   utf-16-be (checked first; a BOM overrides everything).
2. **meta prescan** — scan the first 1024 bytes (latin-1-decoded, so
   the scan itself never throws) for ``<meta charset=...>`` /
   ``http-equiv Content-Type`` declarations; honor the declared codec
   when Python knows it.
3. **zero-byte heuristic** — BOM-less UTF-16 shows up in real crawls;
   ASCII code units put a 0x00 in the high byte, so a dominant
   one-sided zero pattern (odd positions → LE, even → BE) identifies
   it. Comparative rule (zeros on one side > 4x the other side and >
   5% of bytes) rather than an absolute threshold, so CJK-heavy text
   (whose code units have non-zero high bytes, leaving only
   spaces/ASCII punctuation to vote) still detects.
4. **fallback** — utf-8 with errors='replace' (never throws; real
   crawls contain mojibake and truncated multibyte tails).

Known limitation (documented, not hidden): BOM-less UTF-16 with NO
ASCII bytes at all (no spaces, no newlines) falls through to the
utf-8 fallback — disambiguating that needs the frequency models of a
full chardet, out of scope for a stdlib detector.
"""

import re
from typing import Tuple

_META_RE = re.compile(
    r"""<meta[^>]+?charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""",
    re.IGNORECASE,
)

# declared name → python codec (tiny alias table; unknown names are
# ignored and sniffing continues)
_CODEC_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "utf-16": "utf-16",
    "utf-16-le": "utf-16-le",
    "utf-16le": "utf-16-le",
    "utf-16-be": "utf-16-be",
    "utf-16be": "utf-16-be",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "ascii",
}


def sniff_charset(payload: bytes) -> Tuple[str, str]:
    """Returns (codec, how) — how ∈ {'bom', 'meta', 'heuristic',
    'fallback'}. Never throws."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig", "bom"
    if payload.startswith(b"\xff\xfe"):
        return "utf-16-le", "bom"
    if payload.startswith(b"\xfe\xff"):
        return "utf-16-be", "bom"
    head = payload[:1024].decode("latin-1")
    m = _META_RE.search(head)
    if m:
        codec = _CODEC_ALIASES.get(m.group(1).lower())
        if codec is not None:
            return codec, "meta"
    window = payload[:4096]
    if len(window) >= 4:
        ze = window[0::2].count(0)
        zo = window[1::2].count(0)
        floor = max(1, len(window) // 20)  # one-sided zeros > 5% of bytes
        if zo > 4 * ze and zo >= floor:
            return "utf-16-le", "heuristic"
        if ze > 4 * zo and ze >= floor:
            return "utf-16-be", "heuristic"
    return "utf-8", "fallback"


def decode_html_bytes(payload: bytes) -> Tuple[str, str, str]:
    """Sniff + decode. Returns (text, codec, how). BOMs are consumed by
    the decode (they are framing, not content); a SECOND U+FEFF after a
    BOM is content and survives. The fallback never throws
    (errors='replace')."""
    codec, how = sniff_charset(payload)
    if how == "bom":
        if codec == "utf-8-sig":
            return payload.decode("utf-8-sig", errors="replace"), codec, how
        # utf-16 codec consumes exactly one leading BOM
        text = payload[2:].decode(codec, errors="replace")
        return text, codec, how
    if how == "fallback":
        return payload.decode("utf-8", errors="replace"), codec, how
    return payload.decode(codec, errors="replace"), codec, how


_META_PREFIX = '<meta charset="UTF-8">'


def synth_encoded(text: str, doc_id: int) -> bytes:
    """Deterministic closed-form payload builder for the SQL oracle
    (the synth_messy_url / synth_denormalized pattern): variant =
    doc_id % 6 picks the encoding shape, and the oracle reproduces the
    expected decode in SQL (md5 of text, or of the meta-prefixed text
    for variant 4 — the prefix is CONTENT and survives the decode)."""
    v = doc_id % 6
    if v == 0:
        return text.encode("utf-8")
    if v == 1:
        return b"\xef\xbb\xbf" + text.encode("utf-8")
    if v == 2:
        return b"\xff\xfe" + text.encode("utf-16-le")
    if v == 3:
        return b"\xfe\xff" + text.encode("utf-16-be")
    if v == 4:
        return (_META_PREFIX + text).encode("utf-8")
    return text.encode("utf-16-le")  # v == 5: BOM-less — heuristic path
