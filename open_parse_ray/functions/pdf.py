"""Minimal real PDF text path — stdlib only (zlib), no pdfminer/pypdf.

The reference's core payload is PDF: pdfminer's LTChar stream feeds
CharElement → span grouping → TextElement (reference:
src/openparse/text/pdfminer/core.py:43-157, src/openparse/pdf.py:89-116).
Those libraries are absent from this environment, so this module
implements the minimal slice of ISO 32000 needed to round-trip text:

- a WRITER (:func:`typeset_pdf`) that typesets text into a structurally
  valid PDF — FlateDecode content streams, Type1 standard fonts, a real
  xref table — deliberately exercising the full text-operator set
  (``Tf Td TD TL Tm T* Tj TJ '``);
- a READER (:func:`parse_pdf`) that walks the object graph
  (trailer → Catalog → Pages → Page → Contents/Resources), inflates
  FlateDecode streams, interprets the content-stream text operators, and
  emits (char, fontname, size) triples into the SAME span-grouping
  kernel the HTML path uses (functions/spans.py), producing the same
  TextElement IR (reference: core.py:209-273 ``ingest``).

Deliberate simplifications (documented, deterministic):
- glyph advance = 0.5 × fontsize per char (the engine's synthetic
  metric, see functions/html.py::_char_width) instead of AFM widths —
  bboxes are consistent between writer and reader;
- strings are Latin-1 (the test corpus is pure ASCII); non-encodable
  chars are written as ``?``. CID/ToUnicode fonts are out of scope;
- line → element grouping uses baseline-gap + size-change rules rather
  than pdfminer's full layout analysis (reference behavior for the
  simple flowed layouts this writer produces is identical).

The end-to-end gate is exact: parse(typeset(text)) reassembles to the
whitespace-normalized input, verified by a DuckDB SQL oracle over the
whole corpus (pdf_extract_text) and by adversarial pytest roundtrips
(escapes, multi-page, styles, TJ kerning).
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

from open_parse_ray import consts
from open_parse_ray.functions.spans import extract_chars, create_line_element
from open_parse_ray.model import Bbox, TextElement

BODY_SIZE = 12.0
TITLE_SIZE = 18.0
_LEADING = 1.2  # line leading factor (baseline-to-baseline = size * 1.2)
_MAX_WIDTH = consts.PAGE_WIDTH - 2 * consts.PAGE_MARGIN_X


def _char_width(size: float) -> float:
    """Deterministic glyph advance (matches functions/html.py:359)."""
    return 0.5 * size


def _wrap_words(words: List[str], size: float) -> List[str]:
    """Greedy word wrap at the synthetic char width; single spaces."""
    lines: List[str] = []
    cur: List[str] = []
    cur_w = 0.0
    cw = _char_width(size)
    for w in words:
        ww = len(w) * cw
        add = ww if not cur else ww + cw  # +1 space
        if cur and cur_w + add > _MAX_WIDTH:
            lines.append(" ".join(cur))
            cur, cur_w = [w], ww
        else:
            cur.append(w)
            cur_w += add
    if cur:
        lines.append(" ".join(cur))
    return lines


_ESC = {ord("\\"): b"\\\\", ord("("): b"\\(", ord(")"): b"\\)"}


def _pdf_string(s: str) -> bytes:
    """Latin-1 literal string with (, ), \\ escaped; CR/LF as octal so a
    line break can never be mistaken for content-stream structure."""
    raw = s.encode("latin-1", errors="replace")
    out = bytearray(b"(")
    for b in raw:
        e = _ESC.get(b)
        if e is not None:
            out += e
        elif 32 <= b <= 126 or b >= 128:
            out.append(b)
        else:
            out += b"\\%03o" % b
    out += b")"
    return bytes(out)


def typeset_pdf(
    text: str,
    title: Optional[str] = None,
    images: Optional[list] = None,
) -> bytes:
    """Typeset ``text`` (one flowed paragraph per ``\\n\\n`` block, plus an
    optional bold title) into a valid multi-page PDF.

    The content streams rotate through the text-positioning operators
    (``Tm`` to open a block, then ``T*``, ``Td``, ``'``, and every 5th
    line a kerned ``TJ``) so the reader's interpreter is exercised by
    every document, not just by dedicated tests.

    ``images`` (optional list of (H, W, 3) uint8 arrays) are embedded as
    FlateDecode /DeviceRGB Image XObjects, each on its own trailing page
    (reference image payloads: text/pdfminer/core.py:160-206)."""
    pages: List[List[bytes]] = []  # per page: list of content-stream chunks
    leading = BODY_SIZE * _LEADING

    # layout state
    y = consts.PAGE_TOP_Y
    ops: List[bytes] = []
    in_bt = False
    line_no = 0

    def close_bt():
        nonlocal in_bt
        if in_bt:
            ops.append(b"ET")
            in_bt = False

    def new_page():
        nonlocal y, ops
        close_bt()
        if ops:
            pages.append(ops)
        ops = []
        y = consts.PAGE_TOP_Y

    def emit_line(s: str, font: bytes, size: float):
        """One text line at baseline ``y`` via a rotating operator mix."""
        nonlocal y, in_bt, line_no
        if y < consts.PAGE_BOTTOM_Y:
            new_page()
        if not in_bt:
            ops.append(b"BT")
            ops.append(b"/%s %s Tf" % (font, _num(size)))
            ops.append(b"%s TL" % _num(size * _LEADING))
            ops.append(
                b"1 0 0 1 %s %s Tm" % (_num(consts.PAGE_MARGIN_X), _num(y))
            )
            in_bt = True
            mode = 0  # first line of a block: plain Tj at the Tm position
        else:
            mode = 1 + (line_no % 3)
        if mode == 0:
            pass
        elif mode == 1:
            ops.append(b"T*")  # next line by leading
        elif mode == 2:
            ops.append(b"0 %s Td" % _num(-size * _LEADING))
        # mode 3 uses the ' operator (T* + show) below
        lit = _pdf_string(s)
        if mode == 3:
            ops.append(lit + b" '")
        elif line_no % 5 == 4 and len(s) > 4:
            # kerned TJ: split the string, zero adjustment between parts
            a, b = s[: len(s) // 2], s[len(s) // 2 :]
            ops.append(b"[" + _pdf_string(a) + b" 0 " + _pdf_string(b) + b"] TJ")
        else:
            ops.append(lit + b" Tj")
        y -= size * _LEADING
        line_no += 1

    if title:
        for ln in _wrap_words(title.split(), TITLE_SIZE):
            emit_line(ln, b"F2", TITLE_SIZE)
        close_bt()
        y -= TITLE_SIZE * _LEADING * 0.5  # title/body gap

    paras = [p for p in re.split(r"\n\s*\n", text) if p.split()]
    for pi, para in enumerate(paras):
        if pi:
            y -= leading  # paragraph gap: one blank line
            close_bt()
        for ln in _wrap_words(para.split(), BODY_SIZE):
            emit_line(ln, b"F1", BODY_SIZE)
    close_bt()
    if ops or not pages:
        pages.append(ops)

    return _assemble_pdf([b"\n".join(p) for p in pages], images or [])


def _num(x: float) -> bytes:
    """Compact PDF number: int when integral, else shortest float repr."""
    if x == int(x):
        return b"%d" % int(x)
    return repr(round(x, 4)).encode("ascii")


def _assemble_pdf(page_streams: List[bytes], images: List) -> bytes:
    """Writer entry: text pages first, one trailing page per image —
    the layout this engine's writer always emits. Order-preserving
    callers (``Pdf.extract_pages``) use ``_assemble_pdf_pages``."""
    return _assemble_pdf_pages(
        [(s, None) for s in page_streams] + [(None, img) for img in images]
    )


class JpegImage:
    """Marks a raster for DCTDecode (baseline JPEG) embedding in
    ``_assemble_pdf_pages`` instead of the default FlateDecode."""

    __slots__ = ("raster", "quality")

    def __init__(self, raster, quality: int = 95):
        self.raster = raster
        self.quality = quality

    @property
    def shape(self):
        return self.raster.shape


def _assemble_pdf_pages(pages: List[Tuple[Optional[bytes], object]]) -> bytes:
    """Object graph + xref around an ORDERED list of page payloads
    ``(content_stream | None, raster | None)`` — a raster payload
    becomes an image page (XObject + `cm /Im0 Do` placement) in place,
    so interleaved text/image documents keep their page order.

    Layout: 1 Catalog, 2 Pages, 3 /F1 Helvetica, 4 /F2 Helvetica-Bold,
    then per page i: (5+2i) Page, (6+2i) FlateDecode content stream;
    Image XObjects follow, numbered in page order."""
    n_pages = len(pages)
    objs: Dict[int, bytes] = {}
    kids = b" ".join(b"%d 0 R" % (5 + 2 * i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Name /F1 >>"
    objs[4] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold /Name /F2 >>"
    )
    img_base = 5 + 2 * n_pages
    img_idx = 0
    for i, (stream, img) in enumerate(pages):
        page_num, content_num = 5 + 2 * i, 6 + 2 * i
        xobj = b""
        if img is not None:  # an image page: register its XObject resource
            as_jpeg = isinstance(img, JpegImage)
            raster = img.raster if as_jpeg else img
            h, w = raster.shape[:2]
            x, y = consts.PAGE_MARGIN_X, consts.PAGE_TOP_Y - h
            stream = b"q %s 0 0 %s %s %s cm /Im0 Do Q" % (
                _num(w),
                _num(h),
                _num(x),
                _num(y),
            )
            xobj = b"/XObject << /Im0 %d 0 R >> " % (img_base + img_idx)
            cspace = b"/DeviceGray" if raster.ndim == 2 else b"/DeviceRGB"
            if as_jpeg:  # DCTDecode payload via the in-repo baseline codec
                from open_parse_ray.functions.jpeg import encode_jpeg

                raw = encode_jpeg(raster.astype("uint8"), quality=img.quality)
                filt = b"/DCTDecode"
            else:
                raw = zlib.compress(raster.astype("uint8").tobytes(), 6)
                filt = b"/FlateDecode"
            objs[img_base + img_idx] = (
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace %s /BitsPerComponent 8 "
                b"/Filter %s /Length %d >>\nstream\n"
                % (w, h, cspace, filt, len(raw))
                + raw
                + b"\nendstream"
            )
            img_idx += 1
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %s %s] "
            b"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> %s>> "
            b"/Contents %d 0 R >>"
            % (
                _num(consts.PAGE_WIDTH),
                _num(consts.PAGE_HEIGHT),
                xobj,
                content_num,
            )
        )
        deflated = zlib.compress(stream or b"", 6)
        objs[content_num] = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(deflated)
            + deflated
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: Dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += objs[num]
        out += b"\nendobj\n"
    xref_off = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n, xref_off)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_OBJ_HEAD = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_REF = re.compile(rb"(\d+)\s+\d+\s+R\b")


def _scan_dict(buf: bytes, start: int) -> Tuple[bytes, int]:
    """Balanced << >> scan; returns (dict bytes incl. brackets, end pos)."""
    assert buf[start : start + 2] == b"<<"
    depth = 0
    i = start
    while i < len(buf) - 1:
        two = buf[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return buf[start:i], i
        else:
            i += 1
    raise ValueError("unterminated dict")


def _parse_objects(pdf: bytes) -> Dict[int, Tuple[bytes, Optional[bytes]]]:
    """num → (object dict bytes, raw stream bytes or None).

    Sequential scan (not a blind regex to ``endobj`` — compressed stream
    bytes may contain that token); stream length comes from /Length,
    which this writer always emits as a direct integer."""
    objs: Dict[int, Tuple[bytes, Optional[bytes]]] = {}
    pos = 0
    while True:
        m = _OBJ_HEAD.search(pdf, pos)
        if not m:
            break
        num = int(m.group(1))
        i = m.end()
        while i < len(pdf) and pdf[i : i + 1] in b" \r\n\t":
            i += 1
        if pdf[i : i + 2] == b"<<":
            d, i = _scan_dict(pdf, i)
        else:
            nxt = pdf.find(b"endobj", i)
            if nxt < 0:
                raise ValueError("unterminated object")
            d = pdf[i:nxt].strip()
            objs[num] = (d, None)
            pos = nxt + 6
            continue
        while i < len(pdf) and pdf[i : i + 1] in b" \r\n\t":
            i += 1
        stream = None
        if pdf[i : i + 6] == b"stream":
            i += 6
            if pdf[i : i + 2] == b"\r\n":
                i += 2
            elif pdf[i : i + 1] == b"\n":
                i += 1
            # direct /Length only — an indirect length ("/Length 5 0 R",
            # common in third-party PDFs) must NOT match as 5. The optional
            # "\d+ R" tail is captured (never lookahead-excluded: a negative
            # lookahead lets the engine backtrack "/Length 12 0 R" into a
            # bogus direct length of 1) and forces the endstream fallback.
            lm = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", d)
            if lm and not lm.group(2):
                ln = int(lm.group(1))
                stream = pdf[i : i + ln]
                i += ln
            else:  # fallback: delimit by endstream
                e = pdf.find(b"endstream", i)
                if e < 0:
                    raise ValueError("unterminated stream")
                stream = pdf[i:e].rstrip(b"\r\n")
                i = e
            es = pdf.find(b"endstream", i)
            if es < 0:
                raise ValueError("unterminated stream")
            i = es + 9
        objs[num] = (d, stream)
        eo = pdf.find(b"endobj", i)
        # a missing endobj must ADVANCE the scan (corrupt input), never
        # rewind it — a rewound `pos` re-finds the same header forever
        pos = (eo + 6) if eo >= 0 else max(i, m.end())
    return objs


def _unpredict_png(data: bytes, columns: int, colors: int = 1) -> bytes:
    """Undo PNG row predictors (/Predictor >= 10) on a decoded stream —
    the encoding xref streams almost universally use (Predictor 12 = Up).
    8-bit components; bpp = colors bytes. Strictly row-bounded: truncated
    input yields the rows that fit, never a scan loop."""
    bpp = max(1, colors)
    stride = columns * bpp
    rows = len(data) // (stride + 1)
    out = bytearray()
    prev = bytearray(stride)
    for r in range(rows):
        base = r * (stride + 1)
        ftype = data[base]
        cur = bytearray(data[base + 1 : base + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad predictor filter {ftype}")
        out += cur
        prev = cur
    return bytes(out)


def _get_stream(objs, num: int) -> bytes:
    d, s = objs[num]
    if s is None:
        return b""
    if b"/FlateDecode" in d:
        s = zlib.decompress(s)
        pm = re.search(rb"/Predictor\s+(\d+)", d)
        if pm and int(pm.group(1)) >= 10:
            cm = re.search(rb"/Columns\s+(\d+)", d)
            colm = re.search(rb"/Colors\s+(\d+)", d)
            s = _unpredict_png(
                s,
                int(cm.group(1)) if cm else 1,
                int(colm.group(1)) if colm else 1,
            )
    return s


# ---------------------------------------------------------------------------
# Standard security handler (RC4, /V 1-2 /R 2-3) — ISO 32000-1 §7.6.
#
# Real-world PDFs are very often encrypted with an EMPTY user password
# (owner-restricted printing etc.); a reader that cannot key that case
# silently extracts nothing. Scope: stream payloads (contents, ObjStm,
# images, ToUnicode) — the only strings this reader consumes live inside
# content streams, which are themselves encrypted as streams. XRef
# streams are never encrypted (spec) and are parsed from the raw bytes,
# so the PDF 1.5 path composes. A wrong password raises ValueError →
# the pdf_text stage's poison isolation turns it into a counted error
# row. Reference seam: pdf.py:89-106 (password/ocr args of Pdf).
# ---------------------------------------------------------------------------

_PDF_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + _PDF_PAD)[:32]


def _std_owner_value(owner_pw: bytes, user_pw: bytes, r: int, klen: int) -> bytes:
    import hashlib

    h = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:klen]
    o = _rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


def _std_file_key(
    user_pw: bytes, o_value: bytes, p: int, id0: bytes, r: int, klen: int
) -> bytes:
    import hashlib
    import struct as _st

    h = hashlib.md5(
        _pad_pw(user_pw) + o_value[:32] + _st.pack("<i", p) + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:klen]).digest()
    return h[:klen]


def _std_user_value(key: bytes, id0: bytes, r: int) -> bytes:
    import hashlib

    if r == 2:
        return _rc4(key, _PDF_PAD)
    u = _rc4(key, hashlib.md5(_PDF_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return (u + b"\x00" * 16)[:32]


def _obj_key(file_key: bytes, num: int, gen: int) -> bytes:
    import hashlib
    import struct as _st

    ext = _st.pack("<I", num)[:3] + _st.pack("<H", gen)
    return hashlib.md5(file_key + ext).digest()[: min(len(file_key) + 5, 16)]


def _parse_pdf_string(d: bytes, key: bytes) -> Optional[bytes]:
    """Value of /KEY in dict bytes as raw string bytes: literal (...)
    with escapes resolved or hex <...>."""
    m = re.search(re.escape(key) + rb"\s*\(", d)
    if m:
        s, _ = _read_literal_string(d, m.end() - 1)
        return s
    m = re.search(re.escape(key) + rb"\s*<([0-9A-Fa-f\s]*)>", d)
    if m:
        hx = re.sub(rb"\s", b"", m.group(1))
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    return None


def _maybe_decrypt(pdf: bytes, objs, password: bytes = b""):
    """Detect /Encrypt in the trailer and RC4-decrypt every stream in
    place. No-op for unencrypted files; raises ValueError for an
    unsupported filter/V or a wrong password (U mismatch).

    Object keys are derived with generation 0 (_obj_key(key, num, 0)):
    _parse_objects keys by object number only, and this repo's writer
    emits generation 0 exclusively. A third-party encrypted PDF with a
    nonzero-generation object would silently decrypt to garbage under
    that assumption, so nonzero generations RAISE instead (becomes a
    counted error row upstream, per the poison-doc contract)."""
    em = None
    for em in re.finditer(rb"/Encrypt\s+(\d+)\s+\d+\s+R", pdf):
        pass  # last match wins (incremental updates append trailers)
    if em is None:
        return objs
    enc_num = int(em.group(1))
    if enc_num not in objs:
        raise ValueError("encrypted PDF: /Encrypt object missing")
    ed, _ = objs[enc_num]
    if not re.search(rb"/Filter\s*/Standard", ed):
        raise ValueError("encrypted PDF: unsupported security handler")
    vm = re.search(rb"/V\s+(\d+)", ed)
    v = int(vm.group(1)) if vm else 0
    if v not in (1, 2):
        raise ValueError(f"encrypted PDF: unsupported /V {v}")
    rm = re.search(rb"/R\s+(\d+)", ed)
    r = int(rm.group(1)) if rm else 2
    pm = re.search(rb"/P\s+(-?\d+)", ed)
    p = int(pm.group(1)) if pm else -1
    lm = re.search(rb"/Length\s+(\d+)", ed)
    klen = (int(lm.group(1)) // 8) if lm else 5
    o_value = _parse_pdf_string(ed, b"/O")
    u_value = _parse_pdf_string(ed, b"/U")
    if o_value is None or u_value is None:
        raise ValueError("encrypted PDF: missing /O or /U")
    idm = None
    for idm in re.finditer(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>", pdf):
        pass
    id0 = bytes.fromhex(idm.group(1).decode("ascii")) if idm else b""
    key = _std_file_key(password, o_value, p, id0, r, klen)
    want_u = _std_user_value(key, id0, r)
    got_u = (u_value + b"\x00" * 32)[:32]
    ok = want_u[:32] == got_u if r == 2 else want_u[:16] == got_u[:16]
    if not ok:
        raise ValueError("encrypted PDF: password required")
    for gm in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", pdf):
        if int(gm.group(2)) != 0:
            raise ValueError(
                "encrypted PDF: nonzero object generation unsupported"
            )
    for num, (d, s) in objs.items():
        if s is None or num == enc_num:
            continue
        if re.search(rb"/Type\s*/XRef", d):
            continue  # xref streams are never encrypted
        objs[num] = (d, _rc4(_obj_key(key, num, 0), s))
    return objs


def encrypt_pdf_rc4(
    pdf: bytes,
    user_pw: bytes = b"",
    owner_pw: bytes = b"owner",
    r: int = 2,
    key_bits: int = 40,
    p: int = -44,
) -> bytes:
    """Produce an encrypted variant of a (classic-xref) PDF: RC4 every
    stream (length-preserving → /Length dicts stay valid), append the
    /Encrypt dictionary, rebuild xref + trailer with /Encrypt and a
    deterministic /ID (md5 of the input — repo determinism invariant).
    Fixture writer for the reader above; scope mirrors it (streams)."""
    import hashlib

    klen = key_bits // 8
    id0 = hashlib.md5(pdf).digest()
    o_value = _std_owner_value(owner_pw, user_pw, r, klen)
    key = _std_file_key(user_pw, o_value, p, id0, r, klen)
    u_value = _std_user_value(key, id0, r)

    objs = _parse_objects(pdf)
    enc_num = max(objs) + 1
    root = re.search(rb"/Root\s+(\d+)\s+(\d+)\s+R", pdf)
    if not root:
        raise ValueError("no /Root")

    def _hex(b: bytes) -> bytes:
        return b"<" + b.hex().encode("ascii") + b">"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        d, s = objs[num]
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += d
        if s is not None:
            body = _rc4(_obj_key(key, num, 0), s)
            out += b"\nstream\n" + body + b"\nendstream"
        out += b"\nendobj\n"
    offsets[enc_num] = len(out)
    v = 1 if key_bits == 40 else 2
    out += b"%d 0 obj\n<< /Filter /Standard /V %d /R %d /Length %d /P %d /O %s /U %s >>\nendobj\n" % (
        enc_num, v, r, key_bits, p, _hex(o_value), _hex(u_value)
    )
    xref_off = len(out)
    n_slots = enc_num + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % n_slots
    for i in range(1, n_slots):
        if i in offsets:
            out += b"%010d 00000 n \n" % offsets[i]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root %s 0 R /Encrypt %d 0 R /ID [ %s %s ] >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (n_slots, root.group(1), enc_num, _hex(id0), _hex(id0), xref_off)
    )
    return bytes(out)


def _expand_object_streams(objs) -> Dict[int, Tuple[bytes, Optional[bytes]]]:
    """PDF 1.5 object streams (/Type /ObjStm): compressed containers
    holding many small non-stream objects (catalog, pages, fonts...).
    Decode each, slice by the /First-relative offset table, and register
    the embedded objects; existing top-level objects win (an
    incrementally-updated top-level object supersedes a packed one).
    Offsets are trusted only within bounds and consumed left-to-right —
    a corrupt table skips entries, never loops."""
    for num in list(objs):
        d, s = objs[num]
        if s is None or not re.search(rb"/Type\s*/ObjStm", d):
            continue
        try:
            data = _get_stream(objs, num)
            nm = re.search(rb"/N\s+(\d+)", d)
            fm = re.search(rb"/First\s+(\d+)", d)
            if not (nm and fm):
                continue
            n, first = int(nm.group(1)), int(fm.group(1))
            if not (0 <= first <= len(data)):
                continue
            head = data[:first].split()
            pairs = []
            for i in range(min(n, len(head) // 2)):
                pairs.append((int(head[2 * i]), int(head[2 * i + 1])))
        except Exception:
            continue  # a broken container loses its objects, nothing else
        for idx, (onum, off) in enumerate(pairs):
            start = first + off
            end = (
                first + pairs[idx + 1][1] if idx + 1 < len(pairs) else len(data)
            )
            if not (first <= start <= end <= len(data)):
                continue
            body = data[start:end].strip()
            if body and onum not in objs:
                objs[onum] = (body, None)
    return objs


def _xref_stream_entries(pdf: bytes) -> Dict[int, Tuple[int, int, int]]:
    """Decode every PDF 1.5 cross-reference STREAM (/Type /XRef):
    {obj_num: (type, field2, field3)} with the spec field semantics —
    type 1 = (1, byte offset, gen), type 2 = (2, containing ObjStm
    number, index within it), type 0 = free. Handles /W widths (a
    zero-width type column defaults to 1), /Index subsections, and the
    PNG-predictor encoding. The extraction path itself locates objects
    by full scan (more robust than trusting offsets); this decoder is
    the structural reader third-party tooling needs, and is gated by a
    constructed-fixture test."""
    entries: Dict[int, Tuple[int, int, int]] = {}
    objs = _parse_objects(pdf)
    for num, (d, s) in objs.items():
        if s is None or not re.search(rb"/Type\s*/XRef", d):
            continue
        try:
            data = _get_stream(objs, num)
            W = [
                int(x)
                for x in re.search(rb"/W\s*\[([^\]]*)\]", d).group(1).split()
            ]
            size = int(re.search(rb"/Size\s+(\d+)", d).group(1))
            im = re.search(rb"/Index\s*\[([^\]]*)\]", d)
            index = (
                [int(x) for x in im.group(1).split()] if im else [0, size]
            )
        except Exception:
            continue
        rw = sum(W)
        if rw <= 0:
            continue
        pos = 0
        for k in range(0, len(index) - 1, 2):
            start, cnt = index[k], index[k + 1]
            for j in range(cnt):
                row = data[pos : pos + rw]
                if len(row) < rw:
                    break
                pos += rw
                fields = []
                o = 0
                for wi, w in enumerate(W):
                    if w == 0:
                        fields.append(1 if wi == 0 else 0)
                    else:
                        fields.append(int.from_bytes(row[o : o + w], "big"))
                        o += w
                entries[start + j] = (fields[0], fields[1], fields[2])
    return entries


def _parse_tounicode(data: bytes) -> Optional[Dict]:
    """A /ToUnicode CMap stream → {"bytes_per_code": 1|2, "map":
    {code → unicode str}}. Covers bfchar entries, bfrange with an
    increment target and bfrange with an explicit array, UTF-16BE
    destination strings (surrogate pairs included), and derives the code
    width from the codespace range (fallback: widest source seen)."""

    def _dst(hexs: bytes) -> str:
        h = hexs.decode("ascii")
        if len(h) % 4:
            h = h.zfill((len(h) + 3) // 4 * 4)
        return bytes.fromhex(h).decode("utf-16-be", errors="replace")

    cmap: Dict[int, str] = {}
    width = 0
    csm = re.search(
        rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data
    )
    if csm:
        width = max(1, len(csm.group(1)) // 2)
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for hm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            cmap[int(hm.group(1), 16)] = _dst(hm.group(2))
            width = max(width, len(hm.group(1)) // 2)
    entry = re.compile(
        rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|\[(.*?)\])",
        re.S,
    )
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for em in entry.finditer(m.group(1)):
            lo, hi = int(em.group(1), 16), int(em.group(2), 16)
            if hi < lo or hi - lo > 0x10000:
                continue  # bounded: a hostile range cannot explode memory
            width = max(width, len(em.group(1)) // 2)
            if em.group(3) is not None:
                base = int(em.group(3), 16)
                for c in range(lo, hi + 1):
                    cmap[c] = chr(base + (c - lo))
            else:
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", em.group(4))
                for c, dh in zip(range(lo, hi + 1), dsts):
                    cmap[c] = _dst(dh)
    if not cmap:
        return None
    return {"bytes_per_code": min(max(width, 1), 2), "map": cmap}


def _font_cmaps(objs, page_dict: bytes) -> Dict[bytes, Dict]:
    """/F-name → parsed ToUnicode CMap for fonts that carry one."""
    out: Dict[bytes, Dict] = {}
    fm = re.search(rb"/Font\s*<<(.*?)>>", page_dict, re.S)
    if not fm:
        return out
    for m in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
        fref = int(m.group(2))
        if fref not in objs:
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", objs[fref][0])
        if not tm or int(tm.group(1)) not in objs:
            continue
        try:
            parsed = _parse_tounicode(_get_stream(objs, int(tm.group(1))))
        except Exception:
            continue
        if parsed:
            out[m.group(1)] = parsed
    return out


def _page_content(objs, page_dict: bytes) -> Optional[bytes]:
    """A page's content stream(s): single reference or an ARRAY of
    references (third-party writers split streams; the spec says the
    concatenation is interpreted as one stream)."""
    am = re.search(rb"/Contents\s*\[(.*?)\]", page_dict, re.S)
    if am:
        parts = [
            _get_stream(objs, int(m.group(1))) for m in _REF.finditer(am.group(1))
        ]
        return b"\n".join(parts) if parts else None
    cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", page_dict)
    if cm:
        return _get_stream(objs, int(cm.group(1)))
    return None


def _page_objects(objs) -> List[int]:
    """Page object numbers in document order (Catalog → Pages → Kids)."""
    root = None
    for num, (d, _) in objs.items():
        if b"/Type /Catalog" in d or b"/Type/Catalog" in d:
            root = num
            break
    if root is None:
        raise ValueError("no /Catalog")
    m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", objs[root][0])
    pages_obj = int(m.group(1))
    kids_m = re.search(rb"/Kids\s*\[(.*?)\]", objs[pages_obj][0], re.S)
    return [int(r.group(1)) for r in _REF.finditer(kids_m.group(1))]


def _font_map(objs, page_dict: bytes) -> Dict[bytes, str]:
    """/F-name → BaseFont string for a page's /Resources."""
    out: Dict[bytes, str] = {}
    fm = re.search(rb"/Font\s*<<(.*?)>>", page_dict, re.S)
    if not fm:
        return out
    for m in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
        fdict = objs[int(m.group(2))][0]
        bm = re.search(rb"/BaseFont\s*/([#\w+-]+)", fdict)
        out[m.group(1)] = (
            bm.group(1).decode("latin-1") if bm else m.group(1).decode()
        )
    return out


_STR_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\f",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


def _read_literal_string(buf: bytes, i: int) -> Tuple[bytes, int]:
    """Parse a ( ... ) literal with escapes + balanced parens; returns
    (decoded bytes, position after the closing paren)."""
    assert buf[i : i + 1] == b"("
    i += 1
    out = bytearray()
    depth = 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            nxt = buf[i + 1]
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = bytearray()
                while j < n and len(oct_digits) < 3 and 0x30 <= buf[j] <= 0x37:
                    oct_digits.append(buf[j])
                    j += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
                i = j
                continue
            rep = _STR_ESCAPES.get(nxt)
            if rep is not None:
                out += rep
                i += 2
                continue
            if nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
                continue
            out.append(nxt)  # unknown escape: the char itself
            i += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out.append(c)
        i += 1
    raise ValueError("unterminated string")


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/([^\s/\[\]()<>{}%]*)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _tokenize_content(buf: bytes):
    """Yield ('num', float) | ('str', bytes) | ('name', bytes) |
    ('arr_open'/'arr_close', None) | ('op', bytes) tokens."""
    i = 0
    n = len(buf)
    while i < n:
        c = buf[i : i + 1]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == b"%":  # comment to EOL
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _read_literal_string(buf, i)
            yield ("str", s)
        elif c == b"<" and buf[i + 1 : i + 2] != b"<":
            j = buf.find(b">", i)
            if j < 0:
                raise ValueError("unterminated hex string")
            hexs = re.sub(rb"\s", b"", buf[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", bytes.fromhex(hexs.decode()))
            i = j + 1
        elif c == b"[":
            yield ("arr_open", None)
            i += 1
        elif c == b"]":
            yield ("arr_close", None)
            i += 1
        elif c == b"/":
            m = _NAME_RE.match(buf, i)
            yield ("name", m.group(1))
            i = m.end()
        elif c in b"+-.0123456789":
            m = _NUM_RE.match(buf, i)
            yield ("num", float(m.group(0)))
            i = m.end()
        else:
            m = _OP_RE.match(buf, i)
            if not m:
                i += 1
                continue
            yield ("op", m.group(0))
            i = m.end()


class _Line:
    __slots__ = ("y", "x0", "x1", "chars", "max_size")

    def __init__(self, y: float, x0: float):
        self.y = y
        self.x0 = x0
        self.x1 = x0
        self.chars: List[Tuple[str, str, float]] = []
        self.max_size = 0.0


def _interpret_page(
    content: bytes,
    fonts: Dict[bytes, str],
    cmaps: Optional[Dict[bytes, Dict]] = None,
) -> List[_Line]:
    """Run the text operators; return baseline-keyed lines (reading order).

    Implements the text-state subset the reference's payloads use:
    Tf Td TD TL Tm T* Tj TJ ' \" — translation-only text matrices (the
    writer never emits rotation/scaling). Fonts carrying a /ToUnicode
    CMap (``cmaps``) decode string bytes through it — 1- or 2-byte
    codes → Unicode — so non-Latin third-party text survives; fonts
    without one keep the latin-1 byte decode."""
    lines: Dict[float, _Line] = {}
    fontname, size, leading = "", 0.0, 0.0
    cur_cmap: Optional[Dict] = None
    # line matrix origin (x, y) and current point
    lx = ly = cx = 0.0
    stack: List[float] = []
    in_array: Optional[List] = None

    def show(sbytes: bytes):
        nonlocal cx
        if cur_cmap is not None:
            bpc = cur_cmap["bytes_per_code"]
            mp = cur_cmap["map"]
            text = "".join(
                mp.get(
                    code := int.from_bytes(sbytes[i : i + bpc], "big"),
                    chr(code) if code < 256 else "�",
                )
                for i in range(0, len(sbytes) - bpc + 1, bpc)
            )
        else:
            text = sbytes.decode("latin-1")
        key = round(ly, 4)
        line = lines.get(key)
        if line is None:
            line = _Line(ly, cx)
            lines[key] = line
        cw = _char_width(size)
        for ch in text:
            line.chars.append((ch, fontname, size))
        cx += cw * len(text)
        line.x1 = max(line.x1, cx)
        line.x0 = min(line.x0, cx - cw * len(text))
        line.max_size = max(line.max_size, size)

    def newline(tx: float, ty: float):
        nonlocal lx, ly, cx
        lx += tx
        ly += ty
        cx = lx

    for kind, val in _tokenize_content(content):
        if kind == "arr_open":
            in_array = []
            continue
        if kind == "arr_close":
            continue
        if kind in ("num", "str", "name"):
            if in_array is not None and kind in ("num", "str"):
                in_array.append((kind, val))
            else:
                stack.append(val)
            continue
        op = val
        if op == b"Tf":
            size = float(stack[-1])
            fname = stack[-2]
            fontname = fonts.get(fname, fname.decode("latin-1"))
            cur_cmap = cmaps.get(fname) if cmaps else None
            stack.clear()
        elif op == b"TL":
            leading = float(stack[-1])
            stack.clear()
        elif op == b"Td":
            newline(float(stack[-2]), float(stack[-1]))
            stack.clear()
        elif op == b"TD":
            leading = -float(stack[-1])
            newline(float(stack[-2]), float(stack[-1]))
            stack.clear()
        elif op == b"Tm":
            lx, ly = float(stack[-2]), float(stack[-1])
            cx = lx
            stack.clear()
        elif op == b"T*":
            newline(0.0, -leading)
            stack.clear()
        elif op == b"Tj":
            show(stack.pop())
            stack.clear()
        elif op == b"'":
            newline(0.0, -leading)
            show(stack.pop())
            stack.clear()
        elif op == b'"':
            # aw ac string " : spacing ignored (advance model is synthetic)
            s = stack.pop()
            newline(0.0, -leading)
            show(s)
            stack.clear()
        elif op == b"TJ":
            if in_array is not None:
                for k, v in in_array:
                    if k == "str":
                        show(v)
                    else:  # kerning adjustment: move the current point
                        cx -= float(v) / 1000.0 * size
                in_array = None
            stack.clear()
        elif op in (b"BT", b"ET"):
            lx = ly = cx = 0.0
            stack.clear()
        else:
            stack.clear()  # untracked operator: discard operands

    out = sorted(lines.values(), key=lambda l: -l.y)
    return [l for l in out if l.chars]


_CM_DO = re.compile(
    rb"([\d.]+)\s+0\s+0\s+([\d.]+)\s+([\d.-]+)\s+([\d.-]+)\s+cm\s*/(\w+)\s+Do"
)
_CS_MODE = {b"DeviceRGB": "RGB", b"DeviceGray": "L"}


def _page_images(objs, page_dict: bytes, content: bytes, page_no: int):
    """Image XObjects referenced by this page → ImageElements with PNG
    payloads (the reference's `_process_png_image` path: raw FlateDecode
    raster → PNG re-encode; core.py:160-206, 244-273)."""
    from open_parse_ray.model import ImageElement
    from open_parse_ray.stages.multimodal import process_raw_image

    xm = re.search(rb"/XObject\s*<<(.*?)>>", page_dict, re.S)
    if not xm:
        return []
    names = {
        m.group(1): int(m.group(2))
        for m in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", xm.group(1))
    }
    out = []
    for m in _CM_DO.finditer(content):
        w_disp, h_disp = float(m.group(1)), float(m.group(2))
        x, y = float(m.group(3)), float(m.group(4))
        num = names.get(m.group(5))
        if num is None:
            continue
        d, _ = objs[num]
        wm = re.search(rb"/Width\s+(\d+)", d)
        hm = re.search(rb"/Height\s+(\d+)", d)
        cs = re.search(rb"/ColorSpace\s*/(\w+)", d)
        if not (wm and hm):
            continue
        mode = _CS_MODE.get(cs.group(1) if cs else b"DeviceRGB", "RGB")
        if b"/DCTDecode" in d:
            # the reference's DCTDecode branch (core.py:83-84): the
            # stream IS the JPEG payload, mimetype image/jpeg — but
            # unlike the PIL passthrough, validate it with the real
            # in-repo baseline decoder (undecodable → skip, the
            # return-None-on-error contract)
            from open_parse_ray.functions.jpeg import decode_jpeg

            jpeg_bytes = _get_stream(objs, num)
            try:
                decode_jpeg(jpeg_bytes)
            except Exception:
                continue
            payload, mimetype = jpeg_bytes, "image/jpeg"
        else:
            payload = process_raw_image(
                _get_stream(objs, num), int(wm.group(1)), int(hm.group(1)), mode
            )
            if payload is None:
                continue
            mimetype = "image/png"
        out.append(
            ImageElement(
                text="",
                bbox=Bbox(
                    page=page_no,
                    page_height=consts.PAGE_HEIGHT,
                    page_width=consts.PAGE_WIDTH,
                    x0=x,
                    y0=y,
                    x1=x + w_disp,
                    y1=y + h_disp,
                ),
                image=payload,
                image_mimetype=mimetype,
            )
        )
    return out


def parse_pdf(pdf_bytes: bytes) -> List[TextElement]:
    """PDF bytes → Text/Image elements (same IR as the HTML path).

    Line → element grouping: a new element starts when the baseline gap
    exceeds 1.6 × the previous line's leading or the dominant font size
    changes — reproducing pdfminer's paragraph grouping for flowed
    layouts (reference: core.py:209-243)."""
    objs = _expand_object_streams(_maybe_decrypt(pdf_bytes, _parse_objects(pdf_bytes)))
    elements: List[TextElement] = []
    for page_no, pnum in enumerate(_page_objects(objs)):
        pd, _ = objs[pnum]
        content = _page_content(objs, pd)
        if content is None:
            continue
        fonts = _font_map(objs, pd)
        cmaps = _font_cmaps(objs, pd)
        elements.extend(_page_images(objs, pd, content, page_no))
        plines = _interpret_page(content, fonts, cmaps)

        groups: List[List[_Line]] = []
        for ln in plines:
            if groups:
                prev = groups[-1][-1]
                gap = prev.y - ln.y
                if gap <= 1.6 * prev.max_size * _LEADING and (
                    ln.max_size == prev.max_size
                ):
                    groups[-1].append(ln)
                    continue
            groups.append([ln])

        for g in groups:
            les = []
            for ln in g:
                chars = extract_chars((c, f, s) for c, f, s in ln.chars)
                bbox = (ln.x0, ln.y, ln.x1, ln.y + ln.max_size)
                les.append(create_line_element(chars, bbox))
            x0 = min(le.bbox[0] for le in les)
            y0 = min(le.bbox[1] for le in les)
            x1 = max(le.bbox[2] for le in les)
            y1 = max(le.bbox[3] for le in les)
            elements.append(
                TextElement(
                    text="\n".join(le.text for le in les),
                    lines=tuple(les),
                    bbox=Bbox(
                        page=page_no,
                        page_height=consts.PAGE_HEIGHT,
                        page_width=consts.PAGE_WIDTH,
                        x0=x0,
                        y0=y0,
                        x1=x1,
                        y1=y1,
                    ),
                )
            )
    return elements


def pdf_extracted_text(pdf_bytes: bytes) -> str:
    """All line texts in reading order joined by single spaces — equal to
    the whitespace-normalized typeset input (the SQL-oracle invariant)."""
    parts: List[str] = []
    for el in parse_pdf(pdf_bytes):
        for le in getattr(el, "lines", ()) or ():
            # raw span text (no markdown bold/italic markers)
            t = "".join(sp.text for sp in le.spans).strip()
            if t:
                parts.append(t)
    return " ".join(parts)


def pdf_num_pages(pdf_bytes: bytes) -> int:
    return len(_page_objects(_expand_object_streams(_maybe_decrypt(pdf_bytes, _parse_objects(pdf_bytes)))))


def _page_payloads(pdf_bytes: bytes):
    """Per page: (decompressed content stream, raster or None) — the
    building blocks `extract_pages` reassembles with `_assemble_pdf`."""
    objs = _expand_object_streams(_maybe_decrypt(pdf_bytes, _parse_objects(pdf_bytes)))
    out = []
    for pnum in _page_objects(objs):
        pd_, _ = objs[pnum]
        content = _page_content(objs, pd_) or b""
        raster = None
        xm = re.search(rb"/XObject\s*<<(.*?)>>", pd_, re.S)
        if xm:
            rm = re.search(rb"/(\w+)\s+(\d+)\s+\d+\s+R", xm.group(1))
            if rm:
                d, _s = objs[int(rm.group(2))]
                wm = re.search(rb"/Width\s+(\d+)", d)
                hm = re.search(rb"/Height\s+(\d+)", d)
                if wm and hm:
                    import numpy as _np

                    raw = _get_stream(objs, int(rm.group(2)))
                    w, h = int(wm.group(1)), int(hm.group(1))
                    # channel count from /ColorSpace (a DeviceGray
                    # XObject must not be reshaped as RGB)
                    csm = re.search(rb"/ColorSpace\s*/(\w+)", d)
                    gray = csm is not None and csm.group(1) == b"DeviceGray"
                    if gray:
                        raster = _np.frombuffer(
                            raw, dtype=_np.uint8, count=w * h
                        ).reshape(h, w)
                    else:
                        raster = _np.frombuffer(
                            raw, dtype=_np.uint8, count=w * h * 3
                        ).reshape(h, w, 3)
        out.append((content, raster))
    return out


class Pdf:
    """PDF handle (reference: src/openparse/pdf.py:89-150 — the
    Pdf(file) wrapper over pypdf reader/writer), stdlib-only.

    ``extract_layout_pages`` yields per-page element lists (the
    ``extract_pages(LTPage)`` analog), ``save`` writes the bytes,
    ``extract_pages(start, end)`` rebuilds a new valid PDF holding just
    that page range (the reference's pypdf writer subset), ``to_imgs``
    rasterizes text pages onto BMP page images with the engine's bitmap
    typeface (the ``doc_to_imgs`` analog — uppercase charset; feeds the
    OCR engine, closing the PDF→image→OCR loop)."""

    def __init__(self, file):
        if isinstance(file, (bytes, bytearray)):
            self.file_path = None
            self._bytes = bytes(file)
        else:
            self.file_path = str(file)
            with open(file, "rb") as f:
                self._bytes = f.read()
        if not self._bytes.startswith(b"%PDF-"):
            raise ValueError("not a PDF")
        self.num_pages = pdf_num_pages(self._bytes)

    @property
    def bytes(self) -> bytes:
        return self._bytes

    def extract_layout_pages(self):
        """Yield the element list of each page in order (one parse)."""
        els = parse_pdf(self._bytes)
        for page_no in range(self.num_pages):
            yield [el for el in els if el.bbox.page == page_no]

    def save(self, output_path) -> None:
        with open(output_path, "wb") as f:
            f.write(self._bytes)

    def extract_pages(self, start: int, end: int) -> bytes:
        """New valid PDF holding pages [start, end) of this one, in the
        ORIGINAL page order (interleaved text/image documents keep their
        sequence — the payload list is passed through ordered)."""
        payloads = _page_payloads(self._bytes)[start:end]
        return _assemble_pdf_pages(
            [(c, r) if r is None else (None, r) for c, r in payloads]
        )

    def to_imgs(self, page_w: int = 612, page_h: int = 792):
        """Rasterize each TEXT page to a BMP image using the bitmap
        typeface (chars outside its charset render as '?', lowercase is
        uppercased — the deterministic stand-in for a real rasterizer)."""
        from open_parse_ray.stages.ocr_vision import (
            CHARSET,
            render_text_image,
        )

        out = []
        by_page: Dict[int, List[str]] = {}
        for el in parse_pdf(self._bytes):
            for le in getattr(el, "lines", ()) or ():
                raw = "".join(sp.text for sp in le.spans).strip()
                if raw:
                    by_page.setdefault(el.bbox.page, []).append(raw)
        for page_no in range(self.num_pages):
            lines = [
                "".join(
                    ch if ch in CHARSET or ch == " " else "?"
                    for ch in ln.upper()
                )
                for ln in by_page.get(page_no, [])
            ]
            h = max(60, 8 + len(lines) * 10 + 8)
            w = max(140, 16 + max((len(l) for l in lines), default=0) * 6)
            out.append(render_text_image(lines, page_w=w, page_h=h))
        return out
