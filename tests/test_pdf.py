"""stdlib-only PDF codec gates: structural validity, exact text
roundtrip, operator coverage, style fidelity, node-pipeline integration.

Reference semantics being reproduced: pdfminer char extraction → span
grouping (src/openparse/text/pdfminer/core.py:43-157) and element
assembly (core.py:209-273) — here driven by PDFs this engine typesets
itself, since pdfminer/pypdf are absent from the environment.
"""

import re

import pytest

from open_parse_ray.functions.pdf import (
    _parse_objects,
    parse_pdf,
    pdf_extracted_text,
    pdf_num_pages,
    typeset_pdf,
)


def _norm(s: str) -> str:
    return " ".join(s.split())


def test_pdf_structure_is_valid():
    pdf = typeset_pdf("hello world " * 50, title="Doc Title")
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    # xref offsets point at the right objects
    sx = re.search(rb"startxref\s+(\d+)", pdf)
    xref_off = int(sx.group(1))
    assert pdf[xref_off : xref_off + 4] == b"xref"
    body = pdf[xref_off:]
    offs = re.findall(rb"^(\d{10}) 00000 n", body, re.M)
    for i, off in enumerate(offs, start=1):
        at = int(off)
        assert re.match(rb"%d 0 obj" % i, pdf[at : at + 16]), f"obj {i}"


def test_pdf_roundtrip_exact_text():
    cases = [
        "",
        "one",
        "two words",
        "The quick brown fox jumps over the lazy dog. " * 60,
        "Weird (parens) and \\ backslashes \\\\ and\ttabs.",
        "para one here\n\npara two there\n\n\npara three everywhere",
        "x" * 400 + " unbroken-long-token then tail",
    ]
    for text in cases:
        got = pdf_extracted_text(typeset_pdf(text))
        assert got == _norm(text), repr(text[:40])


def test_pdf_roundtrip_with_title_and_multipage():
    text = "Repeatable body words go here again and again. " * 400
    pdf = typeset_pdf(text, title="A Heading That Wraps Because It Is Long " * 3)
    assert pdf_num_pages(pdf) >= 2
    want = _norm("A Heading That Wraps Because It Is Long " * 3 + text)
    assert pdf_extracted_text(pdf) == want


def test_pdf_operator_coverage_in_writer_output():
    """The writer must keep exercising the full operator set the reader
    implements — if this shrinks, parser coverage silently shrinks."""
    pdf = typeset_pdf("word " * 300)
    objs = _parse_objects(pdf)
    import zlib

    streams = b"\n".join(
        zlib.decompress(s) for d, s in objs.values() if s and b"/FlateDecode" in d
    )
    for op in (b" Tj", b" TJ", b" Td", b" Tm", b" TL", b"T*", b" '"):
        assert op in streams, op


def test_pdf_styles_and_elements():
    pdf = typeset_pdf("body text " * 30, title="Big Bold Title")
    els = parse_pdf(pdf)
    assert len(els) == 2  # title block, body block
    title, body = els
    assert title.lines[0].spans[0].is_bold
    assert title.lines[0].spans[0].size == 18.0
    assert not body.lines[0].spans[0].is_bold
    assert body.lines[0].spans[0].size == 12.0
    # y-down ordering: title above body, same page
    assert title.bbox.page == body.bbox.page == 0
    assert title.bbox.y0 > body.bbox.y1 - 1e-6


def test_pdf_bbox_geometry_consistent():
    from open_parse_ray import consts

    pdf = typeset_pdf("some words spread over a line " * 10)
    els = parse_pdf(pdf)
    for el in els:
        for le in el.lines:
            x0, y0, x1, y1 = le.bbox
            assert x0 == consts.PAGE_MARGIN_X
            assert x1 <= consts.PAGE_WIDTH - consts.PAGE_MARGIN_X + 1e-6
            assert 0 <= y0 < y1 <= consts.PAGE_HEIGHT


def test_pdf_node_pipeline_integration():
    """PDF elements flow through the SAME BasicIngestionPipeline as the
    HTML path: heading + long body → nodes with tokens, no crashes, and
    sub-stub docs drop to zero nodes (reference threshold semantics)."""
    from open_parse_ray.stages.pdf_text import parse_pdf_page

    long_doc = typeset_pdf("many words in this body " * 40, title="Section Head")
    nodes = parse_pdf_page(long_doc)
    assert nodes, "long doc must yield nodes"
    assert all(n.tokens > 0 for n in nodes)
    joined = " ".join(_norm(n.text.replace("**", "")) for n in nodes)
    assert "many words in this body" in joined

    stub = typeset_pdf("tiny")
    assert parse_pdf_page(stub) == []  # below RemoveNodesBelowNTokens


def test_pdf_extract_text_query(ray_session):
    from open_parse_ray.stages.pdf_text import pdf_extract_text

    out = pdf_extract_text("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    import duckdb

    con = duckdb.connect()
    want = con.sql(
        """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN ''
                    ELSE array_to_string(regexp_split_to_array(trim(text), '\\s+'), ' ')
               END AS extracted_text
        FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        ORDER BY doc_id
        """
    ).df()
    got = out.sort_values("doc_id").reset_index(drop=True)
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()


def test_pdf_embedded_images_roundtrip_exact():
    """Image XObjects embed as FlateDecode rasters and come back as
    ImageElements whose PNG payload decodes to the EXACT source raster
    (the reference's _process_png_image path, core.py:160-206)."""
    import numpy as np

    from open_parse_ray.model import ImageElement
    from open_parse_ray.stages.multimodal import decode_png

    rng = np.random.RandomState(3)
    imgs = [
        rng.randint(0, 256, size=(12, 20, 3), dtype=np.uint8),
        rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8),
    ]
    pdf = typeset_pdf("words around the figure " * 30, images=imgs)
    els = parse_pdf(pdf)
    ims = [e for e in els if isinstance(e, ImageElement)]
    assert len(ims) == 2
    for im, src in zip(ims, imgs):
        assert im.image_mimetype == "image/png"
        assert np.array_equal(decode_png(im.image), src)
        assert im.bbox.x1 - im.bbox.x0 == src.shape[1]
    # text extraction is unaffected by image pages
    assert pdf_extracted_text(pdf) == _norm("words around the figure " * 30)


def test_parse_pdf_bytes_stage_isolates_poison_payloads():
    """Corrupt/truncated PDFs become error rows, never exceptions —
    the DecodeMedia error contract on the PDF payload path."""
    import pandas as pd

    from open_parse_ray.stages.pdf_text import ParsePdfBytes

    good = typeset_pdf("fifty good words " * 20)
    payloads = [
        good,
        b"",
        b"%PDF-1.4 garbage with no objects",
        good[: len(good) // 2],  # truncated mid-stream
        good.replace(b"/Catalog", b"/Nothing"),  # broken object graph
    ]
    out = ParsePdfBytes()(
        pd.DataFrame({"doc_id": range(len(payloads)), "pdf_bytes": payloads})
    )
    assert out.loc[0, "status"] == "ok"
    assert out.loc[0, "extracted_text"] == _norm("fifty good words " * 20)
    assert (out.loc[1:, "status"].str.startswith("error:")).all()
    assert (out.loc[1:, "extracted_text"] == "").all()


def test_pdf_roundtrip_property():
    """Randomized word-soup roundtrips (seeded hypothesis-lite): any
    printable-ASCII word sequence survives typeset→parse exactly."""
    import random

    rng = random.Random(123)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789()\\/.,;:!?#$%&*+-=<>[]{}'\""
    )
    for trial in range(25):
        n = rng.randint(0, 300)
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
            for _ in range(n)
        ]
        text = " ".join(words)
        assert pdf_extracted_text(typeset_pdf(text)) == _norm(text), trial


def test_pdf_handle_class(tmp_path):
    """Pdf handle analog (reference pdf.py:89-150): num_pages, save,
    page-subset extraction producing a valid PDF, per-page layout."""
    from open_parse_ray.functions.pdf import Pdf

    text = "Repeated page filler words go here. " * 300
    src = typeset_pdf(text)
    pdf = Pdf(src)
    assert pdf.num_pages >= 3

    # save → reload is byte-identical
    p = tmp_path / "doc.pdf"
    pdf.save(str(p))
    assert Pdf(str(p)).bytes == src

    # page subset: new VALID pdf whose text equals those pages' lines
    sub = pdf.extract_pages(1, 3)
    assert sub.startswith(b"%PDF-") and pdf_num_pages(sub) == 2
    pages = list(pdf.extract_layout_pages())
    assert len(pages) == pdf.num_pages
    want = " ".join(
        "".join(sp.text for sp in le.spans).strip()
        for pg in pages[1:3]
        for el in pg
        for le in el.lines
    )
    assert pdf_extracted_text(sub) == _norm(want)


def test_extract_pages_preserves_interleaved_order_and_gray():
    """Regression: subsetting a document with text/image/text pages must
    keep the original sequence (the old path appended all image pages at
    the end), and a /DeviceGray XObject must roundtrip as a 1-channel
    raster, not be misread as RGB."""
    import numpy as np

    from open_parse_ray.functions.pdf import (
        Pdf,
        _assemble_pdf_pages,
        _page_payloads,
    )

    t1 = b"BT /F1 12 Tf 1 0 0 1 56 700 Tm (page one text) Tj ET"
    t2 = b"BT /F1 12 Tf 1 0 0 1 56 700 Tm (page three text) Tj ET"
    rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    gray = np.arange(5 * 7, dtype=np.uint8).reshape(5, 7)
    src = _assemble_pdf_pages(
        [(t1, None), (None, rgb), (t2, None), (None, gray)]
    )
    pdf = Pdf(src)
    assert pdf.num_pages == 4

    payloads = _page_payloads(src)
    assert payloads[0][1] is None and payloads[2][1] is None
    assert np.array_equal(payloads[1][1], rgb)
    assert np.array_equal(payloads[3][1], gray)  # 1-channel, exact

    # subset [1, 4): raster page FIRST, then text, then gray raster
    sub = Pdf(pdf.extract_pages(1, 4))
    assert sub.num_pages == 3
    sub_payloads = _page_payloads(sub.bytes)
    assert np.array_equal(sub_payloads[0][1], rgb)
    assert sub_payloads[1][1] is None
    assert np.array_equal(sub_payloads[2][1], gray)
    assert pdf_extracted_text(sub.bytes) == "page three text"


def test_pdf_to_imgs_ocr_roundtrip():
    """PDF → rasterized page images → OCR engine recovers the text:
    the full PDF→image→OCR loop with zero external libraries."""
    from open_parse_ray.functions.pdf import Pdf
    from open_parse_ray.stages.ocr_vision import ocr_image

    text = "THE QUICK BROWN FOX 123 JUMPS OVER DOG. " * 30
    pdf = Pdf(typeset_pdf(text))
    imgs = pdf.to_imgs()
    assert len(imgs) == pdf.num_pages
    got_lines = []
    for bmp in imgs:
        got_lines.extend(t for t, _ in ocr_image(bmp))
    assert " ".join(" ".join(got_lines).split()) == _norm(text)


def test_extract_pdf_dir_source(ray_session, tmp_path):
    """Directory-of-PDFs source: read_binary_files → poison-isolated
    extraction, matching the per-file typeset text."""
    from open_parse_ray.stages.pdf_text import extract_pdf_dir

    texts = {
        "a.pdf": "first document body words " * 20,
        "b.pdf": "second document other words " * 30,
    }
    for name, t in texts.items():
        (tmp_path / name).write_bytes(typeset_pdf(t))
    (tmp_path / "bad.pdf").write_bytes(b"%PDF-1.4 not really")

    out = extract_pdf_dir(str(tmp_path)).to_pandas()
    assert len(out) == 3
    by_name = {row.url.split("/")[-1]: row for row in out.itertuples()}
    for name, t in texts.items():
        assert by_name[name].status == "ok"
        assert by_name[name].extracted_text == _norm(t)
    assert by_name["bad.pdf"].status.startswith("error:")


def test_reader_handles_third_party_structures():
    """Hand-written PDF with features OUR writer never emits but real
    writers do: a /Contents ARRAY of two uncompressed streams and an
    indirect /Length reference."""
    body1 = b"BT /F1 12 Tf 1 0 0 1 56 700 Tm (first part) Tj ET"
    body2 = b"BT /F1 12 Tf 1 0 0 1 56 680 Tm (second part) Tj ET"
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents [5 0 R 6 0 R] >>\nendobj\n",
        b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Name /F1 >>\nendobj\n",
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(body1)
        + body1
        + b"\nendstream\nendobj\n",
        # indirect /Length: must fall back to endstream delimiting,
        # NOT read "7" as the byte count
        b"6 0 obj\n<< /Length 7 0 R >>\nstream\n"
        + body2
        + b"\nendstream\nendobj\n",
        b"7 0 obj\n%d\nendobj\n" % len(body2),
    ]
    pdf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(pdf))
        pdf += o
    xref_off = len(pdf)
    pdf += b"xref\n0 8\n0000000000 65535 f \n"
    for off in offsets:
        pdf += b"%010d 00000 n \n" % off
    pdf += b"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_off

    assert pdf_extracted_text(bytes(pdf)) == "first part second part"


def test_reader_indirect_length_multidigit_object_number():
    """Regression: "/Length 12 0 R" must NOT backtrack into a direct
    length of 1 (the old negative-lookahead regex did exactly that,
    silently truncating the stream to one byte). Object number chosen
    multi-digit on purpose."""
    body = b"BT /F1 12 Tf 1 0 0 1 56 700 Tm (first part) Tj "
    body += b"1 0 0 1 56 680 Tm (second part) Tj ET"
    objs = {
        1: b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        2: b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        3: b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n",
        4: b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Name /F1 >>\nendobj\n",
        5: b"5 0 obj\n<< /Length 12 0 R >>\nstream\n"
        + body
        + b"\nendstream\nendobj\n",
        12: b"12 0 obj\n%d\nendobj\n" % len(body),
    }
    pdf = bytearray(b"%PDF-1.4\n")
    for o in objs.values():
        pdf += o
    pdf += b"trailer\n<< /Size 13 /Root 1 0 R >>\nstartxref\n0\n%%%%EOF\n"

    assert pdf_extracted_text(bytes(pdf)) == "first part second part"


def test_pdf_reader_corruption_fuzz():
    """Seeded byte-corruption fuzz: the reader must either parse or
    raise — never hang or return corrupted text silently for flipped
    structure bytes that break framing. (Flips inside the compressed
    stream that still inflate are allowed to change text; this gate is
    about crash/hang safety, which ParsePdfBytes turns into error
    rows.)"""
    import random

    base = typeset_pdf("fuzz target words " * 40, title="T")
    rng = random.Random(7)
    outcomes = {"ok": 0, "err": 0}
    for _ in range(80):
        b = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            pdf_extracted_text(bytes(b))
            outcomes["ok"] += 1
        except Exception:
            outcomes["err"] += 1
    # both outcomes occur across the corpus of corruptions; neither
    # dominates to 100% (structure bytes vs stream bytes both get hit)
    assert outcomes["ok"] + outcomes["err"] == 80
    assert outcomes["err"] > 0


def test_content_interpreter_fuzz_no_hang():
    """Random operator soup through the content-stream interpreter:
    interpret or raise, never hang."""
    import random

    from open_parse_ray.functions.pdf import _interpret_page

    rng = random.Random(9)
    toks = ["BT", "ET", "Tf", "Td", "TD", "TL", "Tm", "T*", "Tj", "TJ", "'",
            "(abc)", "(x\\)y)", "<414243>", "12", "-3.5", "/F1", "[", "]",
            "q", "Q", "cm", "Do", "%comment", "(", "garbage"]
    for _ in range(150):
        soup = " ".join(rng.choice(toks) for _ in range(rng.randint(1, 40)))
        try:
            _interpret_page(soup.encode("latin-1"), {})
        except Exception:
            pass


### PDF 1.5+: object streams, xref streams, ToUnicode CMaps ###


def _build_pdf15_fixture():
    """Hand-constructed PDF 1.5: catalog/pages/page/font packed in a
    FlateDecode object stream, a top-level content stream, and a
    cross-reference STREAM (W [1 2 1], /Index subsections, PNG Up
    predictor) instead of an xref table. Returns (pdf_bytes, offsets)."""
    import zlib

    inner = {
        10: b"<< /Type /Catalog /Pages 11 0 R >>",
        11: b"<< /Type /Pages /Kids [12 0 R] /Count 1 >>",
        12: b"<< /Type /Page /Parent 11 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 13 0 R >> >> /Contents 2 0 R >>",
        13: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    bodies, offs, pos = [], [], 0
    for num, body in inner.items():
        offs.append(b"%d %d" % (num, pos))
        bodies.append(body)
        pos += len(body) + 1
    header = b" ".join(offs)
    first = len(header) + 1
    payload = header + b"\n" + b"\n".join(bodies) + b"\n"
    zs = zlib.compress(payload)

    content = b"BT /F1 12 Tf 72 720 Td (packed objects speak) Tj ET"

    pdf = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def add(num, obj_bytes):
        offsets[num] = len(pdf)
        pdf.extend(obj_bytes)

    add(
        1,
        b"1 0 obj\n<< /Type /ObjStm /N 4 /First %d /Length %d /Filter /FlateDecode >>\n"
        b"stream\n" % (first, len(zs)) + zs + b"\nendstream\nendobj\n",
    )
    add(
        2,
        b"2 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n",
    )
    # xref stream rows: W [1 2 1] → (type, field2, field3)
    rows = [
        (1, offsets[1], 0),  # obj 1: top level
        (1, offsets[2], 0),  # obj 2: top level
        (1, 0, 0),  # obj 3: itself (offset patched below)
    ] + [(2, 1, i) for i in range(4)]  # objs 10-13: in ObjStm 1, index i
    xref_off = len(pdf)
    rows[2] = (1, xref_off, 0)
    raw = b"".join(
        bytes([t]) + f2.to_bytes(2, "big") + bytes([f3]) for t, f2, f3 in rows
    )
    # PNG Up predictor over 4-byte rows
    stride = 4
    pred = bytearray()
    prev = bytes(stride)
    for i in range(0, len(raw), stride):
        row = raw[i : i + stride]
        pred.append(2)
        pred.extend((row[j] - prev[j]) & 0xFF for j in range(stride))
        prev = row
    zx = zlib.compress(bytes(pred))
    add(
        3,
        b"3 0 obj\n<< /Type /XRef /Size 14 /W [1 2 1] /Index [1 3 10 4] "
        b"/Root 10 0 R /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns 4 >> /Length %d >>\nstream\n" % len(zx)
        + zx
        + b"\nendstream\nendobj\n",
    )
    pdf += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(pdf), offsets


def test_pdf15_object_streams_parse():
    """A PDF 1.5 document whose catalog/pages/page/font live inside a
    compressed object stream (and whose only xref is a stream) extracts
    its text and page count like any other document."""
    pdf, _ = _build_pdf15_fixture()
    from open_parse_ray.functions.pdf import pdf_num_pages

    assert pdf_extracted_text(pdf) == "packed objects speak"
    assert pdf_num_pages(pdf) == 1


def test_xref_stream_decodes_exactly():
    """The /Type /XRef decoder recovers every entry: type-1 rows carry
    the true byte offsets of the top-level objects, type-2 rows the
    (ObjStm number, index) of each packed object, honoring /Index
    subsections, /W widths and the PNG Up predictor."""
    from open_parse_ray.functions.pdf import _xref_stream_entries

    pdf, offsets = _build_pdf15_fixture()
    entries = _xref_stream_entries(pdf)
    assert entries[1] == (1, offsets[1], 0)
    assert entries[2] == (1, offsets[2], 0)
    assert entries[3] == (1, offsets[3], 0)
    for i, num in enumerate((10, 11, 12, 13)):
        assert entries[num] == (2, 1, i)
    assert set(entries) == {1, 2, 3, 10, 11, 12, 13}


def _pdf_with_tounicode(cmap_body: bytes, content_string: bytes):
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/ToUnicode 6 0 R >>\nendobj\n",
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content_string)
        + content_string
        + b"\nendstream\nendobj\n",
        b"6 0 obj\n<< /Length %d >>\nstream\n" % len(cmap_body)
        + cmap_body
        + b"\nendstream\nendobj\n",
    ]
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


def test_tounicode_bfchar_and_bfrange():
    """1-byte codes through bfchar + increment bfrange + array bfrange:
    non-Latin text (Greek, Cyrillic) comes out in Unicode, and unmapped
    codes keep their latin-1 fallback."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"2 beginbfchar\n<41> <0393>\n<42> <03B1>\nendbfchar\n"
        b"2 beginbfrange\n"
        b"<50> <52> <0430>\n"
        b"<60> <61> [<0416> <0429>]\n"
        b"endbfrange\nendcmap\nend\n"
    )
    content = b"BT /F1 12 Tf 72 720 Td (AB PQR `a x) Tj ET"
    pdf = _pdf_with_tounicode(cmap, content)
    # A->GAMMA B->alpha, P/Q/R->a-/b-/v-Cyrillic, `/a->Zhe/Shcha, x unmapped
    assert pdf_extracted_text(pdf) == "Γα абв ЖЩ x"


def test_tounicode_two_byte_codes_and_surrogates():
    """2-byte codespace with a UTF-16BE surrogate-pair destination: hex
    string <...> input decodes through 2-byte codes to astral chars."""
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0001> <D83DDE00>\n<0002> <4F60>\nendbfchar\n"
        b"endcmap\n"
    )
    content = b"BT /F1 12 Tf 72 720 Td <00010002> Tj ET"
    pdf = _pdf_with_tounicode(cmap, content)
    assert pdf_extracted_text(pdf) == "\U0001f600你"


def test_pdf15_fixture_corruption_fuzz_no_hang():
    """The 1.5 fixture under seeded byte flips: every ObjStm/XRef/CMap
    parsing loop must parse or raise within the same strict-advance
    contract as the 1.4 reader — never hang."""
    import random

    from open_parse_ray.functions.pdf import _xref_stream_entries

    base, _ = _build_pdf15_fixture()
    rng = random.Random(11)
    for _ in range(80):
        b = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        for fn in (pdf_extracted_text, _xref_stream_entries):
            try:
                fn(bytes(b))
            except Exception:
                pass


def test_encrypted_pdf_rc4_roundtrips_exactly():
    """RC4 standard-security-handler PDFs (empty user password — the
    ubiquitous owner-restricted case) extract byte-identically to their
    unencrypted source, for both R2/40-bit and R3/128-bit."""
    from open_parse_ray.functions.pdf import (
        encrypt_pdf_rc4,
        pdf_extracted_text,
        typeset_pdf,
    )

    text = (
        "Alpha beta gamma delta epsilon zeta.\n\n"
        "Second paragraph with more words here to wrap lines nicely. " * 4
    )
    plain = typeset_pdf(text, title="Encrypted Test")
    want = pdf_extracted_text(plain)
    assert want
    for r, bits in ((2, 40), (3, 128)):
        enc = encrypt_pdf_rc4(plain, r=r, key_bits=bits)
        assert enc != plain and b"/Encrypt" in enc
        assert pdf_extracted_text(enc) == want
    # byte-deterministic fixture writer (repo invariant: no randomness)
    assert encrypt_pdf_rc4(plain) == encrypt_pdf_rc4(plain)


def test_encrypted_pdf_with_images_roundtrips():
    import numpy as np

    from open_parse_ray.functions.pdf import (
        encrypt_pdf_rc4,
        parse_pdf,
        pdf_extracted_text,
        typeset_pdf,
    )

    img = (np.arange(40 * 30 * 3, dtype=np.uint8).reshape(40, 30, 3) * 3) % 251
    plain = typeset_pdf("Image page follows here.", images=[img])
    enc = encrypt_pdf_rc4(plain, r=3, key_bits=128)
    assert pdf_extracted_text(enc) == pdf_extracted_text(plain)
    imgs_plain = [e for e in parse_pdf(plain) if not hasattr(e, "lines") or e.__class__.__name__ == "ImageElement"]
    imgs_enc = [e for e in parse_pdf(enc) if not hasattr(e, "lines") or e.__class__.__name__ == "ImageElement"]
    assert len(imgs_enc) == len(imgs_plain)


def test_encrypted_pdf_wrong_password_is_counted_error_not_crash():
    import pandas as pd

    from open_parse_ray.functions.pdf import encrypt_pdf_rc4, typeset_pdf
    from open_parse_ray.stages.pdf_text import ParsePdfBytes

    plain = typeset_pdf("Secret words inside this document.")
    enc = encrypt_pdf_rc4(plain, user_pw=b"secret")
    with pytest.raises(ValueError):
        from open_parse_ray.functions.pdf import pdf_extracted_text

        pdf_extracted_text(enc)
    out = ParsePdfBytes()(pd.DataFrame({"doc_id": [1], "pdf_bytes": [enc]}))
    assert out["status"].iloc[0].startswith("error:ValueError")


def test_encrypted_pdf_corruption_fuzz_never_hangs():
    import random

    from open_parse_ray.functions.pdf import (
        encrypt_pdf_rc4,
        pdf_extracted_text,
        typeset_pdf,
    )

    enc = encrypt_pdf_rc4(typeset_pdf("Fuzz target text body. " * 20))
    rng = random.Random(99)
    for trial in range(150):
        data = bytearray(enc)
        if trial % 3 == 0:
            data = data[: rng.randrange(1, len(data))]
        else:
            for _ in range(rng.randrange(1, 8)):
                data[rng.randrange(len(data))] = rng.randrange(256)
        try:
            pdf_extracted_text(bytes(data))
        except Exception:
            pass  # raising is fine; hanging/looping is not
