"""DocumentParser facade gates (reference: src/openparse/doc_parser.py:
52-126, src/tests/test_doc_parser.py:6-60): pipeline-selection
semantics, payload dispatch (HTML / PDF bytes / OCR image), metadata,
and identity with the corpus-scale kernels."""

import pytest

from open_parse_ray.doc_parser import DocumentParser, ParsedDocument


def test_pipeline_selection_semantics():
    from open_parse_ray.functions.transforms import (
        BasicIngestionPipeline,
        NoOpIngestionPipeline,
    )

    assert isinstance(DocumentParser().processing_pipeline, BasicIngestionPipeline)
    assert isinstance(
        DocumentParser(processing_pipeline=None).processing_pipeline,
        NoOpIngestionPipeline,
    )
    custom = BasicIngestionPipeline()
    assert DocumentParser(processing_pipeline=custom).processing_pipeline is custom


def test_table_args_validation():
    DocumentParser(table_args={"parsing_algorithm": "pymupdf"})
    DocumentParser(
        table_args={
            "parsing_algorithm": "table-transformers",
            "table_output_format": "html",
        }
    )
    with pytest.raises(ValueError):
        DocumentParser(table_args={"parsing_algorithm": "nope"})
    with pytest.raises(ValueError):
        DocumentParser(
            table_args={"parsing_algorithm": "pymupdf", "table_output_format": "xml"}
        )


def test_parse_html_matches_corpus_kernel():
    from open_parse_ray.pipelines.extraction import parse_page
    from open_parse_ray.sources.pages import gen_html

    html = gen_html(7)["html"]
    doc = DocumentParser().parse(html)
    want = parse_page(html)
    assert [n.text for n in doc.nodes] == [n.text for n in want]
    assert doc.num_pages == max((n.end_page for n in want), default=-1) + 1
    # deterministic content-hash id
    assert doc.id_ == DocumentParser().parse(html).id_


def test_parse_pdf_bytes_matches_pdf_kernel():
    from open_parse_ray.functions.pdf import typeset_pdf
    from open_parse_ray.stages.pdf_text import parse_pdf_page

    pdf = typeset_pdf("many words in this body " * 40, title="Head")
    doc = DocumentParser().parse(pdf)
    want = parse_pdf_page(pdf)
    assert [n.text for n in doc.nodes] == [n.text for n in want]


def test_parse_path_collects_metadata(tmp_path):
    from open_parse_ray.sources.pages import gen_html

    p = tmp_path / "page.html"
    p.write_text(gen_html(3)["html"])
    doc = DocumentParser().parse(str(p))
    assert doc.filename == "page.html"
    assert doc.file_size == p.stat().st_size
    assert len(doc.creation_date.split("-")) == 3  # %Y-%m-%d
    d = doc.dict()
    assert d["filename"] == "page.html" and len(d["nodes"]) == len(doc.nodes)


def test_parse_ocr_image_payload():
    from open_parse_ray.stages.ocr_vision import render_text_image

    payload = render_text_image(["HELLO WORLD 123"])
    with pytest.raises(ValueError):
        DocumentParser().parse(payload)  # image requires ocr=True
    doc = DocumentParser(processing_pipeline=None).parse(payload, ocr=True)
    assert any("HELLO WORLD 123" in n.text for n in doc.nodes)


def test_top_level_api_surface():
    """The reference's `openparse` namespace maps onto `open_parse_ray`:
    DocumentParser, ParsedDocument, Node, pipelines, config."""
    import open_parse_ray as opr

    assert opr.DocumentParser is DocumentParser
    assert opr.ParsedDocument is ParsedDocument
    assert opr.Node is not None
    assert opr.BasicIngestionPipeline is not None
    assert opr.config.get_device() == "cpu"
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        opr.config.set_device("cuda")  # torch absent → reference error
    with _pytest.raises(ValueError):
        opr.config.set_device("tpu")
    opr.config.set_device("cpu")


def test_table_output_format_honored():
    """table_args.table_output_format switches TableElement rendering
    (reference doc_parser.py:31-34 semantics); default stays markdown."""
    html = (
        "<html><body><p>intro text " + "w " * 60 + "</p>"
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table></body></html>"
    )
    md_doc = DocumentParser(processing_pipeline=None).parse(html)
    md_tables = [n for n in md_doc.nodes if "table" in n.variant]
    assert md_tables and md_tables[0].text.startswith("|")

    html_doc = DocumentParser(
        processing_pipeline=None,
        table_args={"parsing_algorithm": "pymupdf", "table_output_format": "html"},
    ).parse(html)
    html_tables = [n for n in html_doc.nodes if "table" in n.variant]
    assert html_tables and html_tables[0].text.startswith('<table border="1">')


def test_parse_pdf_with_ocr_path():
    """parse(pdf, ocr=True) routes through rasterize→OCR (the pymupdf
    OCR analog): recognized text matches the typeset content for
    typeface-charset input."""
    from open_parse_ray.functions.pdf import typeset_pdf

    text = "OCR PATH WORDS 42 GO HERE. " * 30
    pdf = typeset_pdf(text)
    doc = DocumentParser(processing_pipeline=None).parse(pdf, ocr=True)
    got = " ".join(" ".join(n.text.split()) for n in doc.nodes)
    assert " ".join(text.split()) == got
