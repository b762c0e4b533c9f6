"""OCR kernel semantics (reference: text/pymupdf/core.py): font-flag bit
decode, overlapping same-height line merge, y-flip block conversion."""

from open_parse_ray.functions.ocr import (
    OcrIngest,
    block_to_text_element,
    flag_is_bold,
    flag_is_italic,
    flags_decomposer,
    lines_from_ocr_output,
)


def _span(text, flags=0, size=12.0):
    return {"text": text, "flags": flags, "size": size}


def test_flag_bits():
    assert flag_is_bold(2**4) and not flag_is_bold(2**1)
    assert flag_is_italic(2**1) and not flag_is_italic(2**4)
    assert flags_decomposer(2**1 | 2**4) == "italic, sans, proportional, bold"
    assert flags_decomposer(0) == "sans, proportional"


def test_overlapping_same_height_lines_merge():
    lines = [
        {"bbox": (0, 100, 50, 112), "spans": [_span("Hello ")]},
        {"bbox": (40, 100, 90, 112), "spans": [_span("World")]},  # overlaps
        {"bbox": (0, 60, 50, 72), "spans": [_span("Lower")]},  # different height
    ]
    out = lines_from_ocr_output(lines)
    assert len(out) == 2
    merged = out[0]
    assert merged.bbox == (0, 100, 90, 112)
    texts = {le.text for le in out}
    assert "Lower" in texts


def test_non_overlapping_lines_kept_separate():
    lines = [
        {"bbox": (0, 100, 30, 112), "spans": [_span("a")]},
        {"bbox": (60, 100, 90, 112), "spans": [_span("b")]},
    ]
    assert len(lines_from_ocr_output(lines)) == 2


def test_block_conversion_flips_y():
    block = {
        "type": 0,
        "bbox": (10.0, 20.0, 200.0, 50.0),  # top-left origin
        "lines": [{"bbox": (10, 20, 200, 40), "spans": [_span("text", 2**4)]}],
    }
    el = block_to_text_element(block, page_num=3, page_width=612.0, page_height=792.0)
    assert el.bbox.page == 3
    assert el.bbox.y0 == 792.0 - 50.0 and el.bbox.y1 == 792.0 - 20.0
    assert el.lines[0].spans[0].is_bold
    # LineElement.text applies markdown style markers (schemas.py:122-138)
    assert el.text == "**text**"


def test_actor_shape():
    import pytest

    stage = OcrIngest()
    page = {"blocks": [
        {"type": 0, "bbox": (0, 0, 100, 20),
         "lines": [{"bbox": (0, 0, 100, 20), "spans": [_span("x")]}]},
        {"type": 1, "bbox": (0, 0, 10, 10), "lines": []},  # image block skipped
    ]}
    els = stage.elements_from_ocr_dict(page, 0, 612.0, 792.0)
    assert len(els) == 1
    with pytest.raises(NotImplementedError):
        stage(None)


# --- real OCR engine (stages/ocr_vision.py) --------------------------------


def test_ocr_roundtrip_random_strings():
    """OCR(render(text)) == text exactly, incl. interior multi-spaces,
    single-char lines, and every charset member."""
    import random

    from open_parse_ray.stages.ocr_vision import CHARSET, ocr_image, render_text_image

    # every glyph at least once
    got = [t for t, _ in ocr_image(render_text_image([CHARSET[:16], CHARSET[16:32], CHARSET[32:]]))]
    assert got == [CHARSET[:16], CHARSET[16:32], CHARSET[32:]]

    rng = random.Random(7)
    alphabet = CHARSET + " "
    for _ in range(60):
        lines = []
        for _ in range(rng.randint(1, 3)):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16))).strip()
            if s:
                lines.append(s)
        if not lines:
            continue
        assert [t for t, _ in ocr_image(render_text_image(lines))] == lines


def test_ocr_pipeline_recovers_document_text(ray_session):
    """End-to-end: every document's normalized text, typeset to a page
    image and OCR'd through the Ray pipeline, comes back EXACTLY."""
    import pandas as pd

    from open_parse_ray.stages.ocr_vision import normalize_text, ocr_pipeline

    sf = "/root/testdata/sf0.001"
    out = ocr_pipeline(sf).to_pandas()
    assert (out["status"] == "ok").all()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    truth = {int(r.doc_id): normalize_text(r.text) for r in docs.itertuples()}
    recovered = {
        mid: list(g.sort_values("line_idx")["text"])
        for mid, g in out.groupby("media_id")
    }
    checked = 0
    for doc_id, lines in truth.items():
        if not lines:
            assert doc_id not in recovered
            continue
        assert recovered[doc_id] == lines, doc_id
        checked += 1
    assert checked > 100
