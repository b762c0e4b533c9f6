"""OCR-path kernels (the pymupdf/tesseract ingest analog).

The reference's OCR engine (reference: src/openparse/text/pymupdf/core.py)
walks fitz OCR output dicts: font-flag bit decoding, span construction,
and a first-match merge of overlapping same-height OCR lines. The OCR
*engine* (tesseract/fitz) is absent from this environment, so the
stateful stage is a stub — but the kernels that define the semantics are
real, pure, and unit-tested, and `OcrIngest` shows the actor-pool wiring
a real engine would use (engine handle in ``__init__``, batch of page
dicts in ``__call__``).
"""

from __future__ import annotations

from typing import Dict, List

from open_parse_ray.model import Bbox, LineElement, TextElement, TextSpan


def flags_decomposer(flags: int) -> str:
    """Human-readable fitz font flags (reference: text/pymupdf/core.py:7-24)."""
    attrs = []
    if flags & 2**0:
        attrs.append("superscript")
    if flags & 2**1:
        attrs.append("italic")
    if flags & 2**2:
        attrs.append("serifed")
    else:
        attrs.append("sans")
    if flags & 2**3:
        attrs.append("monospaced")
    else:
        attrs.append("proportional")
    if flags & 2**4:
        attrs.append("bold")
    return ", ".join(attrs)


def flag_is_bold(flags: int) -> bool:
    """Bit 4 (reference: text/pymupdf/core.py:27-28)."""
    return bool(flags & 2**4)


def flag_is_italic(flags: int) -> bool:
    """Bit 1 (reference: text/pymupdf/core.py:31-32)."""
    return bool(flags & 2**1)


def lines_from_ocr_output(lines, error_margin: float = 0) -> List[LineElement]:
    """Merge overlapping same-height OCR lines, first match wins
    (reference: text/pymupdf/core.py:35-66)."""
    combined: List[LineElement] = []
    for line in lines:
        spans = tuple(
            TextSpan(
                text=span["text"],
                is_bold=flag_is_bold(span["flags"]),
                is_italic=flag_is_italic(span["flags"]),
                size=span["size"],
            )
            for span in line["spans"]
        )
        line_element = LineElement(bbox=tuple(line["bbox"]), spans=spans)
        for i, other in enumerate(combined):
            if line_element.overlaps(
                other, error_margin=error_margin
            ) and line_element.is_at_similar_height(other, error_margin=error_margin):
                combined[i] = line_element.combine(other)
                break
        else:
            combined.append(line_element)
    return combined


def block_to_text_element(
    block: Dict, page_num: int, page_width: float, page_height: float
) -> TextElement:
    """fitz text block dict → TextElement with y-flip to bottom-left origin
    (reference: text/pymupdf/core.py:83-102)."""
    lines = lines_from_ocr_output(block["lines"])
    x0, y0t, x1, y1t = block["bbox"]
    return TextElement(
        text="\n".join(line.text for line in lines),
        lines=tuple(lines),
        bbox=Bbox(
            page=page_num,
            page_height=page_height,
            page_width=page_width,
            x0=x0,
            y0=page_height - y1t,
            x1=x1,
            y1=page_height - y0t,
        ),
    )


class OcrIngest:
    """Actor-pool stage shape for a real OCR engine.

    ``map_batches(OcrIngest, concurrency=(m, n))`` — the engine handle
    would be created once per actor here. Without tesseract/fitz in this
    environment, construction succeeds (so the plumbing is testable with
    pre-computed OCR dicts via :meth:`elements_from_ocr_dict`) but raw
    rasterized-page OCR raises.
    """

    def __init__(self):
        self.engine = None  # a real build would load tesseract/fitz here

    def elements_from_ocr_dict(
        self, page_dict: Dict, page_num: int, page_width: float, page_height: float
    ) -> List[TextElement]:
        return [
            block_to_text_element(b, page_num, page_width, page_height)
            for b in page_dict.get("blocks", ())
            if b.get("type") == 0
        ]

    def __call__(self, batch):
        raise NotImplementedError(
            "no OCR engine in this environment; feed pre-computed OCR dicts "
            "through elements_from_ocr_dict"
        )
