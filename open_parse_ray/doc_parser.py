"""Top-level single-document API facade — the reference's entry point.

Mirrors ``DocumentParser.parse`` (reference: src/openparse/doc_parser.py:
52-126) and ``ParsedDocument`` (src/openparse/schemas.py:686-762) over
this engine's payload types: HTML text (the web corpus payload), real
PDF bytes (functions/pdf.py), and BMP page images through the OCR
engine (the ``ocr=True`` path analog). Pipeline-selection semantics are
the reference's exactly: ``NOT_GIVEN`` → BasicIngestionPipeline,
``None`` → NoOpIngestionPipeline, otherwise the given pipeline
(doc_parser.py:63-81). ``table_args`` accepts the reference's TypedDict
shapes (doc_parser.py:19-49) and validates the algorithm name.

Engine-wide determinism rule: ``id_`` is a content hash, not uuid4
(the reference's uuid is the one place randomness appears in results;
see SCALE.md §7 — identical inputs must produce identical rows at any
parallelism).

The corpus-scale path (pipelines/extraction.py) uses the same kernels;
this facade is the drop-in for the reference's one-file workflow.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
from typing import List, Optional, Union

from open_parse_ray import consts
from open_parse_ray.model import Node

NOT_GIVEN = object()

_VALID_ALGORITHMS = ("pymupdf", "table-transformers", "unitable")
_VALID_TABLE_FORMATS = ("markdown", "html")


class ParsedDocument:
    """Parse result (reference: schemas.py:686-762): nodes + file
    metadata. ``id_`` is a deterministic content hash (see module doc)."""

    def __init__(
        self,
        nodes: List[Node],
        filename: str = "",
        num_pages: int = 0,
        coordinate_system: str = consts.COORDINATE_SYSTEM,
        table_parsing_kwargs: Optional[dict] = None,
        creation_date: Optional[dt.date] = None,
        last_modified_date: Optional[dt.date] = None,
        last_accessed_date: Optional[dt.date] = None,
        file_size: Optional[int] = None,
    ):
        self.nodes = list(nodes)
        self.filename = filename
        self.num_pages = num_pages
        self.coordinate_system = coordinate_system
        self.table_parsing_kwargs = table_parsing_kwargs
        self.creation_date = creation_date
        self.last_modified_date = last_modified_date
        self.last_accessed_date = last_accessed_date
        self.file_size = file_size
        h = hashlib.sha1()
        h.update(filename.encode())
        for n in self.nodes:
            h.update(n.text.encode("utf-8", "ignore"))
            h.update(b"\x00")
        self.id_ = h.hexdigest()[:32]

    @property
    def text(self) -> str:
        return "\n\n".join(n.text for n in self.nodes)

    def dict(self) -> dict:
        return {
            "id_": self.id_,
            "filename": self.filename,
            "num_pages": self.num_pages,
            "coordinate_system": self.coordinate_system,
            "file_size": self.file_size,
            "nodes": [
                {
                    "text": n.text,
                    "tokens": n.tokens,
                    "start_page": n.start_page,
                    "end_page": n.end_page,
                }
                for n in self.nodes
            ],
        }


def _validate_table_args(table_args) -> Optional[dict]:
    if table_args is NOT_GIVEN or table_args is None:
        return None
    algo = table_args.get("parsing_algorithm")
    if algo not in _VALID_ALGORITHMS:
        raise ValueError(f"Unsupported parsing_algorithm: {algo}")
    fmt = table_args.get("table_output_format", "markdown")
    if fmt not in _VALID_TABLE_FORMATS:
        raise ValueError(f"Unsupported table_output_format: {fmt}")
    return dict(table_args)


class DocumentParser:
    """Single-document parser (reference: doc_parser.py:52-126).

    ``parse`` accepts a file path OR an in-memory payload; the payload
    type is sniffed: ``%PDF`` → the stdlib PDF reader, ``BM`` (BMP page
    image) with ``ocr=True`` → the OCR engine, anything else → the HTML
    layout engine (the web-corpus payload of this engine's north star).
    """

    _verbose: bool = False

    def __init__(self, *, processing_pipeline=NOT_GIVEN, table_args=NOT_GIVEN):
        from open_parse_ray.functions.transforms import (
            BasicIngestionPipeline,
            NoOpIngestionPipeline,
        )

        if processing_pipeline is NOT_GIVEN:
            self.processing_pipeline = BasicIngestionPipeline()
        elif processing_pipeline is None:
            self.processing_pipeline = NoOpIngestionPipeline()
        else:
            self.processing_pipeline = processing_pipeline
        self.table_args = _validate_table_args(table_args)

    # -- payload → elements ------------------------------------------------
    def _elements(self, payload: Union[str, bytes], ocr: bool):
        if isinstance(payload, bytes) and payload[:5] == b"%PDF-":
            if ocr:
                # the reference's parse(ocr=True) path (doc_parser.py:91-100,
                # "inherently slower and less accurate"): rasterize pages
                # with the bitmap typeface, then recognize — exercises the
                # full PDF→image→OCR loop instead of direct text extraction
                from open_parse_ray.functions.pdf import Pdf

                els = []
                for page_img in Pdf(payload).to_imgs():
                    els.extend(self._ocr_elements(page_img))
                return els
            from open_parse_ray.functions.pdf import parse_pdf

            return parse_pdf(payload)
        if isinstance(payload, bytes) and payload[:2] == b"BM":
            if not ocr:
                raise ValueError(
                    "image payload requires ocr=True (reference: pymupdf OCR path)"
                )
            return self._ocr_elements(payload)
        if isinstance(payload, bytes):
            payload = payload.decode("utf-8", "replace")
        from open_parse_ray.functions.html import html_to_elements

        fmt = (self.table_args or {}).get("table_output_format", "markdown")
        return html_to_elements(payload, table_output_format=fmt)

    def _ocr_elements(self, payload: bytes):
        from open_parse_ray.functions.ocr import lines_from_ocr_output
        from open_parse_ray.model import Bbox, TextElement
        from open_parse_ray.stages.ocr_vision import ocr_image

        raw = ocr_image(payload)
        fitz_lines = [
            {
                "bbox": (x0, y0, x1 + 1, y1 + 1),
                "spans": [{"text": t, "flags": 0, "size": 7.0}],
            }
            for t, (x0, y0, x1, y1) in raw
        ]
        lines = lines_from_ocr_output(fitz_lines)
        if not lines:
            return []
        x0 = min(le.bbox[0] for le in lines)
        y0 = min(le.bbox[1] for le in lines)
        x1 = max(le.bbox[2] for le in lines)
        y1 = max(le.bbox[3] for le in lines)
        return [
            TextElement(
                text="\n".join(le.text for le in lines),
                lines=tuple(lines),
                bbox=Bbox(
                    page=0,
                    page_height=consts.PAGE_HEIGHT,
                    page_width=consts.PAGE_WIDTH,
                    x0=x0,
                    y0=y0,
                    x1=x1,
                    y1=y1,
                ),
            )
        ]

    def parse(
        self,
        file: Union[str, bytes, None] = None,
        ocr: bool = False,
    ) -> ParsedDocument:
        """Parse one document (reference: doc_parser.py:83-126): payload →
        elements → one Node per element → pipeline fold → ParsedDocument
        with file metadata when a real path was given."""
        filename = ""
        file_size = None
        creation = modified = accessed = None
        payload: Union[str, bytes]
        if isinstance(file, str) and os.path.exists(file):
            filename = os.path.basename(file)
            st = os.stat(file)
            file_size = st.st_size
            # reference formats dates as %Y-%m-%d strings (pdf.py:66-86)
            creation = dt.datetime.fromtimestamp(st.st_ctime).strftime("%Y-%m-%d")
            modified = dt.datetime.fromtimestamp(st.st_mtime).strftime("%Y-%m-%d")
            accessed = dt.datetime.fromtimestamp(st.st_atime).strftime("%Y-%m-%d")
            with open(file, "rb") as f:
                payload = f.read()
        elif file is not None:
            payload = file
        else:
            raise ValueError("parse() needs a path or an in-memory payload")

        elements = self._elements(payload, ocr)
        nodes = self.processing_pipeline.run([Node(elements=(e,)) for e in elements])
        num_pages = max((n.end_page for n in nodes), default=-1) + 1
        return ParsedDocument(
            nodes=nodes,
            filename=filename,
            num_pages=num_pages,
            coordinate_system=consts.COORDINATE_SYSTEM,
            table_parsing_kwargs=self.table_args,
            creation_date=creation,
            last_modified_date=modified,
            last_accessed_date=accessed,
            file_size=file_size,
        )
