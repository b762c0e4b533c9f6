"""OCR-path kernels (the pymupdf/tesseract ingest analog).

The reference's OCR engine (reference: src/openparse/text/pymupdf/core.py)
walks fitz OCR output dicts: font-flag bit decoding, span construction,
and a first-match merge of overlapping same-height OCR lines. The OCR
*engine* (tesseract/fitz) is absent from this environment; the kernels
that define the semantics are real, pure, and unit-tested, and
`OcrIngest` is a live actor-pool stage: per-actor ``__init__`` probes
for (or accepts) an engine with ``image_to_dict(payload) -> page dict``
and ``__call__`` batches payloads through the same block→TextElement
kernels — tests/test_model_seams.py proves the engine-present branch
with an injected fake.
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


def probe_tesseract():
    """Absolute path of a tesseract binary on PATH, else None (the
    OcrIngest per-actor probe; absent from this container)."""
    import shutil

    return shutil.which("tesseract")


class TesseractShim:
    """Gated tesseract engine: image payload → fitz-textpage-shaped page
    dict via ``tesseract <img> stdout tsv`` (reference contract:
    text/pymupdf/core.py:69-102 ``get_textpage_ocr``). Word rows of one
    (block, par, line) become one line dict with one span each; flags
    are 0 (tesseract TSV carries no font attributes). Constructed only
    when the binary exists; tests drive the identical page-dict shape
    through an injected fake instead."""

    def __init__(self, binary: str):  # pragma: no cover - binary absent here
        self.binary = binary

    def image_to_dict(self, payload: bytes) -> Dict:  # pragma: no cover
        import csv
        import io
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            f.write(payload)
            f.flush()
            out = subprocess.run(
                [self.binary, f.name, "stdout", "tsv"],
                capture_output=True,
                check=True,
            ).stdout.decode("utf-8", "replace")
        lines: Dict[tuple, Dict] = {}
        width = height = 0.0
        for row in csv.DictReader(io.StringIO(out), delimiter="\t"):
            x0, y0 = float(row["left"]), float(row["top"])
            x1 = x0 + float(row["width"])
            y1 = y0 + float(row["height"])
            if int(row["level"]) == 1:  # page row carries the dimensions
                width, height = x1, y1
            if int(row["level"]) != 5 or not row["text"].strip():
                continue
            # numeric key: string TSV fields sort '10' before '2' and
            # would scramble reading order on any 10+-line block
            key = (int(row["block_num"]), int(row["par_num"]), int(row["line_num"]))
            ln = lines.setdefault(
                key, {"bbox": [x0, y0, x1, y1], "spans": []}
            )
            b = ln["bbox"]
            ln["bbox"] = [min(b[0], x0), min(b[1], y0), max(b[2], x1), max(b[3], y1)]
            ln["spans"].append(
                {"text": row["text"], "flags": 0, "size": y1 - y0}
            )
        block = {
            "type": 0,
            "bbox": (0.0, 0.0, width, height),
            "lines": [
                {"bbox": tuple(v["bbox"]), "spans": v["spans"]}
                for _, v in sorted(lines.items())
            ],
        }
        return {"width": width, "height": height, "blocks": [block]}


class OcrIngest:
    """Actor-pool stage for a real OCR engine (reference ingest-with-OCR,
    text/pymupdf/core.py:69-102).

    ``map_batches(OcrIngest, concurrency=(m, n))`` — the engine handle is
    created once per actor in ``__init__``: an injected ``engine`` (any
    object with ``image_to_dict(payload) -> fitz-shaped page dict``),
    else a TesseractShim when the binary is on PATH, else None. With an
    engine, ``__call__`` batches (media_id, payload) rows through
    image_to_dict → block_to_text_element — the SAME span/line-merge/
    y-flip kernels as every other text path — emitting
    (media_id, elem_idx, text, x0, y0, x1, y1, status) rows with per-row
    error isolation. Without one it raises (the plumbing stays testable
    via :meth:`elements_from_ocr_dict` and the injected-fake pytest).
    """

    def __init__(self, engine=None, page_num: int = 0):
        if engine is None:
            binary = probe_tesseract()
            if binary is not None:
                engine = TesseractShim(binary)  # pragma: no cover
        self.engine = engine
        self.page_num = page_num

    def elements_from_ocr_dict(
        self, page_dict: Dict, page_num: int, page_width: float, page_height: float
    ) -> List[TextElement]:
        return [
            block_to_text_element(b, page_num, page_width, page_height)
            for b in page_dict.get("blocks", ())
            if b.get("type") == 0
        ]

    def __call__(self, batch):
        import pyarrow as pa

        if self.engine is None:
            raise NotImplementedError(
                "no OCR engine in this environment; feed pre-computed OCR "
                "dicts through elements_from_ocr_dict"
            )
        ids, idxs, texts = [], [], []
        coords = {"x0": [], "y0": [], "x1": [], "y1": []}
        statuses = []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                pd_ = self.engine.image_to_dict(payload)
                elems = self.elements_from_ocr_dict(
                    pd_, self.page_num, pd_["width"], pd_["height"]
                )
                for ei, el in enumerate(elems):
                    ids.append(media_id)
                    idxs.append(ei)
                    texts.append(el.text)
                    coords["x0"].append(el.bbox.x0)
                    coords["y0"].append(el.bbox.y0)
                    coords["x1"].append(el.bbox.x1)
                    coords["y1"].append(el.bbox.y1)
                    statuses.append("ok")
            except Exception as exc:
                ids.append(media_id)
                idxs.append(-1)
                texts.append("")
                for k in coords:
                    coords[k].append(0.0)
                statuses.append(f"error:{type(exc).__name__}")
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(idxs, pa.int32()),
                pa.array(texts, pa.string()),
                pa.array(coords["x0"], pa.float64()),
                pa.array(coords["y0"], pa.float64()),
                pa.array(coords["x1"], pa.float64()),
                pa.array(coords["y1"], pa.float64()),
                pa.array(statuses, pa.string()),
            ],
            names=[
                "media_id", "elem_idx", "text", "x0", "y0", "x1", "y1", "status",
            ],
        )
