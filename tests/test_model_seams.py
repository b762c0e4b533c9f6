"""Injected-fake proofs for the env-gated model-swap seams.

torch/transformers/tesseract are absent from this container, so the
gated branches (DetrTableEngine, TesseractShim probe) would otherwise
be dead code in CI. These tests install FAKE torch + transformers
modules into sys.modules (and a fake OCR engine object) and drive the
REAL gated classes end to end: per-actor from_pretrained load, per-image
forward with the reference's preprocessing (MaxResize + ImageNet
normalization, ml.py:68-82), numpy post-processing
(detr_outputs_to_objects == ml.py:130-150), crop/pad back-transform,
and the OCR block→TextElement kernels. The fake models genuinely
COMPUTE their answers from the input tensor (denormalize → find ink),
so a plumbing break — wrong tensor layout, wrong normalization, wrong
coordinate space — fails the exact-equality assertions.

Reference contract: src/openparse/tables/table_transformers/ml.py:39-66
(model load), 97-200 (outputs→objects, find_table_bboxes);
src/openparse/text/pymupdf/core.py:69-102 (OCR ingest).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pyarrow as pa
import pytest

from open_parse_ray.stages.table_vision import (
    DETECTION_MODEL_ID,
    STRUCTURE_MODEL_ID,
    _DETR_MEAN,
    _DETR_STD,
    TableStructure,
    analyze_table_image,
    detr_outputs_to_objects,
    make_table_image,
    maybe_detr_engine,
)


# ---------------------------------------------------------------------------
# fake torch + transformers
# ---------------------------------------------------------------------------


class _FakeNoGrad:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _fake_torch() -> types.ModuleType:
    m = types.ModuleType("torch")
    m.float32 = np.float32
    m.tensor = lambda x, dtype=None: np.asarray(x, dtype=dtype)
    m.no_grad = _FakeNoGrad
    return m


def _denorm(t) -> np.ndarray:
    """(1, 3, H, W) normalized float tensor → (H, W, 3) pixel array.
    Inverts the engine's preprocessing; also asserts the NCHW layout."""
    x = np.asarray(t)
    assert x.ndim == 4 and x.shape[0] == 1 and x.shape[1] == 3, x.shape
    img = x[0].transpose(1, 2, 0).astype(np.float64)
    return img * _DETR_STD + _DETR_MEAN  # 0..1 scale


class _Out(dict):
    """Forward output: .logits attribute + ['pred_boxes'] item, the two
    access paths the engine (and the reference) uses."""

    def __init__(self, logits, boxes):
        super().__init__(pred_boxes=boxes)
        self.logits = logits


def _onehot_logits(n_objects: int, label_idx: int, n_labels: int) -> np.ndarray:
    lg = np.zeros((1, n_objects, n_labels + 1), dtype=np.float64)
    lg[0, :, label_idx] = 10.0  # softmax ≈ 0.9999 — above every threshold
    return lg


def _ink_runs(profile: np.ndarray, threshold: float) -> list:
    """First index of each run of consecutive above-threshold positions
    (the resized-space mirror of grid_from_projections' collapse)."""
    idx = np.nonzero(profile > threshold)[0]
    runs = []
    for v in idx.tolist():
        if not runs or v > runs[-1][-1] + 1:
            runs.append([v])
        else:
            runs[-1].append(v)
    return [r[0] for r in runs]


class _FakeDetectionModel:
    """Computes the table box FROM the input tensor: denormalize, find
    ink, emit one high-confidence normalized cxcywh 'table' box plus one
    'no object' query (exercising the drop rule)."""

    def __init__(self):
        self.config = types.SimpleNamespace(id2label={0: "table", 1: "table rotated"})
        self.n_forward = 0

    def __call__(self, t):
        self.n_forward += 1
        img = _denorm(t) * 255.0
        ink = (img < 128).all(axis=2)
        ys, xs = np.nonzero(ink)
        nh, nw = ink.shape
        x0, x1 = xs.min() / nw, (xs.max() + 1) / nw
        y0, y1 = ys.min() / nh, (ys.max() + 1) / nh
        boxes = np.array(
            [[[(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0],
              [0.5, 0.5, 0.1, 0.1]]]
        )
        lg = np.zeros((1, 2, 3), dtype=np.float64)
        lg[0, 0, 0] = 10.0  # query 0: 'table'
        lg[0, 1, 2] = 10.0  # query 1: 'no object' — must be dropped
        return _Out(lg, boxes)


class _FakeStructureModel:
    """Computes row/column gridline boxes FROM the input crop tensor:
    full-extent ink rows/cols → one 'table row' box per row band and one
    'table column' box per column band, normalized to the crop."""

    def __init__(self):
        self.config = types.SimpleNamespace(
            id2label={0: "table row", 1: "table column", 2: "table"}
        )
        self.n_forward = 0

    def __call__(self, t):
        self.n_forward += 1
        img = _denorm(t) * 255.0
        ink = (img < 128).all(axis=2)
        ys, xs = np.nonzero(ink)
        ink_h = ys.max() - ys.min() + 1
        ink_w = xs.max() - xs.min() + 1
        nh, nw = ink.shape
        row_lines = _ink_runs(ink.sum(axis=1), 0.9 * ink_w)
        col_lines = _ink_runs(ink.sum(axis=0), 0.9 * ink_h)
        boxes, labels = [], []
        for i in range(len(row_lines) - 1):
            y0, y1 = row_lines[i] / nh, row_lines[i + 1] / nh
            boxes.append([0.5, (y0 + y1) / 2, 1.0, y1 - y0])
            labels.append(0)
        for i in range(len(col_lines) - 1):
            x0, x1 = col_lines[i] / nw, col_lines[i + 1] / nw
            boxes.append([(x0 + x1) / 2, 0.5, x1 - x0, 1.0])
            labels.append(1)
        lg = np.zeros((1, len(boxes), 4), dtype=np.float64)
        for i, li in enumerate(labels):
            lg[0, i, li] = 10.0
        return _Out(lg, np.array([boxes]))


def _install_fakes(monkeypatch):
    """sys.modules fakes for torch + transformers; returns the loaded
    model registry so tests can assert load/forward counts."""
    loads = []

    class _AutoDet:
        @staticmethod
        def from_pretrained(model_id, revision=None):
            loads.append((model_id, revision))
            return _FakeDetectionModel()

    class _TTFOD:
        @staticmethod
        def from_pretrained(model_id, revision=None):
            loads.append((model_id, revision))
            return _FakeStructureModel()

    tr = types.ModuleType("transformers")
    tr.AutoModelForObjectDetection = _AutoDet
    tr.TableTransformerForObjectDetection = _TTFOD
    monkeypatch.setitem(sys.modules, "torch", _fake_torch())
    monkeypatch.setitem(sys.modules, "transformers", tr)
    return loads


# ---------------------------------------------------------------------------
# DETR seam
# ---------------------------------------------------------------------------


def test_detr_outputs_to_objects_matches_reference_semantics():
    """Pure-numpy conversion: softmax scores, 'no object' dropped,
    cxcywh→xyxy pixel rescale (ml.py:97-150)."""
    logits = np.array([[[4.0, 0.0, 0.0], [0.0, 0.0, 9.0]]])
    boxes = np.array([[[0.5, 0.5, 0.5, 0.25], [0.1, 0.1, 0.05, 0.05]]])
    objs = detr_outputs_to_objects(
        logits, boxes, (200, 100), {0: "table", 1: "x", 2: "no object"}
    )
    assert len(objs) == 1  # the 'no object' query is dropped
    (o,) = objs
    assert o["label"] == "table"
    e = np.exp([4.0, 0.0, 0.0])
    assert o["score"] == pytest.approx(float(e[0] / e.sum()))
    assert o["bbox"] == pytest.approx([50.0, 37.5, 150.0, 62.5])


def test_fake_torch_detr_engine_equals_cv_analog(monkeypatch):
    """The gated branch, end to end with fake torch/transformers:
    probe → per-actor from_pretrained (both models, no_timm revision) →
    per-image forward → shared crop/pad/back-transform. Because the fake
    models compute from the denormalized input tensor, equality with the
    CV-analog output proves the preprocessing, tensor layout, coordinate
    space, and back-transform plumbing all round-trip."""
    loads = _install_fakes(monkeypatch)
    engine = maybe_detr_engine()
    assert engine is not None
    assert sorted(loads) == sorted(
        [(DETECTION_MODEL_ID, "no_timm"), (STRUCTURE_MODEL_ID, "no_timm")]
    )

    for i in range(8):
        payload, _truth = make_table_image(i)
        got = analyze_table_image(payload, engine=engine)
        want = analyze_table_image(payload)  # CV analog
        assert got == want, i

    assert engine.detection_model.n_forward == 8
    assert engine.structure_model.n_forward == 8


def test_fake_torch_table_structure_stage_auto_probes(monkeypatch):
    """TableStructure's default per-actor __init__ constructs the DETR
    engine when the stack imports, and the stage batch output is
    identical to the analog stage — same schema, same rows, errors
    still isolated per row."""
    _install_fakes(monkeypatch)
    batch_rows = []
    for i in range(4):
        payload, _ = make_table_image(i)
        batch_rows.append({"media_id": i, "payload": payload})
    batch_rows.append({"media_id": 99, "payload": b"not a bmp"})
    batch = pa.Table.from_pylist(batch_rows)

    detr_stage = TableStructure()  # auto-probe finds the fakes
    assert detr_stage.engine is not None
    analog_stage = TableStructure(auto_probe=False)
    assert analog_stage.engine is None

    got = detr_stage(batch).to_pylist()
    want = analog_stage(batch).to_pylist()
    assert got == want
    assert got[-1]["status"].startswith("error:")


def test_probe_absent_means_analog(monkeypatch):
    """Without the fakes (this container), the probe yields None and the
    default stage runs the analog — the production configuration."""
    assert maybe_detr_engine() is None
    assert TableStructure().engine is None


# ---------------------------------------------------------------------------
# OCR engine seam
# ---------------------------------------------------------------------------


class _FakeOcrEngine:
    """image_to_dict backed by the in-repo bitmap OCR — a genuine
    image→text computation behind the tesseract page-dict contract."""

    def __init__(self):
        self.n_calls = 0

    def image_to_dict(self, payload: bytes):
        from open_parse_ray.stages.multimodal import decode_bmp
        from open_parse_ray.stages.ocr_vision import GLYPH_H, ocr_image

        self.n_calls += 1
        img = decode_bmp(payload)
        h, w = img.shape[:2]
        lines = [
            {
                "bbox": (float(x0), float(y0), float(x1 + 1), float(y1 + 1)),
                "spans": [{"text": t, "flags": 0, "size": float(GLYPH_H)}],
            }
            for t, (x0, y0, x1, y1) in ocr_image(payload)
        ]
        block = {"type": 0, "bbox": (0.0, 0.0, float(w), float(h)), "lines": lines}
        return {"width": float(w), "height": float(h), "blocks": [block]}


def test_ocr_ingest_with_injected_engine_recovers_text():
    """OcrIngest with an engine: payload batches flow image_to_dict →
    block_to_text_element (same span/line-merge/y-flip kernels) into
    per-element rows; a poison row errors in place. Text recovery is
    exact because the fake engine really OCRs the rendered pixels."""
    from open_parse_ray.functions.ocr import OcrIngest
    from open_parse_ray.stages.ocr_vision import normalize_text, render_text_image

    texts = ["hello seam world", "the quick brown fox jumps over it"]
    rows = []
    want_lines = {}
    for i, t in enumerate(texts):
        lines = normalize_text(t)
        want_lines[i] = lines
        rows.append({"media_id": i, "payload": render_text_image(lines)})
    rows.append({"media_id": 9, "payload": b"\x00bad"})

    engine = _FakeOcrEngine()
    stage = OcrIngest(engine=engine)
    out = stage(pa.Table.from_pylist(rows)).to_pylist()

    assert engine.n_calls == 3
    ok = [r for r in out if r["status"] == "ok"]
    bad = [r for r in out if r["status"] != "ok"]
    assert len(bad) == 1 and bad[0]["media_id"] == 9 and bad[0]["elem_idx"] == -1
    for i in want_lines:
        got = [r for r in ok if r["media_id"] == i]
        assert len(got) == 1  # one page block per payload
        assert got[0]["text"] == "\n".join(want_lines[i])
        # y-flip contract: bbox is bottom-left origin, inside the page
        assert 0.0 <= got[0]["y0"] <= got[0]["y1"]


def test_ocr_ingest_probe_branches(monkeypatch):
    """No engine + no binary → NotImplementedError per batch (the
    counted-error contract upstream); a present binary → TesseractShim
    constructed in the per-actor __init__ without being invoked."""
    import open_parse_ray.functions.ocr as ocr_mod

    stage = ocr_mod.OcrIngest()
    assert stage.engine is None
    with pytest.raises(NotImplementedError):
        stage(pa.Table.from_pylist([{"media_id": 0, "payload": b""}]))

    monkeypatch.setattr(ocr_mod, "probe_tesseract", lambda: "/usr/bin/tesseract")
    probed = ocr_mod.OcrIngest()
    assert isinstance(probed.engine, ocr_mod.TesseractShim)
    assert probed.engine.binary == "/usr/bin/tesseract"


def test_tesseract_shim_tsv_parse(monkeypatch):
    """TesseractShim's TSV→page-dict conversion, driven by a stubbed
    subprocess: level-1 page row sets dimensions, level-5 word rows
    group into (block, par, line) line dicts with unioned bboxes."""
    import subprocess

    from open_parse_ray.functions.ocr import TesseractShim

    # line_num 10 present: keys must sort NUMERICALLY (string keys
    # would order '10' before '2' and scramble reading order)
    tsv = (
        "level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\t"
        "left\ttop\twidth\theight\tconf\ttext\n"
        "1\t1\t0\t0\t0\t0\t0\t0\t200\t100\t-1\t\n"
        "5\t1\t1\t1\t1\t1\t10\t20\t30\t10\t96\tHello\n"
        "5\t1\t1\t1\t1\t2\t45\t20\t40\t10\t95\tworld\n"
        "5\t1\t1\t1\t2\t1\t10\t40\t50\t10\t91\tsecond\n"
        "5\t1\t1\t1\t10\t1\t10\t90\t20\t10\t90\tlast\n"
    )

    def fake_run(cmd, capture_output=True, check=True):
        assert cmd[0] == "/fake/tesseract" and cmd[2:] == ["stdout", "tsv"]
        return types.SimpleNamespace(stdout=tsv.encode())

    monkeypatch.setattr(subprocess, "run", fake_run)
    shim = TesseractShim.__new__(TesseractShim)
    shim.binary = "/fake/tesseract"
    page = shim.image_to_dict(b"png-bytes")
    assert page["width"] == 200.0 and page["height"] == 100.0
    (block,) = page["blocks"]
    assert block["type"] == 0
    assert [ln["bbox"] for ln in block["lines"]] == [
        (10.0, 20.0, 85.0, 30.0),
        (10.0, 40.0, 60.0, 50.0),
        (10.0, 90.0, 30.0, 100.0),
    ]
    assert [s["text"] for s in block["lines"][0]["spans"]] == ["Hello", "world"]
    assert block["lines"][2]["spans"][0]["text"] == "last"
