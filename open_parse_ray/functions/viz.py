"""Debug bbox-overlay sink: node bounding boxes rendered as SVG.

The reference draws node bboxes onto rasterized PDF pages for visual
inspection (reference: src/openparse/pdf.py:152-240 `export_with_bboxes`
/ `_draw_bboxes`, with the bottom-left→top-left flip in
`_flip_coordinates` :44-63). No raster image libraries exist in this
environment, so the same sink is realized as pure-text SVG overlays —
one SVG document per (url, page) with one rect per node bbox, y-flipped
exactly like the reference's coordinate flip. Colors are deterministic
per node variant (the reference used `_random_color`, pdf.py:24-29;
randomness is excised engine-wide — see SCALE.md §7).

Runs as a stateless ``map_batches`` stage over the PAGES dataset
(parse + render fused per batch, like the reference's parse + draw
loop), streaming straight to a partitioned sink.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

_VARIANT_COLORS = {
    "text": "#1f77b4",
    "table": "#d62728",
    "image": "#2ca02c",
}


def display_cells_svg(
    cells: List[dict],
    img_width: int,
    img_height: int,
    show_cell_types: str = "all",
    use_blank_image: bool = False,
    min_cell_confidence: float = 0.95,
) -> str:
    """Per-cell debug overlay, the `display_cells_on_img` analog
    (reference: tables/utils.py:78-115): red rects over a table-image
    frame, filtered by cell kind and confidence. ``cells`` entries carry
    (x0, y0, x1, y1, kind in {'header','row','column'}, confidence) in
    top-left IMAGE coordinates — no y-flip, unlike the node overlay.
    ``use_blank_image`` keeps only the white frame, like the reference's
    blank-image mode."""
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{img_width}" height="{img_height}" '
        f'viewBox="0 0 {img_width} {img_height}">',
        f'<rect x="0" y="0" width="{img_width}" height="{img_height}" '
        f'fill="white" stroke="#999" stroke-width="1"/>'
        if use_blank_image
        else f'<rect x="0" y="0" width="{img_width}" height="{img_height}" '
        f'fill="#eee" stroke="#999" stroke-width="1"/>',
    ]
    want = {
        "all": {"header", "row", "column"},
        "headers": {"header"},
        "rows": {"row"},
        "columns": {"column"},
    }[show_cell_types]
    for c in cells:
        if c.get("confidence", 1.0) < min_cell_confidence:
            continue
        if c.get("kind", "row") not in want:
            continue
        parts.append(
            f'<rect x="{c["x0"]:.2f}" y="{c["y0"]:.2f}" '
            f'width="{c["x1"] - c["x0"]:.2f}" height="{c["y1"] - c["y0"]:.2f}" '
            f'fill="none" stroke="red" stroke-width="1"/>'
        )
    parts.append("</svg>")
    return "".join(parts)


def node_boxes_to_svg(
    boxes: List[dict], page_width: float, page_height: float
) -> str:
    """One page's node boxes → SVG string. ``boxes`` entries carry
    (x0, y0, x1, y1, variant, node_idx) in bottom-left coordinates."""
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{page_width:g}" height="{page_height:g}" '
        f'viewBox="0 0 {page_width:g} {page_height:g}">',
        f'<rect x="0" y="0" width="{page_width:g}" height="{page_height:g}" '
        f'fill="white" stroke="#999" stroke-width="1"/>',
    ]
    for b in boxes:
        color = _VARIANT_COLORS.get(b["variant"], "#7f7f7f")
        # bottom-left → SVG top-left flip (reference: pdf.py:44-63)
        y_svg = page_height - b["y1"]
        parts.append(
            f'<rect x="{b["x0"]:.2f}" y="{y_svg:.2f}" '
            f'width="{b["x1"] - b["x0"]:.2f}" height="{b["y1"] - b["y0"]:.2f}" '
            f'fill="none" stroke="{color}" stroke-width="2">'
            f"<title>node {b['node_idx']}</title></rect>"
        )
    parts.append("</svg>")
    return "".join(parts)


class RenderBboxSvgs:
    """map_batches kernel: pages batch → one row per (url, page) with the
    SVG overlay of every node bbox on that page."""

    def __init__(self, pipeline: str = "basic"):
        from open_parse_ray.pipelines.extraction import make_pipeline

        self.pipeline = make_pipeline(pipeline)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from open_parse_ray.pipelines.extraction import parse_page

        urls, pages, svgs, n_boxes = [], [], [], []
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            try:
                nodes = parse_page(html, self.pipeline)
            except Exception:
                continue
            by_page: dict = {}
            pw = ph = None
            for idx, n in enumerate(nodes):
                variant = sorted(n.variant)[0] if n.variant else "text"
                for b in n.bbox:
                    pw, ph = b.page_width, b.page_height
                    by_page.setdefault(b.page, []).append(
                        {
                            "x0": b.x0,
                            "y0": b.y0,
                            "x1": b.x1,
                            "y1": b.y1,
                            "variant": variant,
                            "node_idx": idx,
                        }
                    )
            for page in sorted(by_page):
                urls.append(url)
                pages.append(page)
                svgs.append(node_boxes_to_svg(by_page[page], pw, ph))
                n_boxes.append(len(by_page[page]))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "page": pa.array(pages, pa.int32()),
                "svg": pa.array(svgs, pa.string()),
                "n_boxes": pa.array(n_boxes, pa.int32()),
            }
        )


def render_bbox_overlays(ds_pages, pipeline: str = "basic"):
    """Pages Dataset → (url, page, svg, n_boxes) Dataset (the
    `export_with_bboxes` analog; write with ``ds.write_parquet`` into the
    same partitioned layout as the nodes sink)."""
    return ds_pages.map_batches(
        RenderBboxSvgs,
        fn_constructor_kwargs={"pipeline": pipeline},
        batch_format="pyarrow",
        batch_size=32,
        # CPU-bound parse+render: let the pool grow to the node
        concurrency=(2, 32),
    )
