"""Source-format invariance (Parquet vs JSON-lines vs CSV) and the SVG
bbox-overlay visualization sink."""

import xml.etree.ElementTree as ET

import pandas as pd
import pytest


def _extract_texts(ds):
    from open_parse_ray.pipelines.extraction import extract

    df = extract(ds, pipeline="basic", output="docs").to_pandas()
    return df.sort_values("url")[["url", "extracted_text"]].reset_index(drop=True)


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_source_format_invariance(ray_session, tmp_path, fmt):
    """The same corpus read from JSON-lines/CSV (base64 html) extracts
    byte-identically to the Parquet path."""
    from open_parse_ray.sources.pages import (
        export_pages,
        read_pages,
        read_pages_csv,
        read_pages_json,
    )

    out = str(tmp_path / fmt)
    export_pages(0.001, out, format=fmt)
    reader = read_pages_json if fmt == "json" else read_pages_csv
    got = _extract_texts(reader(out, columns=["url", "html"]))
    want = _extract_texts(read_pages(0.001, columns=["url", "html"]))
    pd.testing.assert_frame_equal(got, want)


def test_bbox_svg_overlay(ray_session):
    from open_parse_ray.functions.viz import render_bbox_overlays
    from open_parse_ray.sources.pages import read_pages

    df = render_bbox_overlays(read_pages(0.001, columns=["url", "html"])).to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"url", "page", "svg", "n_boxes"}
    # every svg is well-formed XML with one rect per box + the page frame
    for _, row in df.head(20).iterrows():
        root = ET.fromstring(row["svg"])
        rects = root.findall("{http://www.w3.org/2000/svg}rect")
        assert len(rects) == row["n_boxes"] + 1
    # deterministic: second render identical
    again = render_bbox_overlays(read_pages(0.001, columns=["url", "html"])).to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values(["url", "page"]).reset_index(drop=True),
        again.sort_values(["url", "page"]).reset_index(drop=True),
    )


def test_svg_coordinates_flip():
    """Bottom-left bbox → SVG top-left rect (reference pdf.py:44-63)."""
    from open_parse_ray.functions.viz import node_boxes_to_svg

    svg = node_boxes_to_svg(
        [{"x0": 10, "y0": 20, "x1": 110, "y1": 70, "variant": "text", "node_idx": 0}],
        page_width=612,
        page_height=792,
    )
    # y_svg = 792 - y1 = 722; height = y1 - y0 = 50
    assert 'x="10.00" y="722.00" width="100.00" height="50.00"' in svg
    assert 'stroke="#1f77b4"' in svg
