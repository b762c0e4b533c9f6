"""Table renderer goldens + geometry, ported from the reference suite
(reference: src/tests/tables/pymupdf/test_parse.py:4-77,
src/tests/tables/transformers/test_geometry.py:7-21)."""

import pytest

from open_parse_ray.functions.tables import (
    calc_bbox_intersection,
    combine_header_and_table_bboxes,
    output_to_html,
    output_to_markdown,
)


def test_output_to_markdown_standard():
    headers = ["Year", "Revenue", "Expenses"]
    rows = [["2022", "100,000", "50,000"], ["2021", "90,000", "45,000"]]
    expected = (
        "| Year | Revenue | Expenses |\n"
        "|---|---|---|\n"
        "| 2022 | 100,000 | 50,000 |\n"
        "| 2021 | 90,000 | 45,000 |\n"
    )
    assert output_to_markdown(headers, rows) == expected


def test_output_to_markdown_missing_values():
    headers = ["Year", "Revenue", "Expenses"]
    rows = [["2022", "100,000", None], ["2021", "", "45,000"]]
    expected = (
        "| Year | Revenue | Expenses |\n"
        "|---|---|---|\n"
        "| 2022 | 100,000 |   |\n"
        "| 2021 |   | 45,000 |\n"
    )
    assert output_to_markdown(headers, rows) == expected


def test_output_to_markdown_no_rows():
    assert output_to_markdown(["Year", "Revenue"], []) == (
        "| Year | Revenue |\n|---|---|\n"
    )


def test_output_to_markdown_newlines_to_spaces():
    out = output_to_markdown(["A"], [["line1\nline2"]])
    assert "| line1 line2 |" in out


def test_output_to_html_standard():
    headers = ["Year", "Revenue", "Expenses"]
    rows = [["2022", "100,000", "50,000"], ["2021", "90,000", "45,000"]]
    expected = (
        '<table border="1">\n'
        "<tr><th>Year</th><th>Revenue</th><th>Expenses</th></tr>\n"
        "<tr><td>2022</td><td>100,000</td><td>50,000</td></tr>\n"
        "<tr><td>2021</td><td>90,000</td><td>45,000</td></tr>\n"
        "</table>"
    )
    assert output_to_html(headers, rows) == expected


def test_output_to_html_missing_values():
    headers = ["Year", "Revenue", "Expenses"]
    rows = [["2022", "100,000", None], ["2021", "", "45,000"]]
    expected = (
        '<table border="1">\n'
        "<tr><th>Year</th><th>Revenue</th><th>Expenses</th></tr>\n"
        "<tr><td>2022</td><td>100,000</td><td> </td></tr>\n"
        "<tr><td>2021</td><td> </td><td>45,000</td></tr>\n"
        "</table>"
    )
    assert output_to_html(headers, rows) == expected


def test_output_to_html_no_rows():
    assert output_to_html(["Year", "Revenue"], []) == (
        '<table border="1">\n<tr><th>Year</th><th>Revenue</th></tr>\n</table>'
    )


def test_combine_header_and_table_bboxes():
    assert combine_header_and_table_bboxes((0, 10, 50, 20), (5, 0, 60, 15)) == (
        0,
        0,
        60,
        20,
    )


@pytest.mark.parametrize(
    "bbox1, bbox2, margin, expected",
    [
        ((0, 0, 10, 10), (5, 5, 15, 15), 5.0, (5, 5, 10, 10)),  # overlapping
        ((0, 0, 10, 10), (10, 10, 20, 20), 5.0, None),  # touching corners
        ((0, 0, 4, 4), (6, 6, 10, 10), 1.0, None),  # disjoint
        ((0, 0, 10, 10), (2, 2, 8, 8), 0.0, (2, 2, 8, 8)),  # contained
    ],
)
def test_calc_bbox_intersection(bbox1, bbox2, margin, expected):
    assert calc_bbox_intersection(bbox1, bbox2, safety_margin=margin) == expected


def test_calc_bbox_intersection_rejects_negative_margin():
    with pytest.raises(ValueError):
        calc_bbox_intersection((0, 0, 1, 1), (0, 0, 1, 1), safety_margin=-1)


def test_calc_bbox_intersection_rejects_degenerate():
    with pytest.raises(ValueError):
        calc_bbox_intersection((0, 0, 0, 1), (0, 0, 1, 1))
