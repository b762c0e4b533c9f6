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


def test_table_to_html_str_golden():
    """Exact string semantics of the table-transformers to_html_str
    (reference schemas.py:202-235): thead/tbody, min-width from bbox,
    None content → empty, no newline after the final </table>."""
    from open_parse_ray.functions.tables import table_to_html_str

    headers = [[("Name", (0.0, 0.0, 40.4, 10.0)), ("Qty", (40.4, 0.0, 60.0, 10.0))]]
    rows = [
        [("ab", (0.0, 10.0, 40.4, 20.0)), (None, (40.4, 10.0, 60.0, 20.0))],
    ]
    got = table_to_html_str(headers, rows)
    want = (
        '<table border="1">\n'
        "<thead>\n<tr>\n"
        '<th style="min-width:40px;">Name</th>\n'
        '<th style="min-width:20px;">Qty</th>\n'
        "</tr>\n</thead>\n"
        "<tbody>\n<tr>\n"
        '<td style="min-width:40px;">ab</td>\n'
        '<td style="min-width:20px;"></td>\n'
        "</tr>\n</tbody>\n</table>"
    )
    assert got == want
    # headerless: no thead block at all
    assert table_to_html_str([], rows).startswith('<table border="1">\n<tbody>')


def test_build_table_from_html_and_cell_golden():
    """Unitable merge semantics (reference unitable/utils.py:113-133):
    both placeholder spellings consume cells, pass-through tokens keep
    order, placeholders beyond the content list are DROPPED, and None
    content fills every slot with 'placeholder'."""
    from open_parse_ray.functions.tables import build_table_from_html_and_cell

    structure = ["<table>", "<tr>", "<td>[]</td>", ">[]</td>", "</tr>", "</table>"]
    got = build_table_from_html_and_cell(structure, ["a", "b"])
    assert got == ["<table>", "<tr>", "<td>a</td>", ">b</td>", "</tr>", "</table>"]
    # content exhaustion: the extra placeholder disappears
    got2 = build_table_from_html_and_cell(structure, ["only"])
    assert got2 == ["<table>", "<tr>", "<td>only</td>", "</tr>", "</table>"]
    # None → 'placeholder' everywhere
    got3 = build_table_from_html_and_cell(["<td>[]</td>"], None)
    assert got3 == ["<td>placeholder</td>"]


def test_grid_structure_tokens_compose_with_cells():
    from open_parse_ray.functions.tables import (
        build_table_from_html_and_cell,
        grid_to_structure_tokens,
    )

    toks = grid_to_structure_tokens(n_cols=2, n_rows=1)
    html = "".join(build_table_from_html_and_cell(toks, ["h1", "h2", "a", "b"]))
    assert html == (
        "<table><thead><tr><td>h1</td><td>h2</td></tr></thead>"
        "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>"
    )


def test_unitable_token_utils_goldens():
    """Pure unitable decode-cleanup utilities (reference
    unitable/utils.py:10-157, core.py:182) — byte-level semantics."""
    from open_parse_ray.functions.tables import (
        bbox_str_to_token_list,
        cell_str_to_token_list,
        clean_cell_text,
        html_str_to_token_list,
        html_table_template,
    )

    # template wraps verbatim, double-%% preserved
    doc = html_table_template("<tr><td>x</td></tr>")
    assert "<tr><td>x</td></tr>" in doc
    assert 'width="100%%"' in doc and doc.lstrip().startswith("<html>")

    # cell cleanup: <eos> truncation + task-token strip + trim
    assert cell_str_to_token_list(" [cell] 3.14 <pad><eos>junk") == "3.14"
    # decimal re-join: '.' matches ANY separator char (reference regex)
    assert clean_cell_text("3. 14") == "3.14"
    assert clean_cell_text("3x  14") == "3.14"  # the reference's unescaped dot
    assert clean_cell_text("no digits here") == "no digits here"

    # html token list: contiguous split, whitespace-only and 1-char
    # source spans dropped, truncation at <eos>
    toks = html_str_to_token_list("<tr> <td>[]</td> x yy<eos><tr>")
    assert toks == ["<tr>", "<td>[]</td>", "yy"]

    # bbox tokens: ints after '-', grouped in fours, partial group dropped
    s = "[bbox] bbox-1 bbox-2 bbox-3 bbox-4 bbox-5 bbox-6<eos>"
    assert bbox_str_to_token_list(s) == [(1, 2, 3, 4)]
