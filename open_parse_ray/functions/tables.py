"""Table grid renderers + bbox geometry.

Re-implements the reference's golden-tested grid → markdown/html renderers
(reference: src/openparse/tables/pymupdf/parse.py:4-51) and bbox intersection
(reference: src/openparse/tables/table_transformers/geometry.py:4-41). Pure
functions used inside extraction kernels.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


def output_to_html(
    headers: Sequence[Optional[str]], rows: Sequence[Sequence[Optional[str]]]
) -> str:
    """Grid → html string; falsy cells become a single space
    (reference: tables/pymupdf/parse.py:4-21)."""
    parts = ['<table border="1">\n', "<tr>"]
    for header in headers:
        parts.append(f"<th>{header}</th>")
    parts.append("</tr>\n")
    for row in rows:
        parts.append("<tr>")
        for cell in row:
            parts.append(f'<td>{cell or " "}</td>')
        parts.append("</tr>\n")
    parts.append("</table>")
    return "".join(parts)


def output_to_markdown(
    headers: Sequence[Optional[str]], rows: Sequence[Sequence[Optional[str]]]
) -> str:
    """Grid → markdown; None/empty cells pad to a space, embedded newlines
    become spaces (reference: tables/pymupdf/parse.py:24-40)."""
    out = ""
    if headers is not None:
        for header in headers:
            safe_header = "" if header is None else header
            out += "| " + safe_header + " "
    out += "|\n"
    out += "|---" * len(headers) + "|\n"
    for row in rows:
        processed_row = [
            " " if cell in (None, "") else cell.replace("\n", " ") for cell in row
        ]
        out += "| " + " | ".join(processed_row) + " |\n"
    return out


def table_to_html_str(
    header_rows: Sequence[Sequence[Tuple[Optional[str], Tuple[float, float, float, float]]]],
    data_rows: Sequence[Sequence[Tuple[Optional[str], Tuple[float, float, float, float]]]],
) -> str:
    """Structured table → styled HTML with per-cell min-width from the
    cell bbox, exactly the table-transformers renderer (reference:
    tables/table_transformers/schemas.py:202-235): thead/tbody blocks,
    ``min-width:{round(x1-x0)}px`` style, empty string for None content,
    newline after every tag except the closing ``</table>``. Cell bboxes
    are image coordinates, as in the reference."""
    out = '<table border="1">\n'
    if header_rows:
        out += "<thead>\n"
        for row in header_rows:
            out += "<tr>\n"
            for content, bbox in row:
                min_width = round(bbox[2] - bbox[0])
                out += f'<th style="min-width:{min_width}px;">{content or ""}</th>\n'
            out += "</tr>\n"
        out += "</thead>\n"
    out += "<tbody>\n"
    for row in data_rows:
        out += "<tr>\n"
        for content, bbox in row:
            min_width = round(bbox[2] - bbox[0])
            out += f'<td style="min-width:{min_width}px;">{content or ""}</td>\n'
        out += "</tr>\n"
    out += "</tbody>\n"
    out += "</table>"
    return out


def build_table_from_html_and_cell(
    structure: List[str], content: Optional[List[str]] = None
) -> List[str]:
    """Merge a unitable structure-token sequence with cell contents
    (reference: tables/unitable/utils.py:113-133): every ``<td>[]</td>``
    or ``>[]</td>`` placeholder consumes the next cell, other tokens
    pass through; placeholders beyond the content list are dropped;
    None content fills every slot with "placeholder"."""
    assert structure is not None
    html_code: List[str] = []
    content_copy = (
        ["placeholder"] * len(structure) if content is None else list(content)
    )
    for tag in structure:
        if tag in ("<td>[]</td>", ">[]</td>"):
            if len(content_copy) == 0:
                continue
            cell = content_copy.pop(0)
            html_code.append(tag.replace("[]", cell))
        else:
            html_code.append(tag)
    return html_code


def grid_to_structure_tokens(n_cols: int, n_rows: int) -> List[str]:
    """Dense-grid structure tokens in unitable's vocabulary
    (``<thead>``/``<tbody>`` rows of ``<td>[]</td>`` placeholders) — what
    the gated unitable model would emit for a regular grid; feeds
    build_table_from_html_and_cell (reference: unitable/core.py:186-201)."""
    toks = ["<table>", "<thead>", "<tr>"]
    toks += ["<td>[]</td>"] * n_cols
    toks += ["</tr>", "</thead>", "<tbody>"]
    for _ in range(n_rows):
        toks.append("<tr>")
        toks += ["<td>[]</td>"] * n_cols
        toks.append("</tr>")
    toks += ["</tbody>", "</table>"]
    return toks


UNITABLE_TASK_TOKENS = ["[table]", "[html]", "[cell]", "[bbox]", "[cell+bbox]"]


def html_table_template(table: str) -> str:
    """The unitable HTML document wrapper (reference:
    tables/unitable/utils.py:10-23), byte-identical template."""
    return f"""<html>
        <head> <meta charset="UTF-8">
        <style>
        table, th, td {{
            border: 1px solid black;
            font-size: 10px;
        }}
        </style> </head>
        <body>
        <table frame="hsides" rules="groups" width="100%%">
            {table}
        </table> </body> </html>"""


def cell_str_to_token_list(seq: str) -> str:
    """Decoder-output cleanup for cell content (reference:
    unitable/utils.py:94-110): truncate at ``<eos>``, strip special and
    task tokens, trim. (Returns a string, like the reference, despite
    the historical name.)"""
    seq = seq.split("<eos>")[0]
    for tok in ["<eos>", "<pad>", *UNITABLE_TASK_TOKENS]:
        seq = seq.replace(tok, "")
    return seq.strip()


def clean_cell_text(seq: str) -> str:
    """Decimal re-join pass applied to every decoded cell (reference:
    unitable/core.py:182): ``"3. 14"``-style splits collapse back to
    ``"3.14"`` (the regex's ``.`` matches ANY separator char, as in the
    reference)."""
    import re

    return re.sub(r"(\d).\s+(\d)", r"\1.\2", seq)


def html_str_to_token_list(seq: str) -> List[str]:
    """Decoder-output → structure-token list (reference:
    unitable/utils.py:57-95): truncate at ``<eos>``, drop
    ``<eos>``/``<pad>``, whitespace-contiguous split, then filter
    whitespace-only tokens and tokens spanning a single source char."""
    import re

    seq = seq.split("<eos>")[0]
    for tok in ("<eos>", "<pad>"):
        seq = seq.replace(tok, "")
    out = []
    for m in re.finditer(r" +|[^ ]+", seq):
        token, start, end = m.group(0), m.start(), m.end()
        if len(token.strip()) > 0 and (end - start != 1):
            out.append(token)
    return out


def bbox_str_to_token_list(seq: str) -> List[Tuple[int, int, int, int]]:
    """Decoder-output → cell bbox 4-tuples (reference:
    unitable/utils.py:137-157): truncate at ``<eos>``, strip special/task
    tokens, parse the integer after each ``-``, group in fours (a
    trailing partial group is dropped)."""
    seq = seq.split("<eos>")[0]
    for tok in ["<eos>", "<pad>", *UNITABLE_TASK_TOKENS]:
        seq = seq.replace(tok, "")
    ints = [int(t.split("-")[1]) for t in seq.split(" ") if t]
    n = len(ints) // 4 * 4
    return [tuple(ints[i : i + 4]) for i in range(0, n, 4)]


def combine_header_and_table_bboxes(
    bbox1: Tuple[float, float, float, float], bbox2: Tuple[float, float, float, float]
) -> Tuple[float, float, float, float]:
    """Union of two bboxes (reference: tables/pymupdf/parse.py:43-51)."""
    return (
        min(bbox1[0], bbox2[0]),
        min(bbox1[1], bbox2[1]),
        max(bbox1[2], bbox2[2]),
        max(bbox1[3], bbox2[3]),
    )


def calc_bbox_intersection(
    bbox1, bbox2, safety_margin: float = 5.0
) -> Optional[Tuple[float, float, float, float]]:
    """Safety-margin bbox intersection, None when empty
    (reference: tables/table_transformers/geometry.py:4-41)."""
    if safety_margin < 0:
        raise ValueError("Safety margin cannot be negative.")
    if (
        bbox1[2] <= bbox1[0]
        or bbox1[3] <= bbox1[1]
        or bbox2[2] <= bbox2[0]
        or bbox2[3] <= bbox2[1]
    ):
        raise ValueError("Bounding boxes must have non-zero width and height.")

    x1_expanded_min = min(bbox1[0], bbox2[0]) - safety_margin
    y1_expanded_min = min(bbox1[1], bbox2[1]) - safety_margin
    x2_expanded_max = max(bbox1[2], bbox2[2]) + safety_margin
    y2_expanded_max = max(bbox1[3], bbox2[3]) + safety_margin

    if (
        x2_expanded_max <= max(bbox1[0], bbox2[0])
        or x1_expanded_min >= min(bbox1[2], bbox2[2])
        or y2_expanded_max <= max(bbox1[1], bbox2[1])
        or y1_expanded_min >= min(bbox1[3], bbox2[3])
    ):
        return None

    x1 = max(bbox1[0], bbox2[0])
    y1 = max(bbox1[1], bbox2[1])
    x2 = min(bbox1[2], bbox2[2])
    y2 = min(bbox1[3], bbox2[3])
    if x2 > x1 and y2 > y1:
        return (x1, y1, x2, y2)
    return None
