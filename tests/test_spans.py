"""Char→span grouping goldens, ported from the reference suite
(reference: src/tests/text/pdf_miner/test_core.py:19-205). These pin the
byte-identity contract for text extraction."""

from open_parse_ray.functions.spans import (
    CharElement,
    extract_chars,
    group_chars_into_spans,
)
from open_parse_ray.model import TextSpan


def test_group_chars_into_spans_basic():
    raw_chars = [
        CharElement(text="1", fontname="bold", size=9.0),
        CharElement(text=".", fontname="bold", size=9.0),
        CharElement(text=" ", fontname="bold", size=9.0),
        CharElement(text="P", fontname="bold", size=9.0),
        CharElement(text="A", fontname="bold", size=9.0),
        CharElement(text="R", fontname="bold", size=9.0),
        CharElement(text="T", fontname="bold", size=9.0),
        CharElement(text="I", fontname="bold", size=9.0),
        CharElement(text="E", fontname="bold", size=9.0),
        CharElement(text="S", fontname="bold", size=9.0),
        CharElement(text=":", fontname="bold", size=9.0),
        CharElement(text=" ", fontname="", size=9.0),
        CharElement(text=" ", fontname="", size=9.0),
    ]
    expected = [TextSpan(text="1. PARTIES: ", is_bold=True, is_italic=False, size=9.0)]
    assert group_chars_into_spans(raw_chars) == expected


def test_group_chars_into_spans_mixed_styles():
    mixed_chars = [
        CharElement(text="H", fontname="bold", size=9.0),
        CharElement(text="e", fontname="italic", size=9.0),
        CharElement(text="l", fontname="bold", size=9.0),
        CharElement(text="l", fontname="bold", size=9.0),
        CharElement(text="o", fontname="", size=9.0),
        CharElement(text=" ", fontname="", size=9.0),
        CharElement(text="W", fontname="boldItalic", size=9.0),
        CharElement(text="o", fontname="boldItalic", size=9.0),
        CharElement(text="r", fontname="boldItalic", size=9.0),
        CharElement(text="l", fontname="boldItalic", size=9.0),
        CharElement(text="d", fontname="boldItalic", size=9.0),
    ]
    expected = [
        TextSpan(text="H", is_bold=True, is_italic=False, size=9.0),
        TextSpan(text="e", is_bold=False, is_italic=True, size=9.0),
        TextSpan(text="ll", is_bold=True, is_italic=False, size=9.0),
        TextSpan(text="o ", is_bold=False, is_italic=False, size=9.0),
        TextSpan(text="World", is_bold=True, is_italic=True, size=9.0),
    ]
    assert group_chars_into_spans(mixed_chars) == expected


def test_extract_chars():
    char_data = [
        ("A", "Arial-Bold", 12.0),
        ("b", "Arial-Bold", 12.0),
        ("o", "Arial-Bold", 12.0),
        ("u", "Arial-Bold", 12.0),
        ("t", "Arial-Bold", 12.0),
        (" ", "Arial-Bold", 12.0),
        ("w", "Arial-Bold", 12.0),
        ("h", "Arial-Bold", 12.0),
        ("o", "Arial-Bold", 12.0),
    ]
    result = extract_chars(char_data)
    assert len(result) == 9
    assert result == [CharElement(text=t, fontname=f, size=s) for t, f, s in char_data]


def test_extract_chars_with_annotations():
    # None fontname/size = annotation chars inheriting the last real font
    char_data = [
        ("A", "Arial-Bold", 12.0),
        ("b", "Arial-Bold", 12.0),
        ("o", "Arial-Bold", 12.0),
        ("u", "Arial-Bold", 12.0),
        ("t", "Arial-Bold", 12.0),
        (" ", None, None),
        ("w", "Arial-Bold", 12.0),
        ("h", "Arial-Bold", 12.0),
        ("o", "Arial-Bold", 12.0),
        (" ", None, None),
        (" ", None, None),
        ("A", "Arial-Bold", 12.0),
        ("u", "Arial-Bold", 12.0),
        ("t", "Arial-Bold", 12.0),
        ("h", "Arial-Bold", 12.0),
        ("o", "Arial-Bold", 12.0),
        ("r", "Arial-Bold", 12.0),
        ("\n", None, None),
    ]
    result = extract_chars(char_data)
    assert len(result) == 18
    assert all(c.fontname == "Arial-Bold" and c.size == 12.0 for c in result)
    assert "".join(c.text for c in result) == "About who  Author\n"


def test_leading_annotation_inherits_first_font():
    char_data = [
        (" ", None, None),
        ("X", "Times-Italic", 10.0),
    ]
    result = extract_chars(char_data)
    assert result[0].fontname == "Times-Italic"
    assert result[0].size == 10.0


def test_char_size_rounded_two_decimals():
    c = CharElement(text="a", fontname="f", size=9.1234)
    assert c.size == 9.12
