"""ProcessingStep semantics, ported from the reference suite
(reference: src/tests/processing/test_steps.py)."""

import pytest

from open_parse_ray import consts
from open_parse_ray.functions.transforms import (
    CombineBullets,
    CombineHeadingsWithClosestText,
    CombineNodesSpatially,
    RemoveFullPageStubs,
    RemoveMetadataElements,
    RemoveNodesBelowNTokens,
    RemoveRepeatedElements,
    RemoveTextInsideTables,
)
from open_parse_ray.model import Bbox, LineElement, Node, TableElement, TextElement, TextSpan


def create_text_node(text, x0, y0, x1, y1, page=1):
    return Node(
        elements=(
            TextElement(
                text=text,
                lines=(),
                bbox=Bbox(
                    x0=x0, y0=y0, x1=x1, y1=y1,
                    page=page, page_height=5000, page_width=5000,
                ),
            ),
        ),
    )


def create_table_node(x0, y0, x1, y1, page=1):
    return Node(
        elements=(
            TableElement(
                text="",
                bbox=Bbox(
                    x0=x0, y0=y0, x1=x1, y1=y1,
                    page=page, page_height=5000, page_width=5000,
                ),
            ),
        )
    )


### RemoveTextInsideTables ###


def test_no_tables_in_document():
    nodes = [create_text_node("Sample text", 0, 0, 10, 10)]
    assert RemoveTextInsideTables().process(nodes) == nodes


def test_text_outside_tables():
    nodes = [
        create_table_node(50, 50, 100, 100),
        create_text_node("Outside text", 10, 10, 20, 20),
    ]
    assert RemoveTextInsideTables().process(nodes) == nodes


def test_text_inside_tables():
    nodes = [
        create_table_node(50, 50, 100, 100),
        create_text_node("Inside text", 60, 60, 70, 70),
    ]
    assert RemoveTextInsideTables().process(nodes) == [nodes[0]]


def test_text_on_table_border():
    nodes = [
        create_table_node(50, 50, 100, 100),
        create_text_node("Border text", 50, 50, 100, 100),
    ]
    assert RemoveTextInsideTables().process(nodes) == [nodes[0]]


def test_overlapping_tables():
    nodes = [
        create_table_node(40, 40, 80, 80),
        create_table_node(60, 60, 100, 100),
        create_text_node("Overlapping text", 70, 70, 75, 75),
    ]
    assert RemoveTextInsideTables().process(nodes) == nodes[:2]


def test_empty_tables():
    nodes = [create_table_node(50, 50, 100, 100)]
    assert RemoveTextInsideTables().process(nodes) == nodes


def test_multi_page_documents():
    nodes = [
        create_table_node(50, 50, 100, 100, page=1),
        create_text_node("Page 1 text", 60, 60, 70, 70, page=1),
        create_text_node("Page 2 text", 60, 60, 70, 70, page=2),
    ]
    assert RemoveTextInsideTables().process(nodes) == [nodes[0], nodes[2]]


### RemoveFullPageStubs ###


def test_page_below_max_area_percentage():
    # 100x100 on a 5000x5000 page = 0.04% of page area -> retained
    node = create_text_node("Large content", 0, 0, 100, 100)
    assert RemoveFullPageStubs(max_area_pct=0.01).process([node]) == [node]


def test_page_above_max_area_percentage():
    # stub covering >1% of the page -> dropped
    node = create_text_node("small heading", 0, 0, 3500, 3500)
    assert RemoveFullPageStubs(max_area_pct=0.01).process([node]) == []


def test_full_page_non_stub_retained():
    node = create_text_node("word " * 200, 0, 0, 3500, 3500)
    assert node.tokens >= 50
    assert RemoveFullPageStubs(max_area_pct=0.01).process([node]) == [node]


def test_multi_page_node_retained():
    node = Node(
        elements=(
            create_text_node("a", 0, 0, 3500, 3500, page=1).elements[0],
            create_text_node("b", 0, 0, 3500, 3500, page=2).elements[0],
        )
    )
    assert RemoveFullPageStubs(max_area_pct=0.01).process([node]) == [node]


### RemoveMetadataElements ###


def test_remove_metadata_elements_bands():
    # page height 5000: allowed band is y0 >= 500 and y1 <= 4500
    header = create_text_node("Page 1 of 2", 0, 4600, 100, 4650)
    footer = create_text_node("fine print", 0, 100, 100, 150)
    body = create_text_node("body text", 0, 1000, 100, 1050)
    out = RemoveMetadataElements().process([header, body, footer])
    assert out == [body]


def test_remove_metadata_keeps_non_stub():
    big = create_text_node("word " * 200, 0, 4600, 100, 4650)
    assert RemoveMetadataElements().process([big]) == [big]


### RemoveRepeatedElements ###


def test_remove_repeated_elements():
    sample_bbox = {"x0": 0, "y0": 0, "x1": 10, "y1": 10}
    nodes = [
        create_text_node(text="Hello, world!", **sample_bbox),
        create_text_node(text="Hello, world!", **sample_bbox),
        create_text_node(text="Unique text", **sample_bbox),
        create_text_node(text="Hello, world!", **sample_bbox),
        create_text_node(text="Another unique text", **sample_bbox),
    ]
    processed = RemoveRepeatedElements(threshold=2).process(nodes)
    assert {n.text for n in processed} == {"Unique text", "Another unique text"}


### RemoveNodesBelowNTokens ###


def test_remove_nodes_below_n_tokens():
    sample_bbox = {"x0": 0, "y0": 0, "x1": 10, "y1": 10}
    nodes = [
        create_text_node(text="Hello, world!" * 100, **sample_bbox),
        create_text_node(text="Hi!", **sample_bbox),
        create_text_node(text="Unique text" * 100, **sample_bbox),
        create_text_node(text="Bye", **sample_bbox),
        create_text_node(text="Another unique text" * 100, **sample_bbox),
    ]
    processed = RemoveNodesBelowNTokens(min_tokens=50).process(nodes)
    assert {n.text for n in processed} == {
        "Hello, world!" * 100,
        "Unique text" * 100,
        "Another unique text" * 100,
    }


### CombineNodesSpatially ###


def test_combine_nodes_spatially_both_small():
    nodes = [
        create_text_node("Node 1", 0, 0, 100, 100),
        create_text_node("Node 2", 80, 80, 180, 180),
        create_text_node("Non-overlapping", 2000, 2000, 3000, 3000),
    ]
    processed = CombineNodesSpatially(
        x_error_margin=30, y_error_margin=30, criteria="both_small"
    ).process(nodes)
    processed_texts = {
        "".join(e.text for e in node.elements) for node in processed
    }
    assert len(processed) == 2
    assert processed_texts == {"Node 1Node 2", "Non-overlapping"}


def test_combine_nodes_one_stub_one_small():
    nodes = [
        create_text_node("stub", 0, 0, 50, 50),
        create_text_node("small " * 10, 40, 40, 140, 140),
        create_text_node("non-overlapping " * 100, 300, 300, 400, 400),
    ]
    processed = CombineNodesSpatially(
        x_error_margin=30, y_error_margin=30, criteria="either_stub"
    ).process(nodes)
    assert len(processed) == 2
    combined_text = " ".join(node.text for node in processed)
    for expected in ["stub", "small " * 10]:
        assert expected in combined_text


### CombineBullets ###


def _bullet_node(text):
    el = TextElement(
        text=text,
        lines=(),
        bbox=Bbox(
            page=0, page_height=792.0, page_width=612.0,
            x0=18.22, y0=659.1, x1=594.0, y1=711.3,
        ),
    )
    return Node(elements=(el,))


@pytest.fixture
def node_without_bullets():
    return _bullet_node("Some text without bullet points.")


@pytest.fixture
def node_starts_with_bullet():
    return _bullet_node(
        f"- Bullet point at the start.{consts.ELEMENT_DELIMITER}\n other text that follows."
    )


@pytest.fixture
def node_ends_with_bullet():
    return _bullet_node(
        f"Text ending with a bullet point:\n{consts.ELEMENT_DELIMITER}- Bullet"
    )


@pytest.fixture
def node_with_multiple_bullets():
    return _bullet_node(
        f"- Bullet one{consts.ELEMENT_DELIMITER}- Bullet two{consts.ELEMENT_DELIMITER}- Bullet three"
    )


def test_combine_bullets_single_node(node_without_bullets):
    assert len(CombineBullets().process([node_without_bullets])) == 1


def test_combine_bullets_sequential(node_starts_with_bullet, node_ends_with_bullet):
    result = CombineBullets().process([node_ends_with_bullet, node_starts_with_bullet])
    assert len(result) == 1


def test_combine_bullets_no_combination(node_without_bullets, node_starts_with_bullet):
    result = CombineBullets().process([node_without_bullets, node_starts_with_bullet])
    assert len(result) == 2


def test_combine_bullets_multiple_nodes(
    node_starts_with_bullet, node_with_multiple_bullets, node_ends_with_bullet
):
    result = CombineBullets().process(
        [node_starts_with_bullet, node_with_multiple_bullets, node_ends_with_bullet]
    )
    assert len(result) == 3


def test_combine_multiple_sequential_bullets(
    node_starts_with_bullet, node_ends_with_bullet
):
    nodes = [
        node_ends_with_bullet,
        node_starts_with_bullet,
        node_ends_with_bullet,
        node_starts_with_bullet,
    ]
    assert len(CombineBullets().process(nodes)) == 2


### CombineHeadingsWithClosestText ###


@pytest.fixture
def heading_node():
    line = LineElement(
        bbox=(0, 0, 100, 20),
        spans=(
            TextSpan(text="**Heading Example**", is_bold=True, size=18, is_italic=False),
        ),
    )
    el = TextElement(
        text="**Heading Example**",
        lines=(line,),
        bbox=Bbox(
            page=0, page_height=792.0, page_width=612.0,
            x0=18.22, y0=659.1, x1=594.0, y1=711.3,
        ),
    )
    return Node(elements=(el,))


@pytest.fixture
def short_text_node():
    line = LineElement(
        bbox=(0, 30, 100, 50),
        spans=(
            TextSpan(
                text="This is some short text that follows a heading.",
                is_bold=False, is_italic=False, size=12,
            ),
        ),
    )
    el = TextElement(
        text="This is some short text that follows a heading.",
        lines=(line,),
        bbox=Bbox(
            page=0, page_height=792.0, page_width=612.0,
            x0=18.22, y0=679.1, x1=594.0, y1=731.3,
        ),
    )
    return Node(elements=(el,))


@pytest.fixture
def longer_text_node():
    line = LineElement(
        bbox=(0, 60, 200, 100),
        spans=(
            TextSpan(
                text="This is a longer piece of text intended as content under a heading.",
                is_bold=False, is_italic=False, size=12,
            ),
        ),
    )
    el = TextElement(
        text="This is a longer piece of text intended as content under a heading.",
        lines=(line,),
        bbox=Bbox(
            page=0, page_height=792.0, page_width=612.0,
            x0=18.22, y0=699.1, x1=594.0, y1=751.3,
        ),
    )
    node = Node(elements=(el,))
    assert el.is_heading is False
    assert node.is_heading is False
    return node


def test_combine_heading_with_next_text(heading_node, short_text_node, longer_text_node):
    nodes = [heading_node, short_text_node, longer_text_node]
    processed = CombineHeadingsWithClosestText().process(nodes)
    assert len(processed) == 2
    combined_text = "".join(e.text for e in processed[0].elements)
    assert "**Heading Example**" in combined_text
    assert "This is some short text" in combined_text
    remaining_text = "".join(e.text for e in processed[1].elements)
    assert "This is a longer piece of text" in remaining_text


def test_no_combine_when_no_heading(short_text_node, longer_text_node):
    processed = CombineHeadingsWithClosestText().process(
        [short_text_node, longer_text_node]
    )
    assert len(processed) == 2


### CombineSlicedImages — real pixel stitch ###


def _image_node(payload, x0, y0, x1, y1, page=1):
    from open_parse_ray.model import ImageElement

    return Node(
        elements=(
            ImageElement(
                text="",
                bbox=Bbox(
                    x0=x0, y0=y0, x1=x1, y1=y1,
                    page=page, page_height=5000, page_width=5000,
                ),
                image=payload,
                image_mimetype="image/png",
            ),
        ),
    )


def test_combine_sliced_images_pixel_stitch():
    """The stitch is the reference's PIL paste (basic_transforms.py:70-88):
    black RGB canvas of (max width, total height), slices pasted at x=0
    top-to-bottom — verified on decoded pixels, across mixed widths and
    mixed color types (RGB / gray / RGBA)."""
    import numpy as np

    from open_parse_ray.functions.transforms import CombineSlicedImages
    from open_parse_ray.stages.multimodal import decode_png, encode_png

    rgb = np.zeros((3, 4, 3), np.uint8)
    rgb[..., 0] = 200  # red-ish block, 4 wide
    gray = np.full((2, 6), 90, np.uint8)  # gray block, 6 wide (max)
    rgba = np.zeros((2, 2, 4), np.uint8)
    rgba[..., 2] = 150  # blue block w/ alpha channel (dropped on paste)

    nodes = [
        _image_node(encode_png(rgb), 0, 30, 10, 40),
        _image_node(encode_png(gray), 0, 20, 10, 30),
        _image_node(encode_png(rgba), 0, 10, 10, 20),
    ]
    out = CombineSlicedImages().process(nodes)
    assert len(out) == 1
    (el,) = out[0].elements
    got = decode_png(el.image)
    assert got.shape == (7, 6, 3)  # sum heights x max width x RGB
    # slice 1: rgb rows 0-2, cols 0-3; padding cols black
    assert (got[0:3, 0:4] == rgb).all() and (got[0:3, 4:6] == 0).all()
    # slice 2: gray expanded to 3 channels, full width
    assert (got[3:5] == 90).all()
    # slice 3: rgba alpha dropped, cols 2-5 black
    assert (got[5:7, 0:2] == rgba[..., :3]).all() and (got[5:7, 2:6] == 0).all()


def test_combine_sliced_images_fallback_concat():
    """Payloads no in-repo codec recognizes still group + rewrite, with
    the deterministic byte-concat fallback."""
    from open_parse_ray.functions.transforms import CombineSlicedImages

    nodes = [
        _image_node(b"\xff\xd8opaque-jpeg-1", 0, 30, 10, 40),
        _image_node(b"\xff\xd8opaque-jpeg-2", 0, 20, 10, 30),
    ]
    out = CombineSlicedImages().process(nodes)
    assert len(out) == 1
    (el,) = out[0].elements
    assert el.image == b"\xff\xd8opaque-jpeg-1\xff\xd8opaque-jpeg-2"
