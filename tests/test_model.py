"""Span/line markdown formatting + node semantics
(reference: src/tests/test_schemas.py and src/openparse/schemas.py)."""

from open_parse_ray import consts
from open_parse_ray.model import (
    Bbox,
    LineElement,
    Node,
    TableElement,
    TextElement,
    TextSpan,
    clean_markdown_formatting,
)


def _bbox(x0=0, y0=0, x1=10, y1=10, page=0):
    return Bbox(
        page=page, page_height=792.0, page_width=612.0, x0=x0, y0=y0, x1=x1, y1=y1
    )


def test_formatted_text_boundaries():
    bold = TextSpan(text="bold", is_bold=True, is_italic=False, size=12)
    plain = TextSpan(text="plain", is_bold=False, is_italic=False, size=12)
    italic = TextSpan(text="ital", is_bold=False, is_italic=True, size=12)

    assert bold.formatted_text(None, None) == "**bold**"
    assert italic.formatted_text(None, None) == "*ital*"
    # adjacent same-style spans suppress interior markers
    assert bold.formatted_text(bold, bold) == "bold"
    assert bold.formatted_text(None, bold) == "**bold"
    assert bold.formatted_text(bold, None) == "bold**"
    assert plain.formatted_text(bold, bold) == "plain"


def test_bold_italic_combined_markers():
    bi = TextSpan(text="x", is_bold=True, is_italic=True, size=12)
    assert bi.formatted_text(None, None) == "***x***"


def test_line_text_joins_spans_with_markdown():
    line = LineElement(
        bbox=(0, 0, 100, 10),
        spans=(
            TextSpan(text="Hello ", is_bold=True, is_italic=False, size=12),
            TextSpan(text="World", is_bold=False, is_italic=False, size=12),
        ),
    )
    # reference quirk: the cleanup regex `\s+(\*\*|__)` eats the space
    # before the closing marker entirely (schemas.py:171-174)
    assert line.text == "**Hello**World"


def test_clean_markdown_formatting_space_rules():
    assert clean_markdown_formatting("** bold**") == "**bold**"
    assert clean_markdown_formatting("**bold **") == "**bold**"
    assert clean_markdown_formatting("* ital*") == "*ital*"
    assert clean_markdown_formatting("****") == "** **"


def test_line_bbox_rounded_2dp():
    line = LineElement(bbox=(0.12345, 1.999, 2.345, 3.0001), spans=())
    assert line.bbox == (0.12, 2.0, 2.35, 3.0)


def test_line_heading_ignores_trailing_span():
    spans = (
        TextSpan(text="Head", is_bold=True, is_italic=False, size=18),
        TextSpan(text=" ", is_bold=False, is_italic=False, size=9),  # weird trailing
    )
    line = LineElement(bbox=(0, 0, 10, 10), spans=spans)
    assert line.is_heading is True
    assert line.is_bold is True


def test_node_text_assembly_relationships():
    # elements sorted by (page, -y1, x0); relationship from y0 deltas
    e_top = TextElement(text="Top", lines=(), bbox=_bbox(y0=100, y1=110))
    e_sameline = TextElement(text="Right", lines=(), bbox=_bbox(x0=50, y0=100.5, y1=110))
    e_para = TextElement(text="Para", lines=(), bbox=_bbox(y0=90, y1=99))
    e_far = TextElement(text="Far", lines=(), bbox=_bbox(y0=20, y1=30))
    node = Node(elements=(e_far, e_top, e_para, e_sameline))
    assert node.text == "Top Right\nPara" + consts.ELEMENT_DELIMITER + "Far"


def test_node_text_table_breaks_relationship():
    e1 = TextElement(text="Text", lines=(), bbox=_bbox(y0=100, y1=110))
    t1 = TableElement(text="| a |", bbox=_bbox(y0=95, y1=99))
    node = Node(elements=(e1, t1))
    assert node.text == "Text" + consts.ELEMENT_DELIMITER + "| a |"


def test_reading_order_sort():
    n1 = Node(elements=(TextElement(text="low", lines=(), bbox=_bbox(y0=10, y1=20)),))
    n2 = Node(elements=(TextElement(text="high", lines=(), bbox=_bbox(y0=700, y1=710)),))
    n3 = Node(
        elements=(TextElement(text="page2", lines=(), bbox=_bbox(y0=700, y1=710, page=1)),)
    )
    assert sorted([n3, n1, n2]) == [n2, n1, n3]


def test_node_bbox_per_page():
    e1 = TextElement(text="a", lines=(), bbox=_bbox(x0=0, y0=0, x1=10, y1=10, page=0))
    e2 = TextElement(text="b", lines=(), bbox=_bbox(x0=5, y0=5, x1=20, y1=20, page=0))
    e3 = TextElement(text="c", lines=(), bbox=_bbox(x0=1, y0=1, x1=2, y1=2, page=1))
    node = Node(elements=(e1, e2, e3))
    assert len(node.bbox) == 2
    b0 = node.bbox[0]
    assert (b0.x0, b0.y0, b0.x1, b0.y1) == (0, 0, 20, 20)
    assert node.num_pages == 2
    assert node.start_page == 0 and node.end_page == 1


def test_bullet_predicates():
    n = Node(
        elements=(
            TextElement(
                text=f"intro:{consts.ELEMENT_DELIMITER}- bullet", lines=(), bbox=_bbox()
            ),
        )
    )
    assert n.ends_with_bullet is True
    assert n.starts_with_bullet is False
    n2 = Node(elements=(TextElement(text="1. numbered", lines=(), bbox=_bbox()),))
    assert n2.starts_with_bullet is True
    n3 = Node(elements=(TextElement(text="(a) lettered", lines=(), bbox=_bbox()),))
    assert n3.starts_with_bullet is True
    n4 = Node(elements=(TextElement(text="**bold** not bullet", lines=(), bbox=_bbox()),))
    assert n4.starts_with_bullet is False


def test_node_add_combines_elements():
    a = Node(elements=(TextElement(text="a", lines=(), bbox=_bbox()),))
    b = Node(elements=(TextElement(text="b", lines=(), bbox=_bbox()),))
    c = a + b
    assert len(c.elements) == 2
    assert c.variant == {"text"}


def test_node_tokens_sum_and_stub():
    short = Node(elements=(TextElement(text="hi", lines=(), bbox=_bbox()),))
    assert short.is_stub is True
    long_node = Node(
        elements=(TextElement(text="word " * 300, lines=(), bbox=_bbox()),)
    )
    assert long_node.is_stub is False
    assert long_node.is_large is False
    # 300 words + 1 trailing-whitespace token
    assert long_node.tokens == 301


def test_img_tag_becomes_image_element():
    from open_parse_ray.functions.html import html_to_elements
    from open_parse_ray.model import ImageElement

    html = (
        '<html><body><p>before</p>'
        '<img src="/x/chart.jpg" width="300" height="120" alt="Chart">'
        '<img src="/x/noext" alt="">'
        '<p>after</p></body></html>'
    )
    els = html_to_elements(html)
    imgs = [e for e in els if isinstance(e, ImageElement)]
    assert len(imgs) == 2
    assert imgs[0].image_mimetype == "image/jpeg"
    assert imgs[1].image_mimetype == "image/png"  # extension fallback
    assert imgs[0].text == "Chart"
    assert imgs[0].tokens == 512  # fixed placeholder (reference schemas.py:375)
    assert imgs[0].image == imgs[0].image  # deterministic payload
    assert html_to_elements(html)[1].image == imgs[0].image


def test_void_tags_do_not_desync_style_stack():
    from open_parse_ray.functions.html import html_to_elements

    # <hr>/<br>/<img> fire no endtag; a style push for them would make the
    # later </div> pop the wrong entry and leak bold into following text
    html = (
        "<html><body><div><b>bold</b><hr><br>"
        '<img src="a.png"></div><p>plain text here</p></body></html>'
    )
    els = html_to_elements(html)
    texts = [e for e in els if getattr(e, "lines", None)]
    last = texts[-1]
    assert last.text == "plain text here"
    assert all(not s.is_bold for line in last.lines for s in line.spans)


def test_fast_tokenizer_event_parity():
    """The compiled-regex tokenizer emits the IDENTICAL event stream as
    html.parser (lowercasing, charrefs, raw-text script/style, selfclose
    expansion) on the whole corpus and on adversarial markup; anything it
    cannot handle bails to the stdlib parser."""
    from html.parser import HTMLParser

    from open_parse_ray.functions.html import _FastParseBail, _fast_feed
    from open_parse_ray.sources.pages import gen_html

    class Rec(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.events = []

        def handle_starttag(self, tag, attrs):
            self.events.append(("s", tag, tuple(attrs)))

        def handle_endtag(self, tag):
            self.events.append(("e", tag))

        def handle_data(self, data):
            self.events.append(("d", data))

    class RecFast:
        def __init__(self):
            self.events = []

        def handle_starttag(self, tag, attrs):
            self.events.append(("s", tag, tuple(attrs)))

        def handle_endtag(self, tag):
            self.events.append(("e", tag))

        def handle_data(self, data):
            self.events.append(("d", data))

    def merged(evts):
        out = []
        for e in evts:
            if e[0] == "d" and out and out[-1][0] == "d":
                out[-1] = ("d", out[-1][1] + e[1])
            else:
                out.append(e)
        return out

    cases = [gen_html(i)["html"] for i in list(range(80)) + [97]]
    cases += [
        "<p>a &amp; b &lt;tag&gt; &#65;</p>",
        '<div class="x" id=y data-z>text</div>',
        "<img src='a.png' width=320 height=140 alt='Fig'>",
        '<script>if (a<b) {x="</di"+"v>";}</script><p>after</p>',
        '<style>.a{content:"<"}</style><p>ok</p>',
        "<br/><hr/><p>selfclose</p>",
        "<!-- c --><!DOCTYPE html><p>x</p>",
        '<P CLASS="UP">MiXeD</P>',
        # title/textarea are NOT CDATA elements for html.parser with
        # convert_charrefs=True: entities convert, nested tags emit events
        "<title>a &amp; b</title><p>x</p>",
        "<textarea><b>bold?</b> &lt;kept&gt;</textarea><p>y</p>",
        "plain < not a tag",  # must BAIL, not mis-parse
    ]
    bails = 0
    for h in cases:
        a = Rec()
        a.feed(h)
        a.close()
        b = RecFast()
        try:
            _fast_feed(h, b)
        except _FastParseBail:
            bails += 1
            continue
        assert merged(a.events) == merged(b.events), h[:120]
    assert bails == 1  # exactly the stray-'<' case


def test_fast_tokenizer_fuzz_no_hang_and_parity():
    """Seeded random-markup fuzz: the fast tokenizer either produces the
    stdlib-identical event stream or bails — and never hangs."""
    import random
    from html.parser import HTMLParser

    from open_parse_ray.functions.html import _FastParseBail, _fast_feed

    class Rec(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.events = []

        def handle_starttag(self, tag, attrs):
            self.events.append(("s", tag, tuple(attrs)))

        def handle_endtag(self, tag):
            self.events.append(("e", tag))

        def handle_data(self, data):
            self.events.append(("d", data))

    class RecFast(Rec):
        def __init__(self):
            HTMLParser.__init__(self)
            self.events = []

    def merged(evts):
        out = []
        for e in evts:
            if e[0] == "d" and out and out[-1][0] == "d":
                out[-1] = ("d", out[-1][1] + e[1])
            else:
                out.append(e)
        return out

    rng = random.Random(5)
    pieces = ["<p>", "</p>", "<b>", "</b>", "text", " ", "&amp;", "<", ">",
              "<img src=x>", "<div class='a'>", "</div>", "<br/>", "&#65;",
              "<script>x<y</script>", "<!-- c -->", "'", '"', "=", "a1"]
    for _ in range(120):
        h = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 25)))
        b = RecFast()
        try:
            _fast_feed(h, b)
        except _FastParseBail:
            continue
        a = Rec()
        a.feed(h)
        a.close()
        assert merged(a.events) == merged(b.events), h[:120]
