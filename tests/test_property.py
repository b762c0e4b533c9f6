"""Property-based kernel tests (hypothesis) — beyond the reference's own
test strategy (SURVEY §5: no property testing there). Each property either
checks an internal invariant or compares against the live reference oracle
from test_reference_parity's fixture machinery."""

from hypothesis import given, settings, strategies as st

from open_parse_ray.functions.spans import (
    CharElement,
    extract_chars,
    group_chars_into_spans,
)
from open_parse_ray.model import Bbox, LineElement, TextSpan
from open_parse_ray.tokens import num_tokens

_char = st.text(
    alphabet="ab X\t.z*_", min_size=1, max_size=1
)
_font = st.sampled_from(["Helvetica", "Arial-Bold", "Times-italic", "F-BoldItalic"])
_size = st.sampled_from([8.0, 12.0, 16.0, 16.504])


@st.composite
def char_streams(draw):
    n = draw(st.integers(0, 40))
    return [
        CharElement(text=draw(_char), fontname=draw(_font), size=draw(_size))
        for _ in range(n)
    ]


@settings(max_examples=60, deadline=None)
@given(char_streams())
def test_span_grouping_invariants(chars):
    spans = group_chars_into_spans(chars)
    joined = "".join(s.text for s in spans)
    # 1. no span is empty; whitespace-only spans are exactly " " (the
    #    reference's algorithm emits one when a style change follows
    #    leading whitespace — hypothesis found this edge, and the live
    #    reference oracle reproduces it)
    assert all(s.text == " " or s.text.strip() for s in spans)
    # 2. whitespace is compressed: never two consecutive spaces in output
    assert "  " not in joined
    # 3. non-space characters are preserved in order
    orig = "".join(c.text for c in chars if not c.text.isspace())
    assert "".join(ch for ch in joined if ch != " ") == orig
    # 4. adjacent spans differ in style (that's why they split)
    for a, b in zip(spans, spans[1:]):
        assert (a.is_bold, a.is_italic, a.size) != (b.is_bold, b.is_italic, b.size)


@settings(max_examples=60, deadline=None)
@given(char_streams())
def test_span_grouping_matches_charwise_feed(chars):
    # feeding the same stream one char at a time must equal the word-item
    # fast path (exercised through html layout) — the equivalence the
    # word-level optimization relies on
    from open_parse_ray.functions.spans import group_char_items_into_spans

    a = group_chars_into_spans(chars)
    items = [(c.text, c.fontname, c.size) for c in chars]
    b = group_char_items_into_spans(items)
    assert [(s.text, s.is_bold, s.is_italic, s.size) for s in a] == [
        (s.text, s.is_bold, s.is_italic, s.size) for s in b
    ]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab *_c.", max_size=6),
            st.booleans(),
            st.booleans(),
            _size,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_line_text_deterministic_and_stable(spans_data):
    spans = tuple(
        TextSpan(text=t, is_bold=b, is_italic=i, size=s) for t, b, i, s in spans_data
    )
    l1 = LineElement(bbox=(0, 0, 10, 12), spans=spans)
    l2 = LineElement(bbox=(0, 0, 10, 12), spans=spans)
    assert l1.text == l2.text  # pure function of spans


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_num_tokens_properties(text):
    n = num_tokens(text)
    assert n >= 0
    assert num_tokens(text) == n  # deterministic
    if text.strip():
        assert n >= 1
    # monotone under concatenation with a word
    assert num_tokens(text + " word") >= n


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["word", "x", None]),  # None → LTAnno-style char
            _size,
        ),
        max_size=20,
    )
)
def test_extract_chars_annotation_inheritance(raw):
    triples = [
        (t if t else " ", None if t is None else "F", None if t is None else s)
        for t, s in raw
    ]
    chars = extract_chars(triples)
    assert len(chars) == len(triples)
    # every char has a concrete font (inherited if annotation)
    fonts = {c.fontname for c in chars}
    assert None not in fonts


@settings(max_examples=30, deadline=None)
@given(
    st.floats(0, 500),
    st.floats(0, 700),
    st.floats(1, 200),
    st.floats(1, 200),
)
def test_bbox_validators_and_combine(x0, y0, w, h):
    a = Bbox(page=0, page_height=792, page_width=612, x0=x0, y0=y0, x1=x0 + w, y1=y0 + h)
    b = Bbox(page=0, page_height=792, page_width=612, x0=x0 + 5, y0=y0 + 5, x1=x0 + w + 5, y1=y0 + h + 5)
    c = a.combine(b)
    assert c.x0 == min(a.x0, b.x0) and c.x1 == max(a.x1, b.x1)
    assert c.y0 == min(a.y0, b.y0) and c.y1 == max(a.y1, b.y1)
    assert a.area > 0


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_followup_probe_matches_brute_force(data):
    """The segment-offset searchsorted band probe equals the O(n²)
    definition: count same-user clicks with ts in (view_ts, view_ts+W]."""
    import numpy as np
    import pandas as pd

    from open_parse_ray.stages.relational import _followup_probe

    n = data.draw(st.integers(0, 40))
    window_us = data.draw(st.sampled_from([1, 1000, 60_000_000]))
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "user_id": data.draw(st.integers(0, 4)),
                "ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(microseconds=data.draw(st.integers(0, 200))),
                "event_type": data.draw(st.sampled_from(["view", "click"])),
            }
        )
    part = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type"]
    )
    if len(part) == 0:
        part = part.astype(
            {"event_id": "int64", "user_id": "int64",
             "ts": "datetime64[us]", "event_type": "object"}
        )
    got = _followup_probe(part, window_us).set_index("event_id")["n_followups"]
    views = part[part["event_type"] == "view"]
    clicks = part[part["event_type"] == "click"]
    for _, v in views.iterrows():
        brute = (
            (clicks["user_id"] == v["user_id"])
            & (clicks["ts"] > v["ts"])
            & (clicks["ts"] <= v["ts"] + pd.Timedelta(microseconds=window_us))
        ).sum()
        assert got[v["event_id"]] == brute


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    st.sampled_from([(25, 50, 75), (50,), (1, 99)]),
)
def test_quantiles_from_hist_match_brute_force(values, ps):
    """Histogram quantile = smallest v with cum_count >= ceil(n*p/100),
    checked against the sorted-array definition."""
    import numpy as np
    import pandas as pd
    from collections import Counter

    from open_parse_ray.stages.relational import _quantiles_from_hist

    c = Counter(values)
    h = pd.DataFrame(
        {
            "event_type": "t",
            "v_cents": np.array(sorted(c), dtype=np.int64),
            "n": np.array([c[v] for v in sorted(c)], dtype=np.int64),
        }
    )
    out = _quantiles_from_hist(h, ps).set_index("p_pct")["v_cents"]
    arr = np.sort(np.array(values))
    n = len(arr)
    for p in ps:
        idx = max(0, (n * p + 99) // 100 - 1)  # 1-based rank -> 0-based index
        assert out[p] == arr[idx]


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_asof_probe_matches_brute_force(data):
    """The segment-offset as-of probe equals the O(n²) definition: the
    max same-user click ts at-or-before each error's ts, else -1."""
    import numpy as np
    import pandas as pd

    from open_parse_ray.stages.relational import _asof_probe

    n = data.draw(st.integers(0, 40))
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "user_id": data.draw(st.integers(0, 4)),
                "ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(microseconds=data.draw(st.integers(0, 200))),
                "event_type": data.draw(st.sampled_from(["error", "click"])),
            }
        )
    part = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    if len(part) == 0:
        part = part.astype(
            {"event_id": "int64", "user_id": "int64",
             "ts": "datetime64[us]", "event_type": "object"}
        )
    got = _asof_probe(part).set_index("event_id")["prev_click_ts_us"]
    errors = part[part["event_type"] == "error"]
    clicks = part[part["event_type"] == "click"]
    for _, e in errors.iterrows():
        prior = clicks[
            (clicks["user_id"] == e["user_id"]) & (clicks["ts"] <= e["ts"])
        ]
        if prior.empty:
            want = -1
        else:
            want = int(
                prior["ts"].max().to_datetime64().astype("datetime64[us]").astype(np.int64)
            )
        assert got[e["event_id"]] == want, (e["event_id"], want, got[e["event_id"]])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=30), min_size=0, max_size=6),
    st.lists(st.text(min_size=1, max_size=30), min_size=0, max_size=4),
)
def test_charset_jaccard_matrix_matches_scalar(texts, sample):
    """The bitset AND+popcount kernel equals the scalar set definition
    on arbitrary unicode (incl. chars absent from the sample alphabet,
    astral plane, empties)."""
    import numpy as np

    from open_parse_ray.stages.dedup import char_jaccard, charset_jaccard_matrix

    jac = charset_jaccard_matrix(texts, sample)
    assert jac.shape == (len(texts), len(sample))
    for i, t in enumerate(texts):
        for j, q in enumerate(sample):
            if len(set(t) | set(q)) == 0:
                assert not np.isfinite(jac[i, j])
            else:
                assert jac[i, j] == char_jaccard(t, q), (t, q)


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="ab \t\n", min_size=0, max_size=60),
    st.text(alphabet="ab \t\n", min_size=0, max_size=60),
)
def test_shingle_hash_set_jaccard_matches_strings(a, b):
    """Hashed-shingle set Jaccard equals string-shingle set Jaccard
    (collision-free at these sizes), incl. the <k-words → None rule."""
    from open_parse_ray.stages.dedup import _shingle_hash_set

    k = 3

    def str_shingles(t):
        w = t.split()
        if len(w) < k:
            return None
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    ha, hb = _shingle_hash_set(a, k), _shingle_hash_set(b, k)
    sa, sb = str_shingles(a), str_shingles(b)
    assert (ha is None) == (sa is None)
    assert (hb is None) == (sb is None)
    if ha is None or hb is None:
        return
    import numpy as np

    inter = len(np.intersect1d(ha, hb))
    union = len(np.union1d(ha, hb))
    assert inter == len(sa & sb) and union == len(sa | sb)


@given(
    st.lists(
        st.floats(allow_nan=False, width=64),
        min_size=2,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_ordered_u64_total_order_matches_float_order(xs):
    """For ANY two non-NaN floats, key order == float order (with the
    -0.0 < +0.0 refinement of the IEEE tie) — the invariant the whole
    MSD-radix quantile selector rests on."""
    import numpy as np

    from open_parse_ray.stages.quantiles import ordered_u64, u64_to_float

    arr = np.array(xs, dtype=np.float64)
    keys = ordered_u64(arr)
    for i in range(len(xs) - 1):
        a, b = arr[i], arr[i + 1]
        ka, kb = int(keys[i]), int(keys[i + 1])
        if a < b:
            assert ka < kb
        elif a > b:
            assert ka > kb
        else:  # equal floats: keys equal unless the ±0.0 tie
            if np.signbit(a) == np.signbit(b):
                assert ka == kb
    for v, k in zip(arr, keys):
        back = u64_to_float(int(k))
        assert back == v and np.signbit(back) == np.signbit(v)


@given(
    st.lists(
        st.tuples(
            st.text(
                # valid URI characters only: the writer REJECTS
                # whitespace/control bytes (header-injection guard,
                # found by this very test before the guard existed)
                alphabet=st.characters(
                    blacklist_categories=("Cs", "Zs", "Cc"), min_codepoint=0x21
                ),
                min_size=1,
                max_size=50,
            ),
            st.binary(min_size=0, max_size=400),
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_warc_record_framing_roundtrips_any_payload(records, gz):
    """WARC response records round-trip ARBITRARY binary payloads and
    unicode URLs, gzipped or plain — Content-Length framing cannot be
    confused by payload bytes (including CRLF runs and fake headers)."""
    import zlib

    from open_parse_ray.sources.warc import (
        gunzip_members,
        iter_warc_records,
        pages_from_warc_bytes,
        response_record,
    )

    blob = b""
    for i, (url, payload) in enumerate(records):
        rec = response_record(url, i * 7 + 1, payload, "en")
        if gz:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = co.compress(rec) + co.flush()
        blob += rec
    rows = pages_from_warc_bytes(blob)
    assert len(rows) == len(records)
    for (url, payload), row in zip(records, rows):
        assert row["html"] == payload
        assert row["url"] == url
        assert row["lang"] == "en"


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_funnel_probe_matches_brute_force(data):
    """The chained first-match funnel probe equals the O(n²) definition:
    a view completes iff its FIRST same-user click in (t1, t1+W] is
    followed by any same-user purchase in (t2, t2+W]."""
    import pandas as pd

    from open_parse_ray.stages.relational import _funnel_probe

    n = data.draw(st.integers(0, 40))
    window_us = data.draw(st.sampled_from([1, 1000, 60_000_000]))
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "user_id": data.draw(st.integers(0, 4)),
                "ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(microseconds=data.draw(st.integers(0, 200))),
                "event_type": data.draw(
                    st.sampled_from(["view", "click", "purchase"])
                ),
            }
        )
    part = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    if len(part) == 0:
        part = part.astype(
            {"event_id": "int64", "user_id": "int64",
             "ts": "datetime64[us]", "event_type": "object"}
        )
    got = _funnel_probe(part, ("view", "click", "purchase"), window_us)
    got = got.set_index("user_id")

    views = part[part["event_type"] == "view"]
    clicks = part[part["event_type"] == "click"]
    purch = part[part["event_type"] == "purchase"]
    w = pd.Timedelta(microseconds=window_us)
    want_n1, want_done = {}, {}
    for _, v in views.iterrows():
        u = v["user_id"]
        want_n1[u] = want_n1.get(u, 0) + 1
        c = clicks[
            (clicks["user_id"] == u)
            & (clicks["ts"] > v["ts"])
            & (clicks["ts"] <= v["ts"] + w)
        ]
        done = False
        if len(c):
            t2 = c["ts"].min()
            done = bool(
                (
                    (purch["user_id"] == u)
                    & (purch["ts"] > t2)
                    & (purch["ts"] <= t2 + w)
                ).any()
            )
        want_done[u] = want_done.get(u, 0) + int(done)
    assert set(got.index) == set(want_n1)
    for u in want_n1:
        assert got.loc[u, "n_step1"] == want_n1[u], u
        assert got.loc[u, "n_completed"] == want_done[u], u


# Frozen (string, true cl100k_base token count) sample — r4-verdict
# worklist #3's fallback gate. Every count is a PUBLIC, reproducible
# tiktoken cl100k_base fact (README example token ids, documented
# digit-grouping and contraction pre-tokenization, common-word single
# tokens), hand-embedded because the environment has no tiktoken
# package, no vocab asset, and no network (re-probed every round; see
# tokens.py docstring). The gate quantifies the analog's delta so a
# user comparing node `tokens` against real open-parse output knows
# the bound: exact on common English prose, and within |delta| <= 2
# per string on BPE-subword splits (rare words, long digit runs).
_CL100K_SAMPLE = [
    ("", 0),                      # trivial
    (" ", 1),                     # [220]
    ("a", 1),                     # [64]
    ("hello world", 2),           # [15339, 1917]
    ("Hello, world!", 4),         # [9906, 11, 1917, 0]
    ("tiktoken is great!", 6),    # [83, 1609, 5963, 374, 2294, 0] — README
    ("The quick brown fox jumps over the lazy dog.", 10),  # 9 words + '.'
    ("1234567890", 4),            # cl100k groups digits 1-3: 123|456|789|0
    ("I don't know.", 5),         # contraction 't split: I| don|'t| know|.
    ("New York City", 3),         # common words are single tokens
]


def test_num_tokens_cl100k_delta_bound():
    """Quantified-delta gate vs frozen true tiktoken cl100k_base counts:
    the analog is EXACT on the common-English-prose strings and within
    |delta| <= 2 everywhere in the sample; mean |delta| <= 0.5. A real
    tiktoken swap (the tokens.py staging seam) must also pass this gate
    with delta == 0 throughout."""
    deltas = [num_tokens(s) - true for s, true in _CL100K_SAMPLE]
    assert all(abs(d) <= 2 for d in deltas), deltas
    assert sum(abs(d) for d in deltas) / len(deltas) <= 0.5, deltas
    exact_expected = [0, 1, 2, 3, 4, 6, 8, 9]  # indexes of prose/simple cases
    for i in exact_expected:
        s, true = _CL100K_SAMPLE[i]
        assert num_tokens(s) == true, (s, num_tokens(s), true)
