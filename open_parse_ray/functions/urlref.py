"""RFC 3986 URI reference resolution + anchor-href extraction.

The crawl-frontier primitive: a page's outlinks are its <a href>
values resolved against the page URL per RFC 3986 §5.2 (merge with the
base path, remove_dot_segments, query/fragment inheritance rules).
Implemented from the RFC's pseudocode — validated against the RFC §5.4
normal/abnormal reference examples and fuzzed for agreement with
urllib.parse.urljoin (the stdlib's independent implementation of the
same algorithm) in tests/test_ranking_and_web.py.

Reference scope: open-parse consumes documents, not crawls; this module
is part of the web-corpus layer that FEEDS such a pipeline (reference
evals/run_evals.py walks a directory — at web scale the directory is a
link graph).
"""

from __future__ import annotations

import html as _html
import re
from typing import List, Optional, Tuple

# RFC 3986 appendix B regex, anchored.
_URI_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)"
    r"(?:\?([^#]*))?(?:#(.*))?$",
    re.S,
)

Parts = Tuple[Optional[str], Optional[str], str, Optional[str], Optional[str]]


def split_uri(u: str) -> Parts:
    """(scheme, authority, path, query, fragment); absent components are
    None (an EMPTY query/fragment is '' — the distinction matters for
    inheritance: '?' clears the base query, no '?' keeps it)."""
    m = _URI_RE.match(u)
    assert m is not None  # the regex matches any string
    return m.group(1), m.group(2), m.group(3) or "", m.group(4), m.group(5)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — iterative, strictly consuming the input buffer
    (every branch removes at least one character)."""
    out: List[str] = []
    inp = path
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            j = inp.find("/", 1)  # first segment incl. a leading '/'
            if j == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:j])
                inp = inp[j:]
    return "".join(out)


def _merge(base_authority: Optional[str], base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.2.3."""
    if base_authority is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    return base_path[: i + 1] + ref_path if i >= 0 else ref_path


def _recompose(parts: Parts) -> str:
    """RFC 3986 §5.3."""
    scheme, authority, path, query, fragment = parts
    r = []
    if scheme is not None:
        r.append(scheme + ":")
    if authority is not None:
        r.append("//" + authority)
    r.append(path)
    if query is not None:
        r.append("?" + query)
    if fragment is not None:
        r.append("#" + fragment)
    return "".join(r)


def resolve_reference(base: str, ref: str) -> str:
    """RFC 3986 §5.2.2 transform-references (strict: a ref carrying its
    own scheme is treated as absolute even if the scheme matches)."""
    bs, ba, bp, bq, _bf = split_uri(base)
    rs, ra, rp, rq, rf = split_uri(ref)
    if rs is not None:
        t: Parts = (rs, ra, remove_dot_segments(rp), rq, rf)
    elif ra is not None:
        t = (bs, ra, remove_dot_segments(rp), rq, rf)
    elif rp == "":
        t = (bs, ba, bp, rq if rq is not None else bq, rf)
    elif rp.startswith("/"):
        t = (bs, ba, remove_dot_segments(rp), rq, rf)
    else:
        t = (bs, ba, remove_dot_segments(_merge(ba, bp, rp)), rq, rf)
    return _recompose(t)


# --- anchor-href extraction -------------------------------------------------

_A_TAG_RE = re.compile(r"<a\b([^>]*)>", re.I | re.S)
_HREF_RE = re.compile(
    r"""\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)


def extract_hrefs(html_text: str) -> List[str]:
    """href values of <a> tags in document order — double-quoted,
    single-quoted or unquoted attribute syntax, entity-decoded
    (&amp; in query strings). <a> tags without href (pure anchors) and
    hrefs on other tags (<link>, <area>, <base>) are NOT outlinks."""
    out: List[str] = []
    for m in _A_TAG_RE.finditer(html_text):
        hm = _HREF_RE.search(m.group(1))
        if hm is None:
            continue
        raw = next(g for g in hm.groups() if g is not None)
        out.append(_html.unescape(raw).strip())
    return out


def host_of(url: str) -> str:
    """Registered host of an absolute URL: authority minus userinfo and
    port, lowercased."""
    _s, authority, _p, _q, _f = split_uri(url)
    if not authority:
        return ""
    host = authority.rsplit("@", 1)[-1]
    if host.startswith("["):
        # IPv6 literal: keep the brackets, strip any :port AFTER them
        end = host.find("]")
        if end != -1:
            host = host[: end + 1]
    else:
        host = host.split(":", 1)[0]
    return host.lower()


_A_FULL_RE = re.compile(r"<a\b([^>]*)>(.*?)</a\s*>", re.I | re.S)
_TAG_STRIP_RE = re.compile(r"<[^>]*>")


def extract_links(html_text: str) -> List[Tuple[str, str]]:
    """(href, anchor_text) pairs of <a> tags in document order. Anchor
    text is the tag's inner text with nested tags stripped, entities
    decoded and whitespace normalized (the form an anchor-text index
    stores). <a> tags without href are skipped, same as extract_hrefs."""
    out: List[Tuple[str, str]] = []
    for m in _A_FULL_RE.finditer(html_text):
        hm = _HREF_RE.search(m.group(1))
        if hm is None:
            continue
        raw = next(g for g in hm.groups() if g is not None)
        text = _html.unescape(_TAG_STRIP_RE.sub(" ", m.group(2)))
        out.append((_html.unescape(raw).strip(), " ".join(text.split())))
    return out
