"""robots.txt parsing + matching (RFC 9309) for crawl-side filtering.

The reference pipeline starts AFTER fetch (open-parse ingests decoded
documents, text/parse.py:9-23), so at crawl scale the politeness gate
is ours to own. This is a real parser/matcher, not a lookup table:

- **Group selection**: lines are grouped by ``User-agent``; we obey the
  ``*`` group (a specific-bot group like ``User-agent: FancyBot`` is
  parsed and then IGNORED for a generic crawler, per RFC 9309 §2.2.1 —
  the most specific matching group applies, and ours matches only
  ``*``). Multiple consecutive User-agent lines share one group.
- **Rule matching**: ``Allow``/``Disallow`` values are path patterns
  matched from the START of the request path; ``*`` matches any run of
  characters and a trailing ``$`` anchors the end (the de-facto
  wildcard grammar RFC 9309 §2.2.3 standardized).
- **Precedence**: the MOST SPECIFIC rule wins = longest pattern string
  (octet count, §2.2.2); on a literal tie Allow wins. No matching rule
  → allowed. An empty rule value is ignored (a bare ``Disallow:``
  means allow-everything, not block-everything).
- Comments (``#``), blank lines and unknown directives
  (``Crawl-delay``, ``Sitemap``) are tolerated and skipped.

Known limitation (documented): patterns and paths are compared as
given — no percent-decoding normalization pass (our synthetic corpus
paths are plain ASCII; a production gate would normalize both sides
first, same matcher).
"""

import re
from typing import List, Tuple


def parse_robots(text: str, agent: str = "*") -> List[Tuple[bool, str]]:
    """Parse robots.txt → the rule list [(is_allow, pattern), ...] of
    the group that applies to ``agent``. Never throws on hostile input
    (unknown lines are skipped)."""
    rules: List[Tuple[bool, str]] = []
    in_group = False  # inside the group that applies to us
    saw_ua = False  # last nonblank line was a User-agent line
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_ua:
                in_group = in_group or val == agent
            else:
                in_group = val == agent
            saw_ua = True
            continue
        saw_ua = False
        if key in ("allow", "disallow") and in_group and val:
            rules.append((key == "allow", val))
    return rules


def _rule_regex(pattern: str) -> "re.Pattern":
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(p) for p in body.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


class RobotsMatcher:
    """Compiled matcher for one robots.txt group: longest-pattern-wins,
    Allow wins literal ties, no-match → allowed."""

    __slots__ = ("_rules",)

    def __init__(self, rules: List[Tuple[bool, str]]):
        # sort once: longer pattern first; Allow before Disallow on ties
        self._rules = sorted(
            ((len(p), allow, _rule_regex(p)) for allow, p in rules),
            key=lambda t: (-t[0], not t[1]),
        )

    def allowed(self, path: str) -> bool:
        for _, allow, rx in self._rules:
            if rx.match(path):
                return allow
        return True


def synth_robots_txt(source: str) -> str:
    """Deterministic per-domain robots.txt for the synthetic corpus
    (the synth_messy_url pattern): with a = len(source) % 10, the
    generic-agent group disallows the /d/{a} prefix, re-allows the
    longer /d/{a}{(a+1)%10}, and blocks every path ending in 7 via the
    wildcard rule — so precedence is exercised end-to-end (lengths
    7 > 6 > 5). The FancyBot group and the unknown directives must be
    parsed past, not obeyed. The SQL oracle reproduces the verdict in
    closed form from (doc_id, source) alone."""
    a = len(source) % 10
    return (
        f"# robots for {source}.org\n"
        "User-agent: FancyBot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        f"Disallow: /d/{a}\n"
        f"Allow: /d/{a}{(a + 1) % 10}\n"
        "Disallow: /d/*7$\n"
        "Disallow: /private\n"
        "Disallow:\n"  # empty value: ignored, not block-everything
        "Crawl-delay: 2\n"
        "Sitemap: https://example.org/sitemap.xml\n"
    )
