"""Deterministic synthetic Common-Crawl-style pages corpus.

BASELINE.json input_hint fixes the input shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data exists in this sandbox, so the corpus is synthesized
deterministically (seeded per doc index — same sf + seed → byte-identical
table at any parallelism) and cached as partitioned Parquet under /tmp.
Documents are built from blocks that exercise every extraction operator:
headings, styled paragraphs, bullet lists, tables with empty cells,
repeated page headers/footers, cookie/nav boilerplate, watermark stubs,
multi-page docs, and a ~1% tail of 100x oversized documents (skew).
"""

from __future__ import annotations

import os
import random
from typing import Dict, List

import numpy as np
import pyarrow as pa

CACHE_ROOT = os.environ.get("OPR_CACHE", "/tmp/opr_cache")
SEED = 42
GEN_VERSION = 2  # bump when gen_html changes → invalidates cached corpora
_EPOCH_US = 1734652800_000_000  # 2024-12-20T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_LANG_CYCLE = ["en", "en", "en", "de", "fr", "xx"]

_WORDS = {
    "en": (
        "the of and to in for with on data query table report value system "
        "result market annual growth revenue product customer service index "
        "model network analysis process total section overview summary detail "
        "performance quarter fiscal policy review board committee project"
    ).split(),
    "de": (
        "der die das und zu in für mit auf daten anfrage tabelle bericht wert "
        "system ergebnis markt jährlich wachstum umsatz produkt kunde dienst "
        "modell netz analyse prozess gesamt abschnitt übersicht detail leistung"
    ).split(),
    "fr": (
        "le la les et de pour avec sur données requête tableau rapport valeur "
        "système résultat marché annuel croissance revenu produit client service "
        "modèle réseau analyse processus total section aperçu résumé détail"
    ).split(),
    "xx": "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod".split(),
}

_HEADINGS = [
    "Overview",
    "Financial Results",
    "Market Analysis",
    "Risk Factors",
    "Operations",
    "Product Roadmap",
    "Customer Metrics",
    "Appendix",
]


def _sentence(rng: random.Random, words: List[str], n: int) -> str:
    toks = [rng.choice(words) for _ in range(n)]
    toks[0] = toks[0].capitalize()
    return " ".join(toks) + "."


def _paragraph(rng: random.Random, words: List[str], n_sentences: int) -> str:
    parts = []
    for _ in range(n_sentences):
        s = _sentence(rng, words, rng.randint(8, 22))
        # inline styling to exercise span grouping + markdown boundaries
        r = rng.random()
        if r < 0.15:
            w = s.split()
            k = rng.randrange(len(w))
            w[k] = f"<b>{w[k]}</b>"
            s = " ".join(w)
        elif r < 0.25:
            w = s.split()
            k = rng.randrange(len(w))
            w[k] = f"<i>{w[k]}</i>"
            s = " ".join(w)
        parts.append(s)
    return " ".join(parts)


def _table_html(rng: random.Random, words: List[str]) -> str:
    n_cols = rng.randint(2, 5)
    n_rows = rng.randint(2, 6)
    headers = [rng.choice(_HEADINGS).split()[0] + str(c) for c in range(n_cols)]
    out = ["<table>", "<tr>"]
    for h in headers:
        out.append(f"<th>{h}</th>")
    out.append("</tr>")
    for _ in range(n_rows):
        out.append("<tr>")
        for _ in range(n_cols):
            if rng.random() < 0.1:
                out.append("<td></td>")  # empty cell → renderer pads with space
            else:
                out.append(f"<td>{rng.randint(1, 99999):,}</td>")
        out.append("</tr>")
    out.append("</table>")
    return "".join(out)


def _bullets_html(rng: random.Random, words: List[str]) -> str:
    tag = "ol" if rng.random() < 0.3 else "ul"
    items = [
        f"<li>{_sentence(rng, words, rng.randint(4, 10))}</li>"
        for _ in range(rng.randint(3, 7))
    ]
    return f"<{tag}>{''.join(items)}</{tag}>"


def gen_html(i: int, seed: int = SEED) -> Dict[str, str]:
    """Build one deterministic document. Returns {html, lang}."""
    rng = random.Random(f"{seed}:{i}")
    lang = _LANG_CYCLE[i % len(_LANG_CYCLE)]
    words = _WORDS[lang]

    header_line = f"Example Corp — Filing {i % 977:04d}"
    footer_line = f"Page confidential — do not distribute ({i % 31})"

    body: List[str] = []
    body.append('<nav><a href="/">Home</a> | <a href="/docs">Docs</a></nav>')
    body.append('<div class="cookie-banner">We use cookies to improve your experience.</div>')
    body.append(f'<div class="page-header">{header_line}</div>')
    body.append(f"<h1>{rng.choice(_HEADINGS)} Report {i}</h1>")

    n_sections = rng.randint(2, 5)
    size_mult = 100 if (i % 97 == 0) else 1  # ~1% oversized tail (skew)
    for s in range(n_sections * size_mult):
        r = rng.random()
        body.append(f"<h2>{rng.choice(_HEADINGS)}</h2>")
        body.append(f"<p>{_paragraph(rng, words, rng.randint(3, 8))}</p>")
        if r < 0.35:
            body.append(_bullets_html(rng, words))
        if 0.35 <= r < 0.55:
            body.append(_table_html(rng, words))
        if 0.55 <= r < 0.62:
            body.append(
                f'<img src="/img/fig-{s % 23}.png" width="320" height="140" '
                f'alt="Figure {s % 23}">'
            )
        if r < 0.12:
            body.append(f"<p>{_sentence(rng, words, 3)}</p>")  # stub fragment
        if rng.random() < 0.25:
            # page break + repeated chrome on the new page
            body.append("<hr>")
            body.append(f'<div class="page-header">{header_line}</div>')
            body.append(f'<div class="page-footer">{footer_line}</div>')
    if rng.random() < 0.1:
        body.append('<div class="watermark">DRAFT</div>')
    body.append(f'<div class="page-footer">{footer_line}</div>')
    body.append('<div class="sidebar-menu">Trending: item one, item two</div>')

    html = (
        "<html><head><title>doc</title><script>var t=1;</script>"
        "<style>.x{color:red}</style></head><body>"
        + "".join(body)
        + "</body></html>"
    )
    return {"html": html, "lang": lang}


def gen_pages_batch(indices: np.ndarray, seed: int = SEED) -> pa.Table:
    """Vector-of-indices → Arrow table batch (used inside map_batches)."""
    from open_parse_ray.functions.html import visible_text

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in indices:
        i = int(i)
        d = gen_html(i, seed)
        urls.append(f"https://example-{seed}.test/doc/{i:08d}")
        tss.append(_EPOCH_US + i * 1_000_000)
        htmls.append(d["html"].encode("utf-8"))
        texts.append(visible_text(d["html"]))
        langs.append(d["lang"])
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def n_docs_for_sf(sf: float) -> int:
    # sf0.001 → 200, sf0.01 → 2,000, sf0.1 → 20,000
    return max(50, int(round(200_000 * sf)))


def sf_from_dir(sf_dir: str) -> float:
    """Parse '.../sf0.01' → 0.01 (fallback 0.001)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def ensure_pages_parquet(sf: float, seed: int = SEED) -> str:
    """Generate (once) and cache the pages corpus as partitioned Parquet.

    Generation runs as a Ray Data pipeline (parallel across index ranges);
    the write is atomic (tmp dir + rename) so concurrent callers are safe.
    """
    import ray
    import ray.data as rd

    out_dir = os.path.join(CACHE_ROOT, f"pages_v{GEN_VERSION}_sf{sf}_seed{seed}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir

    n = n_docs_for_sf(sf)
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)

    num_blocks = max(4, min(64, n // 250))
    ds = rd.range(n, override_num_blocks=num_blocks)
    # batch_size=None → one batch per block → one output file per block,
    # so the corpus has real shards for shard-granular resume (lineage.py)
    ds = ds.map_batches(
        lambda b: gen_pages_batch(b["id"], seed),
        batch_format="numpy",
        batch_size=None,
        zero_copy_batch=True,
    )
    ds.write_parquet(tmp_dir, row_group_size=1024)
    try:
        os.rename(tmp_dir, out_dir)
        with open(marker, "w") as f:
            f.write("ok")
    except OSError:
        # another process won the race; use theirs
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def read_pages(sf_dir_or_sf, columns=None, seed: int = SEED, lang=None):
    """Dataset of pages for an sf directory (or a float sf), column-pruned.

    ``lang`` becomes a PUSHED-DOWN parquet scan predicate (row groups are
    pruned by statistics and non-matching rows never decode or ship), not
    a post-read filter — at corpus scale a post-read lang filter decodes
    and moves every foreign-language html payload one hop for nothing."""
    import ray.data as rd

    sf = sf_dir_or_sf if isinstance(sf_dir_or_sf, float) else sf_from_dir(sf_dir_or_sf)
    path = ensure_pages_parquet(sf, seed)
    kw = {}
    if lang is not None:
        import pyarrow.dataset as pads

        kw["filter"] = pads.field("lang") == lang
    return rd.read_parquet(path, columns=columns, **kw)


# ---------------------------------------------------------------------------
# Alternate source formats (JSON-lines / CSV)
#
# Real Common-Crawl derived corpora arrive in more than one container
# format; WARC-derived JSON commonly base64-encodes the raw payload.
# These readers accept the same logical schema with `html` base64-encoded
# (JSON/CSV cannot carry raw binary) and emit batches identical to the
# Parquet reader's, so every downstream stage is format-agnostic.
# ---------------------------------------------------------------------------


def _decode_pages_batch(t: "pa.Table") -> "pa.Table":
    import base64

    import pyarrow.compute as pc

    html = pa.array(
        [base64.b64decode(v) for v in t["html_b64"].to_pylist()], pa.binary()
    )
    # warc_ts travels as integer epoch-microseconds (lossless; pyarrow
    # strptime has no %f) — cast back to timestamp[us]
    ts = pc.cast(t["warc_ts_us"], pa.timestamp("us"))
    return pa.table(
        {
            "url": pc.cast(t["url"], pa.string()),
            "warc_ts": pc.cast(ts, pa.timestamp("us")),
            "html": html,
            "text": pc.cast(t["text"], pa.string()),
            "lang": pc.cast(t["lang"], pa.string()),
        }
    )


def read_pages_json(path: str, columns=None):
    """Pages corpus from JSON-lines files (html base64 in `html_b64`)."""
    import ray.data as rd

    ds = rd.read_json(path).map_batches(_decode_pages_batch, batch_format="pyarrow")
    return ds.select_columns(columns) if columns else ds


def read_pages_csv(path: str, columns=None):
    """Pages corpus from CSV files (html base64 in `html_b64`; the raw
    `text` column may contain quoted embedded newlines)."""
    import pyarrow.csv as pacsv
    import ray.data as rd

    ds = rd.read_csv(
        path, parse_options=pacsv.ParseOptions(newlines_in_values=True)
    ).map_batches(_decode_pages_batch, batch_format="pyarrow")
    return ds.select_columns(columns) if columns else ds


def export_pages(sf_or_dir, out_path: str, format: str = "json", seed: int = SEED):
    """Write the synthetic corpus in an alternate container format (for
    format-invariance tests and as the migration path from JSON/CSV
    drops into Parquet)."""
    import base64

    import pyarrow.compute as pc
    import ray.data as rd

    def encode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "warc_ts_us": pc.cast(t["warc_ts"], pa.int64()),
                "html_b64": pa.array(
                    [base64.b64encode(v).decode("ascii") for v in t["html"].to_pylist()],
                    pa.string(),
                ),
                "text": t["text"],
                "lang": t["lang"],
            }
        )

    ds = read_pages(sf_or_dir, seed=seed).map_batches(encode, batch_format="pyarrow")
    if format == "json":
        ds.write_json(out_path)
    elif format == "csv":
        ds.write_csv(out_path)
    else:
        raise ValueError(format)
    return out_path
