"""Flagship pipeline: pages → elements → transform chain → nodes/docs tables.

The reference's ``DocumentParser.parse`` (reference: src/openparse/
doc_parser.py:83-126) is a single-process per-file loop; here the same
per-document kernel runs inside ``map_batches`` over zero-copy Arrow
batches of a streaming ``ray.data.Dataset``. Per-row try/except converts
poison documents into ``status``/``error`` columns instead of failing the
block (at 10^12 rows a single bad doc must not kill a task — the reference
aborts, we must not). Node ids are deterministic hashes of (url, index):
the reference's uuid4 ids (schemas.py:428-432) would break byte-identical
replay and resume.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional

import pyarrow as pa

from open_parse_ray.functions.embed import make_semantic_pipeline
from open_parse_ray.functions.html import html_to_elements
from open_parse_ray.functions.transforms import (
    BasicIngestionPipeline,
    IngestionPipeline,
    NoOpIngestionPipeline,
)
from open_parse_ray.model import Node

DOC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("n_nodes", pa.int32()),
        ("n_pages", pa.int32()),
        ("total_tokens", pa.int64()),
        ("node_texts", pa.list_(pa.string())),
        ("extracted_text", pa.string()),
    ]
)

NODE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("node_idx", pa.int32()),
        ("node_id", pa.string()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("variants", pa.list_(pa.string())),
        ("text", pa.string()),
        ("tokens", pa.int64()),
        ("start_page", pa.int32()),
        ("end_page", pa.int32()),
        ("n_elements", pa.int32()),
        (
            "bbox",
            pa.list_(
                pa.struct(
                    [
                        ("page", pa.int32()),
                        ("page_height", pa.float64()),
                        ("page_width", pa.float64()),
                        ("x0", pa.float64()),
                        ("y0", pa.float64()),
                        ("x1", pa.float64()),
                        ("y1", pa.float64()),
                    ]
                )
            ),
        ),
    ]
)


def make_pipeline(name: str) -> IngestionPipeline:
    if name == "basic":
        return BasicIngestionPipeline()
    if name == "noop":
        return NoOpIngestionPipeline()
    if name == "semantic":
        return make_semantic_pipeline()
    raise ValueError(f"unknown pipeline {name!r}")


def node_id(url: str, idx: int) -> str:
    return hashlib.sha1(f"{url}:{idx}".encode()).hexdigest()[:16]


def parse_page(html, pipeline: Optional[IngestionPipeline] = None) -> List[Node]:
    """Single-document pure-python kernel: HTML → processed node list.

    This is the oracle the Ray pipeline must match byte-for-byte per url
    (pytest gate in tests/test_pipeline_identity.py).
    """
    if pipeline is None:
        pipeline = BasicIngestionPipeline()
    elements = html_to_elements(html)
    nodes = [Node(elements=(e,)) for e in elements]
    return pipeline.run(nodes)


def doc_row(url: str, nodes: List[Node]) -> Dict:
    node_texts = [n.text for n in nodes]
    return {
        "url": url,
        "status": "ok",
        "error": "",
        "n_nodes": len(nodes),
        "n_pages": (max((n.end_page for n in nodes), default=-1) + 1),
        "total_tokens": sum(n.tokens for n in nodes),
        "node_texts": node_texts,
        "extracted_text": "\n\n".join(node_texts),
    }


def _err_row(url: str, exc: Exception) -> Dict:
    return {
        "url": url,
        "status": "error",
        "error": f"{type(exc).__name__}: {exc}"[:500],
        "n_nodes": 0,
        "n_pages": 0,
        "total_tokens": 0,
        "node_texts": [],
        "extracted_text": "",
    }


class ExtractDocs:
    """map_batches kernel: pages batch → one doc-summary row per page.

    A callable class so stateful use (actor pool) is available; the
    pipeline object and compiled regexes are built once per actor in
    ``__init__`` rather than per batch. Stateless task mode also works
    (Ray constructs it per task) — the constructor is cheap by design.
    """

    def __init__(self, pipeline: str = "basic"):
        self.pipeline_name = pipeline
        self.pipeline = make_pipeline(pipeline)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        rows = []
        for url, html in zip(urls, htmls):
            try:
                nodes = parse_page(html, self.pipeline)
                rows.append(doc_row(url, nodes))
            except Exception as exc:  # poison-doc isolation
                rows.append(_err_row(url, exc))
        return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


class ExtractNodes:
    """map_batches kernel: pages batch → one row per extracted node.

    Poison-doc parity with :class:`ExtractDocs`: a document whose parse
    raises emits ONE counted error row (status="error", node_idx=-1)
    instead of silently vanishing — at corpus scale a silent drop is an
    unaccounted row with no way to audit coverage."""

    def __init__(self, pipeline: str = "basic"):
        self.pipeline = make_pipeline(pipeline)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            try:
                nodes = parse_page(html, self.pipeline)
            except Exception as exc:  # poison-doc isolation, counted
                rows.append(
                    {
                        "url": url,
                        "node_idx": -1,
                        "node_id": "",
                        "status": "error",
                        "error": f"{type(exc).__name__}: {exc}"[:500],
                        "variants": [],
                        "text": "",
                        "tokens": 0,
                        "start_page": 0,
                        "end_page": 0,
                        "n_elements": 0,
                        "bbox": [],
                    }
                )
                continue
            for idx, n in enumerate(nodes):
                rows.append(
                    {
                        "url": url,
                        "node_idx": idx,
                        "node_id": node_id(url, idx),
                        "status": "ok",
                        "error": "",
                        "variants": sorted(n.variant),
                        "text": n.text,
                        "tokens": n.tokens,
                        "start_page": n.start_page,
                        "end_page": n.end_page,
                        "n_elements": len(n.elements),
                        "bbox": [
                            {
                                "page": b.page,
                                "page_height": b.page_height,
                                "page_width": b.page_width,
                                "x0": b.x0,
                                "y0": b.y0,
                                "x1": b.x1,
                                "y1": b.y1,
                            }
                            for b in n.bbox
                        ],
                    }
                )
        return pa.Table.from_pylist(rows, schema=NODE_SCHEMA)


LINKED_NODE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("doc_id", pa.string()),
        ("node_idx", pa.int32()),
        ("node_id", pa.string()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("text", pa.string()),
        ("tokens", pa.int64()),
        ("prev_id", pa.string()),
        ("next_id", pa.string()),
        ("parent_id", pa.string()),
    ]
)


class ExtractLinkedNodes:
    """map_batches kernel: pages batch → llama-index-style linked nodes.

    Mirrors ``ParsedDocument.to_llama_index_nodes`` (reference:
    src/openparse/schemas.py:707-762): nodes in reading order, each linked
    to its PREVIOUS/NEXT sibling and PARENT document. The window is
    per-document and every document's nodes are produced inside one batch
    call, so the linkage never crosses a block boundary — no shuffle."""

    def __init__(self, pipeline: str = "basic"):
        self.pipeline = make_pipeline(pipeline)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            doc_id = hashlib.sha1(url.encode()).hexdigest()[:16]
            try:
                nodes = parse_page(html, self.pipeline)
            except Exception as exc:  # poison-doc isolation, counted
                rows.append(
                    {
                        "url": url,
                        "doc_id": doc_id,
                        "node_idx": -1,
                        "node_id": "",
                        "status": "error",
                        "error": f"{type(exc).__name__}: {exc}"[:500],
                        "text": "",
                        "tokens": 0,
                        "prev_id": "",
                        "next_id": "",
                        "parent_id": doc_id,
                    }
                )
                continue
            ids = [node_id(url, i) for i in range(len(nodes))]
            for i, n in enumerate(nodes):
                rows.append(
                    {
                        "url": url,
                        "doc_id": doc_id,
                        "node_idx": i,
                        "node_id": ids[i],
                        "status": "ok",
                        "error": "",
                        "text": n.text,
                        "tokens": n.tokens,
                        "prev_id": ids[i - 1] if i > 0 else "",
                        "next_id": ids[i + 1] if i + 1 < len(ids) else "",
                        "parent_id": doc_id,
                    }
                )
        return pa.Table.from_pylist(rows, schema=LINKED_NODE_SCHEMA)


def extract(
    ds,
    pipeline: str = "basic",
    output: str = "docs",
    batch_size: int = 32,
    skew_split_bytes: Optional[int] = None,
    lang: Optional[str] = None,
    concurrency=None,
):
    """Build the streaming extraction pipeline over a pages Dataset.

    Skew handling (north rule) is block-granular by default: Ray Data caps
    block size (``DataContext.target_max_block_size``), so oversized
    documents land in blocks with few rows and get their own tasks, while
    ``batch_size`` bounds how many documents share one kernel invocation —
    a 100x document delays at most one small batch, never a partition.
    Measured on the 20k-doc corpus this single-pass plan beats the
    two-branch size split ~2x at 32 CPUs: it reads the input once and
    keeps read→extract fused.

    For pathological skew (document sizes varying 1000x inside a block),
    ``skew_split_bytes`` enables the explicit two-branch plan: rows above
    the threshold get a dedicated branch repartitioned to one row per
    block (one task per oversized document, ``batch_size=1``) and unioned
    back. That costs a second pass over the input — worth it only when
    stragglers dominate. ``lang`` applies a vectorized Arrow filter before
    parsing (prune early).
    """
    import pyarrow.compute as pc

    kernel_cls = {
        "docs": ExtractDocs,
        "nodes": ExtractNodes,
        "linked_nodes": ExtractLinkedNodes,
    }[output]
    kw = {"batch_format": "pyarrow"}
    if concurrency is not None:
        kw["concurrency"] = concurrency

    if lang is not None:
        ds = ds.map_batches(
            lambda t, _l=lang: t.filter(pc.equal(t["lang"], _l)),
            batch_format="pyarrow",
        )

    if skew_split_bytes:
        thr = skew_split_bytes
        small = ds.map_batches(
            lambda t: t.filter(pc.less_equal(pc.binary_length(t["html"]), thr)),
            batch_format="pyarrow",
        )
        large = ds.map_batches(
            lambda t: t.filter(pc.greater(pc.binary_length(t["html"]), thr)),
            batch_format="pyarrow",
        )
        out_small = small.map_batches(
            kernel_cls(pipeline), batch_size=batch_size, **kw
        )
        # One row per block: without this, read→filter→extract fuse into a
        # single task per input block and a block's several 100x documents
        # run serially — the straggler that capped scaling efficiency.
        # The exchange only moves the (rare) oversized rows, never the
        # corpus, so it stays cheap at any scale.
        out_large = large.repartition(target_num_rows_per_block=1).map_batches(
            kernel_cls(pipeline), batch_size=1, **kw
        )
        return out_small.union(out_large)

    return ds.map_batches(kernel_cls(pipeline), batch_size=batch_size, **kw)


def prepare_training_corpus(
    sf_dir_or_ds,
    lang: str = "en",
    min_tokens: int = 50,
    dedup_parts: int = 32,
):
    """The end-to-end training-data preparation pipeline this engine
    exists for — every stage streaming, in one lazy Dataset:

      pages → (lang filter at the read) → extraction (basic chain) →
      quality gate (status ok, ≥ min_tokens) → corpus-level EXACT dedup
      on the extracted text (16-byte fp shuffle, min-url survivor) →
      (url, total_tokens, n_nodes, fp).

    Composes the per-document reference semantics with the corpus-level
    scale operators; deterministic output at any parallelism (gated by
    tests/test_pipeline_identity.py::test_prepare_training_corpus_*).
    """
    import hashlib as _hashlib

    import pandas as pd

    from open_parse_ray.sources.pages import read_pages
    from open_parse_ray.stages.dedup import salted_groupby

    if hasattr(sf_dir_or_ds, "map_batches"):
        # caller-supplied Dataset: apply lang as a vectorized post-read
        # filter (we can't reach into its scan)
        docs = extract(sf_dir_or_ds, pipeline="basic", output="docs", lang=lang)
    else:
        # dir input: push the lang predicate into the parquet scan
        ds = read_pages(sf_dir_or_ds, columns=["url", "html"], lang=lang)
        docs = extract(ds, pipeline="basic", output="docs")

    def quality_gate(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["status"] == "ok") & (b["total_tokens"] >= min_tokens)]
        fp = [
            _hashlib.md5(t.encode("utf-8")).hexdigest()[:16]
            for t in b["extracted_text"]
        ]
        return pd.DataFrame(
            {
                "url": b["url"],
                "total_tokens": b["total_tokens"].astype("int64"),
                "n_nodes": b["n_nodes"].astype("int64"),
                "fp": fp,
            }
        )

    gated = docs.map_batches(quality_gate, batch_format="pandas", batch_size=1024)

    def keep_first(part: pd.DataFrame) -> pd.DataFrame:
        # survivor = lexicographically smallest url per distinct text fp
        return part.sort_values("url").drop_duplicates("fp", keep="first")

    return salted_groupby(
        gated,
        lambda b: pd.util.hash_pandas_object(b["fp"], index=False).astype("int64"),
        keep_first,
        num_parts=dedup_parts,
    )
