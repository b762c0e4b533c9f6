"""PDF-payload ingestion stages (the reference's core payload type).

The reference parses PDFs with pdfminer and wraps elements into Nodes
(reference: src/openparse/text/pdfminer/core.py:209-273,
src/openparse/doc_parser.py); neither pdfminer nor pypdf exists in this
environment, so these stages run the stdlib-only PDF codec in
functions/pdf.py through the SAME span/element/node kernels as the HTML
path — one IR, two payload types.

Scale shape: typeset + parse are per-row pure functions inside an
actor-pool map_batches (bytes never leave the task); the corpus scan is
column-pruned; output rows are small. The end-to-end gate is a DuckDB
SQL oracle: parse(typeset(text)) must reassemble to the
whitespace-normalized source text for EVERY document.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd

from open_parse_ray.functions.pdf import (
    parse_pdf,
    pdf_extracted_text,
    typeset_pdf,
)
from open_parse_ray.model import Node

from open_parse_ray.sources.tables import table_path


def parse_pdf_page(
    pdf_bytes: bytes, pipeline=None
) -> List[Node]:
    """Single-document kernel: PDF bytes → processed node list (the PDF
    analog of pipelines.extraction.parse_page; reference:
    doc_parser.py ingest → Node wrap → pipeline.run)."""
    from open_parse_ray.functions.transforms import BasicIngestionPipeline

    if pipeline is None:
        pipeline = BasicIngestionPipeline()
    elements = parse_pdf(pdf_bytes)
    nodes = [Node(elements=(e,)) for e in elements]
    return pipeline.run(nodes)


class TypesetExtract:
    """Actor stage: documents → typeset PDF → parse → extracted text.

    Fusing the two codec halves in one task keeps the PDF bytes out of
    the object store entirely (at 10^12 docs the corpus would already
    hold pdf bytes — then only the parse half runs here)."""

    def __init__(self, with_title: bool = False):
        self.with_title = with_title

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        texts = []
        for t in b["text"]:
            texts.append(pdf_extracted_text(typeset_pdf(t)))
        return pd.DataFrame({"doc_id": b["doc_id"], "extracted_text": texts})


class TypesetExtractNodes:
    """Actor stage: documents → PDF bytes → full node pipeline →
    per-doc summary (n_pages, n_nodes, total_tokens)."""

    def __init__(self, pipeline: str = "basic"):
        from open_parse_ray.pipelines.extraction import make_pipeline

        self.pipeline = make_pipeline(pipeline)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from open_parse_ray.functions.pdf import pdf_num_pages

        n_pages, n_nodes, tok = [], [], []
        for t in b["text"]:
            pdf = typeset_pdf(t)
            nodes = parse_pdf_page(pdf, self.pipeline)
            n_pages.append(pdf_num_pages(pdf))
            n_nodes.append(len(nodes))
            tok.append(sum(n.tokens for n in nodes))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_pages": np.asarray(n_pages, dtype=np.int64),
                "n_nodes": np.asarray(n_nodes, dtype=np.int64),
                "total_tokens": np.asarray(tok, dtype=np.int64),
            }
        )


class ParsePdfBytes:
    """Actor stage for corpora that already hold PDF payloads: a
    ``pdf_bytes`` binary column in, (extracted_text, n_pages, status)
    out, with poison-payload isolation — corrupt or truncated PDFs
    become ``error:<Type>`` rows, never task failures (the same error
    contract as the media decode stages and the reference-path
    extraction kernels)."""

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from open_parse_ray.functions.pdf import pdf_num_pages

        texts, pages, status = [], [], []
        for payload in b["pdf_bytes"]:
            try:
                texts.append(pdf_extracted_text(payload))
                pages.append(pdf_num_pages(payload))
                status.append("ok")
            except Exception as exc:
                texts.append("")
                pages.append(0)
                status.append(f"error:{type(exc).__name__}")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "extracted_text": texts,
                "n_pages": np.asarray(pages, dtype=np.int64),
                "status": status,
            }
        )


def pdf_extract_text(sf_dir: str):
    """Oracle-backed PDF roundtrip over the whole corpus: returns
    (doc_id, extracted_text) where extracted_text must equal the
    whitespace-normalized source text (DuckDB regexp oracle)."""
    import ray.data as rd

    return rd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(
        TypesetExtract(),  # stateless → task pool (no per-query actor spin-up)
        batch_format="pandas",
        batch_size=256,
    )


def read_pdf_dir(path: str):
    """Source connector for the reference's file-based workflow: a
    directory of .pdf files → Dataset of (url, pdf_bytes) rows via
    Ray's binary-file reader (parallel over files; at corpus scale
    point it at the object-store prefix instead)."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(path, include_paths=True, file_extensions=["pdf"])

    def to_rows(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["path"], "pdf_bytes": t["bytes"]})

    return ds.map_batches(to_rows, batch_format="pyarrow")


def extract_pdf_dir(path: str):
    """Directory of PDFs → per-file extracted text (the reference's
    one-file loop, distributed): read_binary_files → ParsePdfBytes with
    poison-payload isolation. Returns (url, extracted_text, n_pages,
    status)."""
    class Run:
        def __init__(self):
            self.kernel = ParsePdfBytes()

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b.rename(columns={"url": "doc_id"})
            return self.kernel(b).rename(columns={"doc_id": "url"})

    return read_pdf_dir(path).map_batches(
        Run, batch_format="pandas", batch_size=64, concurrency=(1, 8)
    )


def pdf_docs(sf_dir: str):
    """PDF payloads through the full node pipeline: (doc_id, n_pages,
    n_nodes, total_tokens). Rows-checked by the driver; the node-level
    semantics are pytest-gated (tests/test_pdf.py)."""
    import ray.data as rd

    return rd.read_parquet(
        table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(
        TypesetExtractNodes(),  # cheap-init kernel → task pool
        batch_format="pandas",
        batch_size=256,
    )
