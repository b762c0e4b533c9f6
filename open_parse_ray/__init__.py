"""open_parse_ray — a Ray-Data-native main-content extraction engine.

From-scratch implementation of the reference's (Filimoa/open-parse) query
and data-processing capabilities as streaming ``ray.data.Dataset``
pipelines over Parquet web-page corpora. See SURVEY.md for the operator
inventory and the mapping of each reference operator onto Ray Data.

IMPORTANT: nothing in this package calls ``ray.init`` / ``ray.shutdown`` —
sessions are owned by the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"

from open_parse_ray import consts  # noqa: F401
from open_parse_ray.config import config  # noqa: F401
from open_parse_ray.tokens import num_tokens  # noqa: F401


def __getattr__(name):
    # lazy top-level API (mirrors the reference's `openparse` namespace:
    # DocumentParser, ParsedDocument, Node, processing pipelines) without
    # importing the heavy modules for lightweight consumers
    if name in ("DocumentParser", "ParsedDocument"):
        from open_parse_ray import doc_parser

        return getattr(doc_parser, name)
    if name == "Node":
        from open_parse_ray.model import Node

        return Node
    if name in (
        "BasicIngestionPipeline",
        "NoOpIngestionPipeline",
        "IngestionPipeline",
        "ProcessingStep",
    ):
        from open_parse_ray.functions import transforms

        return getattr(transforms, name)
    raise AttributeError(name)
