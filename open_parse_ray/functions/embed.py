"""Deterministic hermetic embeddings + semantic node merge.

The reference's semantic pipeline embeds node texts with the OpenAI API
(reference: src/openparse/processing/semantic_transforms.py:20-68) and merges
adjacent similar nodes in a fixed-point loop (semantic_transforms.py:71-124).
This engine has no network, so the default embedder is a deterministic
hashed-n-gram model: same text → same vector, across processes and
parallelism levels. The merge loop semantics (sort, adjacent-pair cosine,
token-sum cap, repeat until no change) are preserved exactly.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np

from open_parse_ray.functions.transforms import ProcessingStep
from open_parse_ray.model import Node

DEFAULT_DIM = 64


def cosine_similarity(a, b) -> float:
    """(reference: semantic_transforms.py:14-17). Zero vectors produce
    nan exactly like the reference (nan >= threshold is False, so
    zero-embedding nodes never merge); the warning is suppressed, the
    value is not changed."""
    with np.errstate(invalid="ignore", divide="ignore"):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


_TOKEN_HASH_CACHE: dict = {}
_TOKEN_HASH_CACHE_CAP = 1_000_000


def _token_hash(token: str) -> int:
    """md5-derived 64-bit feature hash, cached per distinct token
    (vocabulary-bounded; the fixed-point merge loop re-embeds every node
    text each round, so uncached hashing dominated the semantic stage)."""
    h = _TOKEN_HASH_CACHE.get(token)
    if h is None:
        if len(_TOKEN_HASH_CACHE) >= _TOKEN_HASH_CACHE_CAP:
            _TOKEN_HASH_CACHE.clear()
        h = int.from_bytes(
            hashlib.md5(token.encode("utf-8", "ignore")).digest()[:8], "little"
        )
        _TOKEN_HASH_CACHE[token] = h
    return h


class HashedNGramEmbeddings:
    """Deterministic local embedding model.

    Words and word-bigrams are hashed into ``dim`` buckets with a signed
    hashing trick, then L2-normalized — the standard feature-hashing text
    embedding. Stateless apart from the dim, so it is safe to construct in
    every actor's ``__init__``.
    """

    def __init__(self, dim: int = DEFAULT_DIM, batch_size: int = 256):
        self.dim = dim
        self.batch_size = batch_size  # parity with reference batching knob
        # text → vector cache: the fixed-point merge loop re-embeds every
        # surviving node text each round; only merged texts are new
        self._vec_cache: dict = {}
        self._vec_cache_cap = 50_000

    def _embed_uncached(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float64)
        words = text.lower().split()
        feats = words + [f"{a}_{b}" for a, b in zip(words, words[1:])]
        for f in feats:
            h = _token_hash(f)
            idx = h % self.dim
            sign = 1.0 if (h >> 63) & 1 == 0 else -1.0
            vec[idx] += sign
        norm = np.linalg.norm(vec)
        if norm > 0:
            vec /= norm
        return vec

    def embed(self, text: str) -> np.ndarray:
        vec = self._vec_cache.get(text)
        if vec is None:
            if len(self._vec_cache) >= self._vec_cache_cap:
                self._vec_cache.clear()
            vec = self._embed_uncached(text)
            self._vec_cache[text] = vec
        return vec

    def embed_many(self, texts: Sequence[str]) -> List[List[float]]:
        """Zero vector for empty texts (reference: semantic_transforms.py:40-59)."""
        return [
            ([0.0] * self.dim if not t else self.embed(t).tolist()) for t in texts
        ]


class CombineNodesSemantically(ProcessingStep):
    """Fixed-point adjacent merge by cosine similarity
    (reference: semantic_transforms.py:71-112)."""

    def __init__(self, embedding_client, min_similarity: float, max_tokens: int):
        self.embedding_client = embedding_client
        self.min_similarity = min_similarity
        self.max_tokens = max_tokens

    def process(self, nodes: List[Node]) -> List[Node]:
        nodes = list(nodes)
        modified = True
        while modified:
            modified = False
            nodes = sorted(nodes)
            embeddings = self.embedding_client.embed_many([n.text for n in nodes])
            i = 0
            while i < len(nodes) - 1:
                similarity = cosine_similarity(embeddings[i], embeddings[i + 1])
                is_within_token_limit = (
                    nodes[i].tokens + nodes[i + 1].tokens <= self.max_tokens
                )
                if similarity >= self.min_similarity and is_within_token_limit:
                    nodes[i] = nodes[i] + nodes[i + 1]
                    del nodes[i + 1]
                    del embeddings[i + 1]
                    modified = True
                    continue
                i += 1
        return nodes


def make_semantic_pipeline(
    min_tokens: int = 256,
    max_tokens: int = 1024,
    dim: int = DEFAULT_DIM,
):
    """The reference's SemanticIngestionPipeline chain with exact parameters
    (reference: ingest.py:95-136), using the hermetic embedder."""
    from open_parse_ray.functions.transforms import (
        CombineBullets,
        CombineHeadingsWithClosestText,
        CombineNodesSpatially,
        CombineSlicedImages,
        IngestionPipeline,
        RemoveFullPageStubs,
        RemoveMetadataElements,
        RemoveNodesBelowNTokens,
        RemoveRepeatedElements,
        RemoveTextInsideTables,
    )

    client = HashedNGramEmbeddings(dim=dim)
    return IngestionPipeline(
        [
            RemoveTextInsideTables(),
            CombineSlicedImages(),
            RemoveFullPageStubs(max_area_pct=0.35),
            CombineNodesSpatially(
                x_error_margin=10, y_error_margin=2, criteria="both_small"
            ),
            CombineHeadingsWithClosestText(),
            CombineBullets(),
            RemoveMetadataElements(),
            RemoveRepeatedElements(threshold=2),
            RemoveNodesBelowNTokens(min_tokens=10),
            CombineBullets(),
            CombineNodesSemantically(
                embedding_client=client, min_similarity=0.6, max_tokens=max_tokens // 2
            ),
            CombineNodesSemantically(
                embedding_client=client, min_similarity=0.55, max_tokens=max_tokens
            ),
            RemoveNodesBelowNTokens(min_tokens=min_tokens),
        ]
    )
