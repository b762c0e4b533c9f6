"""Node-list transforms — the per-document "relational" layer.

Re-implements every ProcessingStep of the reference
(reference: src/openparse/processing/basic_transforms.py,
src/openparse/processing/ingest.py) as pure kernels over our Node model.
All steps are strictly per-document: they run *inside* a ``map_batches``
batch on one document's node list, never across documents, so they
parallelize embarrassingly and need no shuffle. Order-sensitive steps
(CombineNodesSpatially is an order-dependent O(n²) fold,
basic_transforms.py:299-327) must receive reading-order-sorted input —
the pipeline re-sorts before every step exactly like the reference
(ingest.py:37-44).
"""

from __future__ import annotations

from typing import Dict, List, Literal, Optional

import numpy as np

from open_parse_ray.model import Bbox, ImageElement, Node, TextElement

# bounded memo for CombineSlicedImages pixel stitches (pure function of
# the slice payload tuple; templated corpora repeat figures heavily)
_STITCH_CACHE: dict = {}


class ProcessingStep:
    """User extension surface: subclass and implement ``process``
    (reference: basic_transforms.py:23-29)."""

    def process(self, nodes: List[Node]) -> List[Node]:
        raise NotImplementedError("Subclasses must implement this method.")


class RemoveTextInsideTables(ProcessingStep):
    """Per-page spatial anti-semi-join: drop TextElements whose bbox
    intersects any same-page table bbox (reference: basic_transforms.py:122-171).
    Tables per document are tiny, so the build side is a per-page dict —
    a broadcast-small-side join *within the row*."""

    def process(self, nodes: List[Node]) -> List[Node]:
        tables_by_page: Dict[int, List[Bbox]] = {}
        for node in nodes:
            if node.variant == {"table"}:
                for el in node.elements:
                    tables_by_page.setdefault(el.page, []).append(el.bbox)

        updated_nodes = []
        for node in nodes:
            if node.variant == {"table"}:
                updated_nodes.append(node)
                continue
            new_elements = []
            for element in node.elements:
                inside = isinstance(element, TextElement) and any(
                    self._intersects(element.bbox, tb)
                    for tb in tables_by_page.get(element.page, ())
                )
                if not inside:
                    new_elements.append(element)
            if new_elements and len(new_elements) != len(node.elements):
                updated_nodes.append(Node(elements=tuple(new_elements)))
            elif len(new_elements) == len(node.elements):
                updated_nodes.append(node)
        return updated_nodes

    @staticmethod
    def _intersects(text_bbox: Bbox, table_bbox: Bbox) -> bool:
        # border contact counts as inside (basic_transforms.py:164-171)
        return (
            text_bbox.x1 > table_bbox.x0
            and text_bbox.x0 < table_bbox.x1
            and text_bbox.y1 > table_bbox.y0
            and text_bbox.y0 < table_bbox.y1
        )


class CombineSlicedImages(ProcessingStep):
    """Re-join images sliced by the source format (reference:
    basic_transforms.py:32-119). Real PIXEL stitch via the in-repo
    PNG/BMP codecs (stages/multimodal.py): decode every slice, paste
    vertically at x=0 onto a black RGB canvas of (max width, summed
    height) — exactly the reference's `Image.new("RGB")` + sequential
    `paste` — and re-encode as PNG. Payloads no codec recognizes fall
    back to the deterministic byte-concat (still groups + rewrites)."""

    @staticmethod
    def _decode_rgb(payload: bytes):
        """Slice bytes → (H, W, 3) uint8 or None if not decodable."""
        from open_parse_ray.stages.multimodal import decode_bmp, decode_png

        try:
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                img = decode_png(payload)
            elif payload[:2] == b"BM":
                img = decode_bmp(payload)
            else:
                return None
        except Exception:
            return None
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 1:  # gray → RGB, as PIL convert would
            img = np.repeat(img, 3, axis=2)
        elif img.shape[2] == 4:  # RGBA paste w/o mask drops alpha
            img = img[:, :, :3]
        return img

    def _combine_images_in_group(self, image_elements) -> ImageElement:
        if not image_elements:
            raise ValueError("No images to combine.")
        from open_parse_ray.stages.multimodal import encode_png

        # stitch is a pure function of the slice payloads; templated
        # corpora repeat the same figures across pages, so memoize the
        # decode→paste→encode (bounded module cache, hot-kernel pattern)
        key = tuple(e.image for e in image_elements)
        stitched = _STITCH_CACHE.get(key)
        if stitched is None:
            imgs = [self._decode_rgb(e.image) for e in image_elements]
            if any(i is None for i in imgs):
                stitched = b"".join(e.image for e in image_elements)
            else:
                width = max(i.shape[1] for i in imgs)
                total_height = sum(i.shape[0] for i in imgs)
                canvas = np.zeros((total_height, width, 3), dtype=np.uint8)
                y = 0
                for img in imgs:
                    canvas[y : y + img.shape[0], : img.shape[1]] = img
                    y += img.shape[0]
                stitched = encode_png(canvas)
            if len(_STITCH_CACHE) < 2048:
                _STITCH_CACHE[key] = stitched
        return ImageElement(
            bbox=image_elements[0].bbox,
            image=stitched,
            image_mimetype="image/png",
            text="",
        )

    def _group_overlapping_images(self, image_elements, buffer: float = 1.0):
        groups = []
        used = set()
        for i, elem1 in enumerate(image_elements):
            if i in used:
                continue
            group = [elem1]
            used.add(i)
            queue = [elem1]
            while queue:
                current = queue.pop()
                for j, elem2 in enumerate(image_elements):
                    if j in used:
                        continue
                    if current.overlaps(elem2, buffer=buffer):
                        group.append(elem2)
                        used.add(j)
                        queue.append(elem2)
            groups.append(group)
        return groups

    def process(self, nodes: List[Node]) -> List[Node]:
        nodes_by_page: Dict[int, List[Node]] = {}
        for node in nodes:
            for page in {e.bbox.page for e in node.elements}:
                nodes_by_page.setdefault(page, []).append(node)

        new_nodes = []
        for page, page_nodes in nodes_by_page.items():
            image_nodes = [n for n in page_nodes if n.variant == {"image"}]
            if image_nodes:
                image_elements = [
                    e
                    for n in image_nodes
                    for e in n.elements
                    if isinstance(e, ImageElement)
                ]
                text_elements = [
                    e
                    for n in page_nodes
                    for e in n.elements
                    if isinstance(e, TextElement)
                ]
                combined_image = self._combine_images_in_group(image_elements)
                new_nodes.append(Node(elements=(combined_image, *text_elements)))
            else:
                new_nodes.extend(page_nodes)
        return new_nodes


class RemoveFullPageStubs(ProcessingStep):
    """Drop single-page stub nodes covering >= max_area_pct of the page
    (reference: basic_transforms.py:174-201)."""

    def __init__(self, max_area_pct: float):
        assert 0 <= max_area_pct <= 1, "max_area_pct must be between 0 and 1."
        self.max_area_pct = max_area_pct

    def process(self, nodes: List[Node]) -> List[Node]:
        res = []
        for node in nodes:
            node_bbox = node.bbox[0]
            page_area = node_bbox.page_width * node_bbox.page_height
            if node.num_pages > 1:
                res.append(node)
            elif node_bbox.area / page_area < self.max_area_pct:
                res.append(node)
            elif not node.is_stub:
                res.append(node)
        return res


class RemoveMetadataElements(ProcessingStep):
    """Boilerplate strip: drop stub nodes outside the [10%, 90%] vertical
    band — headers, footers, page numbers (reference: basic_transforms.py:204-232)."""

    def __init__(self, min_y0_pct: float = 0.1, max_y0_pct: float = 0.90):
        self.min_y0_pct = min_y0_pct
        self.max_y0_pct = max_y0_pct

    def process(self, nodes: List[Node]) -> List[Node]:
        res = []
        for node in nodes:
            if not node.elements:
                continue
            first_bbox = node.elements[0].bbox
            last_bbox = node.elements[-1].bbox
            if first_bbox.page != last_bbox.page:
                continue  # multi-page nodes are ignored (dropped), per reference
            is_within_allowed_range = (
                first_bbox.y0 >= first_bbox.page_height * self.min_y0_pct
                and last_bbox.y1 <= first_bbox.page_height * self.max_y0_pct
            )
            if is_within_allowed_range or not node.is_stub:
                res.append(node)
        return res


class RemoveRepeatedElements(ProcessingStep):
    """Group-by text → count → drop ALL copies where count > threshold
    (reference: basic_transforms.py:235-258 — drop-all, not keep-first).
    Scope is one document; a corpus-level variant lives in stages/dedup.py."""

    def __init__(self, threshold: int = 2):
        self.threshold = threshold

    def process(self, nodes: List[Node]) -> List[Node]:
        text_counts: Dict[str, int] = {}
        for node in nodes:
            if node.text:
                text_counts[node.text] = text_counts.get(node.text, 0) + 1
        repeated = {t for t, c in text_counts.items() if c > self.threshold}
        return [n for n in nodes if not n.text or n.text not in repeated]


class RemoveNodesBelowNTokens(ProcessingStep):
    """Drop nodes with tokens <= min unless they contain an image
    (reference: basic_transforms.py:261-275)."""

    def __init__(self, min_tokens: int):
        self.min_tokens = min_tokens

    def process(self, nodes: List[Node]) -> List[Node]:
        return [
            n
            for n in nodes
            if not (n.tokens <= self.min_tokens and "image" not in n.variant)
        ]


class CombineNodesSpatially(ProcessingStep):
    """Order-sensitive iterative pairwise merge of spatially-close nodes
    (reference: basic_transforms.py:278-327). Never parallelize within a
    document: the result depends on iteration order."""

    def __init__(
        self,
        x_error_margin: float = 0,
        y_error_margin: float = 0,
        criteria: Literal["both_small", "either_stub"] = "both_small",
    ):
        self.x_error_margin = x_error_margin
        self.y_error_margin = y_error_margin
        self.criteria = criteria

    def process(self, nodes: List[Node]) -> List[Node]:
        # Semantically identical to the reference's order-sensitive fold
        # (pop head; merge into the FIRST earlier node that overlaps and
        # meets the criteria; else append), but indexed so the inner scan
        # only visits candidates that could possibly merge:
        #   - overlaps() requires a shared page → per-page index
        #   - "both_small" requires BOTH small → skip non-small currents
        #     entirely and keep a per-target small flag
        #   - "either_stub" with a non-stub current requires a stub target
        # Skipped pairs are exactly those where the reference's
        # criteria_bool/overlaps conjunction is False, so the first-match
        # index — and therefore the result — is unchanged. The naive loop
        # is O(n² · pages²); on 1000-node documents (the skew tail) this
        # is the extraction hot spot.
        from bisect import insort

        combined_nodes: List[Node] = []
        flags: List[bool] = []  # is_small / is_stub per combined node
        by_page: Dict[int, List[int]] = {}  # page → ascending indices

        both_small = self.criteria == "both_small"
        either_stub = self.criteria == "either_stub"

        def _flag(n: Node) -> bool:
            return n.is_small if both_small else (n.is_stub if either_stub else False)

        def _register(idx: int, n: Node) -> None:
            for b in n.bbox:
                lst = by_page.setdefault(b.page, [])
                if not lst or lst[-1] < idx:
                    lst.append(idx)
                elif idx not in lst:
                    insort(lst, idx)

        for current_node in nodes:
            cur_small = current_node.is_small if both_small else False
            cur_stub = current_node.is_stub if either_stub else False
            if (both_small and not cur_small) or not (both_small or either_stub):
                # criteria can never hold → reference would append directly
                idx = len(combined_nodes)
                combined_nodes.append(current_node)
                flags.append(_flag(current_node))
                _register(idx, current_node)
                continue

            cur_pages = [b.page for b in current_node.bbox]
            if len(cur_pages) == 1:
                candidates = by_page.get(cur_pages[0], ())
            else:
                seen = set()
                candidates = []
                for p in cur_pages:
                    for i in by_page.get(p, ()):
                        if i not in seen:
                            seen.add(i)
                            candidates.append(i)
                candidates.sort()

            merged_at = -1
            for i in candidates:
                if both_small:
                    if not flags[i]:
                        continue
                elif either_stub and not cur_stub and not flags[i]:
                    continue
                if current_node.overlaps(
                    combined_nodes[i], self.x_error_margin, self.y_error_margin
                ):
                    merged_at = i
                    break

            if merged_at >= 0:
                new = Node(
                    elements=combined_nodes[merged_at].elements + current_node.elements
                )
                combined_nodes[merged_at] = new
                flags[merged_at] = _flag(new)
                _register(merged_at, new)
            else:
                idx = len(combined_nodes)
                combined_nodes.append(current_node)
                flags.append(_flag(current_node))
                _register(idx, current_node)
        return combined_nodes


class CombineBullets(ProcessingStep):
    """Sequential merge of adjacent nodes when prev ends with a bullet and
    next starts with one (reference: basic_transforms.py:330-349)."""

    def process(self, nodes: List[Node]) -> List[Node]:
        combined_nodes = []
        i = 0
        while i < len(nodes):
            current_combination = nodes[i]
            while (
                i + 1 < len(nodes)
                and current_combination.ends_with_bullet
                and nodes[i + 1].starts_with_bullet
            ):
                current_combination = current_combination + nodes[i + 1]
                i += 1
            combined_nodes.append(current_combination)
            i += 1
        return combined_nodes


class CombineHeadingsWithClosestText(ProcessingStep):
    """Merge a heading node with the immediately-following non-heading node
    (reference: basic_transforms.py:352-377)."""

    def process(self, nodes: List[Node]) -> List[Node]:
        res = []
        i = 0
        while i < len(nodes) - 1:
            current_node = nodes[i]
            if current_node.is_heading:
                next_node = nodes[i + 1]
                if not next_node.is_heading:
                    res.append(current_node + next_node)
                    i += 2
                    continue
            res.append(current_node)
            i += 1
        if i == len(nodes) - 1:
            res.append(nodes[i])
        return res


# ---------------------------------------------------------------------------
# Pipelines (reference: src/openparse/processing/ingest.py:25-136)
# ---------------------------------------------------------------------------


class IngestionPipeline:
    """Fold of transforms with a reading-order re-sort before every step
    (reference: ingest.py:37-44 — the re-sort is part of the contract)."""

    def __init__(self, transformations: Optional[List[ProcessingStep]] = None):
        self.transformations: List[ProcessingStep] = transformations or []

    def run(self, nodes: List[Node]) -> List[Node]:
        # key= is order-identical to the __lt__ comparison sort (both
        # compare the same reading_order tuples; both stable) but fetches
        # the cached property once per node instead of twice per pairwise
        # comparison — measurable on the extraction hot path
        key = lambda n: n.reading_order  # noqa: E731
        nodes = sorted(nodes, key=key)
        for transform in self.transformations:
            nodes = transform.process(sorted(nodes, key=key))
        return nodes

    def append_transform(self, transform: ProcessingStep) -> None:
        self.transformations.append(transform)


class NoOpIngestionPipeline(IngestionPipeline):
    def __init__(self):
        super().__init__([])


class BasicIngestionPipeline(IngestionPipeline):
    """The canonical 12-step chain with exact parameters
    (reference: ingest.py:65-92 — the parameters are part of the contract)."""

    def __init__(self):
        super().__init__(
            [
                RemoveTextInsideTables(),
                CombineSlicedImages(),
                RemoveFullPageStubs(max_area_pct=0.35),
                CombineNodesSpatially(
                    x_error_margin=10, y_error_margin=4, criteria="both_small"
                ),
                CombineHeadingsWithClosestText(),
                CombineBullets(),
                CombineNodesSpatially(
                    x_error_margin=0, y_error_margin=10, criteria="both_small"
                ),
                RemoveMetadataElements(),
                CombineNodesSpatially(criteria="either_stub"),
                RemoveRepeatedElements(threshold=2),
                RemoveNodesBelowNTokens(min_tokens=50),
                CombineBullets(),
            ]
        )
