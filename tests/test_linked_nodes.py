"""Linked-nodes (llama-index-style) export: per-document prev/next/parent
chain, window never crossing documents (reference: schemas.py:707-762)."""

import pyarrow as pa

from open_parse_ray.pipelines.extraction import ExtractLinkedNodes
from open_parse_ray.sources.pages import gen_pages_batch


def test_linked_chain_per_document():
    import numpy as np

    batch = gen_pages_batch(np.arange(1, 5))  # 4 normal docs, one batch
    out = ExtractLinkedNodes("basic")(batch)
    assert isinstance(out, pa.Table)
    df = out.to_pandas()
    assert df["url"].nunique() == 4
    for url, g in df.groupby("url"):
        g = g.sort_values("node_idx").reset_index(drop=True)
        # chain endpoints
        assert g["prev_id"].iloc[0] == ""
        assert g["next_id"].iloc[-1] == ""
        # interior links point to adjacent node ids within the same doc
        for i in range(1, len(g)):
            assert g["prev_id"].iloc[i] == g["node_id"].iloc[i - 1]
            assert g["next_id"].iloc[i - 1] == g["node_id"].iloc[i]
        # parent is the document
        assert (g["parent_id"] == g["doc_id"]).all()
        assert g["node_id"].is_unique


def test_linked_nodes_via_ray(ray_session):
    from open_parse_ray.pipelines.extraction import extract
    from open_parse_ray.sources.pages import read_pages

    ds = extract(read_pages(0.001), pipeline="basic", output="linked_nodes")
    tbl = ds.limit(500).to_pandas()
    assert {"node_id", "prev_id", "next_id", "parent_id"} <= set(tbl.columns)
    assert len(tbl) > 0
