"""Integer-exact PageRank: driver path == forced-distributed path,
structural sanity on known graphs, float-PageRank agreement, and the
unrolled-CTE DuckDB oracle for the events transition query."""

import numpy as np
import pandas as pd
import pytest


def _rand_edges(rng, n_nodes, n_edges, with_dangling=True):
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    if with_dangling:
        # reserve the top ids as pure sinks (never sources)
        sinks = n_nodes // 10 + 1
        src = src % (n_nodes - sinks)
    w = rng.integers(1, 50, n_edges)
    df = pd.DataFrame({"src": src, "dst": dst, "w": w}).astype("int64")
    return df.groupby(["src", "dst"], as_index=False).agg(w=("w", "sum"))


@pytest.mark.parametrize("seed", [3, 17])
def test_pagerank_driver_equals_distributed(ray_session, seed):
    import ray.data as rd

    from open_parse_ray.stages.graph import pagerank

    rng = np.random.default_rng(seed)
    n = 200
    edges = _rand_edges(rng, n, 2000)
    ds = rd.from_pandas(edges).repartition(7)
    a = pagerank(ds, n_nodes=n).to_pandas().sort_values("node").reset_index(drop=True)
    b = (
        pagerank(rd.from_pandas(edges).repartition(3), n_nodes=n, force_distributed=True)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # mass sanity: floor losses only ever shrink total mass, teleport
    # restores ~one — total stays within a few n of one
    one = 10**12
    assert 0.9 * one < a["rank_fp"].sum() <= one + n


def test_pagerank_star_and_chain_structure(ray_session):
    import ray.data as rd

    from open_parse_ray.stages.graph import pagerank

    # star: everyone links to node 0 → node 0 dominates
    n = 50
    star = pd.DataFrame(
        {"src": np.arange(1, n), "dst": 0, "w": 1}
    ).astype("int64")
    r = pagerank(rd.from_pandas(star), n_nodes=n).to_pandas()
    r0 = int(r[r.node == 0]["rank_fp"].iloc[0])
    others = r[r.node != 0]["rank_fp"]
    assert r0 > 10 * others.max()
    assert others.nunique() == 1  # symmetric spokes tie exactly


def test_pagerank_matches_float_reference(ray_session):
    """The fixed-point ranks agree with a float power iteration to
    ~1e-9 relative (floor loss per iteration is bounded by 1/one)."""
    import ray.data as rd

    from open_parse_ray.stages.graph import pagerank

    rng = np.random.default_rng(5)
    n = 80
    edges = _rand_edges(rng, n, 600)
    got = pagerank(rd.from_pandas(edges), n_nodes=n).to_pandas()

    wout = np.zeros(n)
    np.add.at(wout, edges["src"], edges["w"].astype(float))
    r = np.full(n, 1.0 / n)
    for _ in range(20):
        share = np.divide(r, wout, out=np.zeros(n), where=wout > 0)
        acc = np.zeros(n)
        np.add.at(acc, edges["dst"], 0.85 * share[edges["src"]] * edges["w"].to_numpy())
        dang = 0.85 * r[wout == 0].sum() / n
        r = 0.15 / n + dang + acc
    diff = np.abs(got.sort_values("node")["rank_fp"].to_numpy() / 1e12 - r)
    assert diff.max() < 1e-6


def test_events_type_pagerank_matches_duckdb_oracle(ray_session):
    import duckdb

    from open_parse_ray.stages.graph import (
        events_type_pagerank,
        events_type_pagerank_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    got = events_type_pagerank(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(events_type_pagerank_oracle_sql()).df().astype({"rank_fp": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_events_type_pagerank_distributed_path_identical(ray_session):
    from open_parse_ray.stages.graph import events_type_pagerank

    sf = "/root/testdata/sf0.001"
    a = events_type_pagerank(sf).to_pandas()
    b = events_type_pagerank(sf, max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_pagerank_partitioned_bitwise_equals_driver(ray_session):
    """The fully-partitioned (rank-table-as-Dataset) path produces
    bit-identical ranks to the driver path — dangling sinks, weighted
    multi-edges, isolated nodes included."""
    import ray.data as rd

    from open_parse_ray.stages.graph import pagerank, pagerank_partitioned

    rng = np.random.default_rng(41)
    n = 90
    src = rng.integers(0, n - 11, 600)  # top 11 ids never sources
    dst = rng.integers(0, n, 600)
    w = rng.integers(1, 40, 600)
    edges = (
        pd.DataFrame({"src": src, "dst": dst, "w": w})
        .astype("int64")
        .groupby(["src", "dst"], as_index=False)
        .agg(w=("w", "sum"))
    )
    # node n-1 may be isolated (neither src nor dst) — that's the point
    a = (
        pagerank(rd.from_pandas(edges), n_nodes=n, n_iter=6)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        pagerank_partitioned(rd.from_pandas(edges).repartition(5), n_nodes=n, n_iter=6)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_triangle_counts_match_brute_force(ray_session):
    """triangle_counts (oriented wedge join) == O(n^3)/set brute force
    on random Erdos-Renyi graphs of several densities, including graphs
    with isolated nodes and a graph with zero triangles (a star)."""
    import ray.data as rd

    from open_parse_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(7)
    cases = []
    for n, p in [(12, 0.5), (30, 0.2), (50, 0.08), (25, 1.0)]:
        m = rng.random((n, n)) < p
        iu = np.triu_indices(n, 1)
        keep = m[iu]
        cases.append((n, iu[0][keep].astype(np.int64), iu[1][keep].astype(np.int64)))
    # star graph: hub 0 — many wedges, zero triangles
    cases.append((9, np.zeros(8, dtype=np.int64), np.arange(1, 9, dtype=np.int64)))

    for n, u, v in cases:
        adj = set(zip(u.tolist(), v.tolist()))
        deg = np.zeros(n, dtype=np.int64)
        np.add.at(deg, u, 1)
        np.add.at(deg, v, 1)
        tri = sum(
            1
            for (a, b) in adj
            for c in range(b + 1, n)
            if (a, c) in adj and (b, c) in adj
        )
        # BOTH paths: broadcast-CSR (default at this size) and the
        # forced wedge-join partitioned path must match brute force
        for force in (5_000_000, 0):
            got = (
                triangle_counts(
                    rd.from_pandas(
                        pd.DataFrame({"u": u, "v": v}).astype("int64")
                    ).repartition(4),
                    n_nodes=n,
                    num_parts=5,
                    max_broadcast_edges=force,
                )
                .to_pandas()
                .iloc[0]
            )
            assert got["n_nodes"] == int((deg > 0).sum())
            assert got["n_edges"] == len(adj)
            assert got["n_wedges"] == int((deg * (deg - 1) // 2).sum())
            assert got["n_triangles"] == tri, (n, force, got["n_triangles"], tri)


def test_copurchase_triangles_matches_duckdb(ray_session):
    import duckdb

    from open_parse_ray.stages.graph import copurchase_triangles

    sf = "/root/testdata/sf0.001"
    got = copurchase_triangles(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    import __ray_entry__ as e

    want = con.execute(e.oracle_sql()["copurchase_triangles"]).df().astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_copurchase_lift_pairs_semantics(ray_session, tmp_path):
    """Lift is not co-count: a pair bought together in EVERY order
    (lift exactly 1) is excluded, while a pair whose co-occurrence is
    concentrated (lift 2) passes with fewer co-purchases."""
    from open_parse_ray.stages.graph import copurchase_lift_pairs

    # 4 orders; parts 1,2 in all four (lift 4*4/(4*4)=1);
    # parts 3,4 in orders 10,11 only (lift 4*2/(2*2)=2)
    rows = []
    for o in (10, 11, 12, 13):
        rows += [(o, 1), (o, 2)]
    for o in (10, 11):
        rows += [(o, 3), (o, 4)]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_suppkey"] = 0
    df["l_linenumber"] = np.arange(len(df), dtype=np.int32)
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    df.to_parquet(tmp_path / "lineitem.parquet")

    out = copurchase_lift_pairs(str(tmp_path)).to_pandas()
    got = set(zip(out["part_a"], out["part_b"]))
    assert got == {(3, 4)}
    row = out.set_index(["part_a", "part_b"]).loc[(3, 4)]
    assert row["n_ab"] == 2 and row["n_a"] == 2 and row["n_b"] == 2


def test_copurchase_distances_bfs_semantics(ray_session, tmp_path):
    """BFS layers from the smallest connected part: chain distances,
    hop cap, and a disconnected component that must NOT appear."""
    from open_parse_ray.stages.graph import copurchase_distances

    # chain 1-2-3-4-5-6-7 via shared orders; parts 50,51 disconnected
    orders = [(100, 1, 2), (101, 2, 3), (102, 3, 4), (103, 4, 5),
              (104, 5, 6), (105, 6, 7), (200, 50, 51)]
    rows = [(o, p) for o, a, b in orders for p in (a, b)]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_suppkey"] = 0
    df["l_linenumber"] = np.arange(len(df), dtype=np.int32)
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    df.to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({"p_partkey": np.arange(60, dtype=np.int64)}).to_parquet(
        tmp_path / "part.parquet"
    )

    out = (
        copurchase_distances(str(tmp_path), max_hops=4)
        .to_pandas()
        .set_index("part")["dist"]
    )
    # source = 1 (smallest with an edge); chain: dist == part - 1, capped
    assert out.to_dict() == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    # parts 6,7 beyond the hop cap; 50,51 disconnected — absent
    for absent in (6, 7, 50, 51):
        assert absent not in out.index


def test_related_parts_topk_ranking(ray_session, tmp_path):
    """Per-item ranking semantics: count DESC then part-id ASC
    tie-break; both directions of a pair rank each other."""
    from open_parse_ray.stages.graph import related_parts_topk

    # orders: (1,2) x3, (1,3) x2, (1,4) x2 -> for part 1:
    # rank1 = 2 (n=3), rank2 = 3 (n=2, ties with 4, lower id), rank3 = 4
    rows = []
    oid = 0
    for other, times in [(2, 3), (3, 2), (4, 2)]:
        for _ in range(times):
            rows += [(oid, 1), (oid, other)]
            oid += 1
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df["l_suppkey"] = 0
    df["l_linenumber"] = np.arange(len(df), dtype=np.int32)
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    df.to_parquet(tmp_path / "lineitem.parquet")

    out = related_parts_topk(str(tmp_path)).to_pandas()
    p1 = out[out["part"] == 1].sort_values("rank")
    assert list(p1["other"]) == [2, 3, 4]
    assert list(p1["n_ab"]) == [3, 2, 2]
    # reverse direction: part 2's top related is 1 with n=3
    p2 = out[(out["part"] == 2) & (out["rank"] == 1)].iloc[0]
    assert p2["other"] == 1 and p2["n_ab"] == 3


def test_recommend_parts_topk_cf_semantics(ray_session, tmp_path):
    """2-hop CF: candidates score by summed co-purchase counts with the
    customer's owned parts; owned parts are excluded; a customer who
    owns everything gets no rows."""
    from open_parse_ray.stages.graph import recommend_parts_topk

    # cust 1 owns A=100 (order 1). Other orders (cust 2): {A,B} twice,
    # {A,C} once -> cust 1 recs: B (score 2), C (score 1); A excluded.
    # cust 2 owns A,B,C -> nothing left to recommend.
    li = [(1, 100), (10, 100), (10, 101), (11, 100), (11, 101),
          (12, 100), (12, 102)]
    df = pd.DataFrame(li, columns=["l_orderkey", "l_partkey"])
    df["l_suppkey"] = 0
    df["l_linenumber"] = np.arange(len(df), dtype=np.int32)
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    df.to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame(
        {
            "o_orderkey": [1, 10, 11, 12],
            "o_custkey": [1, 2, 2, 2],
            "o_orderstatus": "O",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": "3-MEDIUM",
        }
    ).to_parquet(tmp_path / "orders.parquet")

    out = recommend_parts_topk(str(tmp_path)).to_pandas()
    c1 = out[out["c_custkey"] == 1].sort_values("rank")
    assert list(c1["part"]) == [101, 102]
    assert list(c1["score"]) == [2, 1]
    assert (out["c_custkey"] == 2).sum() == 0


def test_copurchase_cheapest_paths_prefers_strong_ties(ray_session, tmp_path):
    """Min-plus semantics: a 2-hop path over strong ties (high
    co-count, low weight) beats a direct weak edge; Bellman-Ford
    relaxation finds it within the round budget."""
    from open_parse_ray.stages.graph import copurchase_cheapest_paths

    # edges via shared orders: (1,2) x500 (w=1000//500+1=3),
    # (2,3) x500 (w=3), (1,3) x1 (w=1001) -> cost(3) = 6 via 1-2-3
    li = []
    oid = 0
    for a, b, times in [(1, 2, 500), (2, 3, 500), (1, 3, 1)]:
        for _ in range(times):
            li += [(oid, a), (oid, b)]
            oid += 1
    df = pd.DataFrame(li, columns=["l_orderkey", "l_partkey"])
    df["l_suppkey"] = 0
    df["l_linenumber"] = np.arange(len(df), dtype=np.int32)
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df["l_discount"] = 0.0
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    df.to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({"p_partkey": np.arange(5, dtype=np.int64)}).to_parquet(
        tmp_path / "part.parquet"
    )

    out = (
        copurchase_cheapest_paths(str(tmp_path))
        .to_pandas()
        .set_index("part")["cost"]
    )
    assert out[1] == 0
    assert out[2] == 3
    assert out[3] == 6  # 2-hop strong path beats the direct w=1001 edge


def test_copurchase_kcore_cascade_and_fixpoint(ray_session, tmp_path):
    """Multi-round peel cascade: a 2-core triangle with a pendant chain
    — the chain unravels one node per round (5 drops, THEN 4 drops),
    the triangle survives with in-core degree 2; extra rounds are
    idempotent (fixpoint)."""
    import pandas as pd

    from open_parse_ray.stages.graph import copurchase_kcore

    # orders: triangle {1,2},{2,3},{1,3}; chain {3,4},{4,5}
    rows = [(10, 1), (10, 2), (11, 2), (11, 3), (12, 1), (12, 3),
            (13, 3), (13, 4), (14, 4), (14, 5)]
    pd.DataFrame(
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
            "l_suppkey": [0] * len(rows),
            "l_linenumber": list(range(len(rows))),
            "l_quantity": [1.0] * len(rows),
            "l_extendedprice": [0.0] * len(rows),
            "l_discount": [0.0] * len(rows),
            "l_tax": [0.0] * len(rows),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": pd.to_datetime(["2000-01-01"] * len(rows)),
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4, 5],
            "p_name": ["p"] * 5,
            "p_brand": ["b"] * 5,
            "p_type": ["t"] * 5,
            "p_size": [1] * 5,
            "p_retailprice": [1.0] * 5,
        }
    ).to_parquet(tmp_path / "part.parquet")
    out = (
        copurchase_kcore(str(tmp_path), k=2, rounds=8)
        .to_pandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    assert out["part"].tolist() == [1, 2, 3]
    assert out["core_deg"].tolist() == [2, 2, 2]
    # idempotent past the fixpoint: more rounds change nothing
    out2 = (
        copurchase_kcore(str(tmp_path), k=2, rounds=12)
        .to_pandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    assert out2.equals(out)
    # k above the max degree empties the core (schema preserved)
    out3 = copurchase_kcore(str(tmp_path), k=4, rounds=8)
    assert out3.count() == 0
    assert [f.name for f in out3.schema().base_schema] == ["part", "core_deg"]


def test_hits_star_structure(ray_session):
    """Star graph (leaves → center): leaves are perfect hubs (all tie
    at scale, zero authority), the center is the perfect authority
    (scale, zero hub) — the defining HITS separation that pagerank
    alone cannot express."""
    import ray.data as rd

    from open_parse_ray.stages.graph import HITS_SCALE, hits

    n = 20
    star = pd.DataFrame({"src": np.arange(1, n), "dst": 0, "w": 1}).astype("int64")
    out = hits(rd.from_pandas(star), n_nodes=n).to_pandas().set_index("node")
    assert out.loc[0, "auth_fp"] == HITS_SCALE
    assert out.loc[0, "hub_fp"] == 0
    leaves = out.drop(index=0)
    assert (leaves["hub_fp"] == HITS_SCALE).all()
    assert (leaves["auth_fp"] == 0).all()


@pytest.mark.parametrize("seed", [3, 17])
def test_hits_driver_equals_distributed(ray_session, seed):
    import ray.data as rd

    from open_parse_ray.stages.graph import hits

    rng = np.random.default_rng(seed)
    n = 150
    edges = _rand_edges(rng, n, 1500)
    a = (
        hits(rd.from_pandas(edges).repartition(7), n_nodes=n)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        hits(rd.from_pandas(edges).repartition(3), n_nodes=n, force_distributed=True)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_events_type_hits_matches_duckdb_oracle(ray_session):
    import duckdb

    from open_parse_ray.stages.graph import (
        events_type_hits,
        events_type_hits_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    got = events_type_hits(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(events_type_hits_oracle_sql()).df().astype(
        {"hub_fp": "int64", "auth_fp": "int64"}
    )
    pd.testing.assert_frame_equal(got, want)


def test_events_type_hits_distributed_path_identical(ray_session):
    from open_parse_ray.stages.graph import events_type_hits

    sf = "/root/testdata/sf0.001"
    a = events_type_hits(sf).to_pandas()
    b = events_type_hits(sf, max_driver_edges=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_pagerank_checkpoint_resume_bitwise(ray_session, tmp_path):
    """Iterate-job resumability: a run interrupted after 8 of 20
    iterations (simulated by running n_iter=8 with a checkpoint dir)
    resumes from the saved rank vector and finishes bit-identical to
    the uninterrupted 20-iteration run; a fully-checkpointed re-run
    loads the final vector and recomputes nothing new."""
    import os

    import ray.data as rd

    from open_parse_ray.stages.graph import pagerank

    rng = np.random.default_rng(11)
    n = 120
    edges = _rand_edges(rng, n, 900)
    ds = rd.from_pandas(edges).repartition(5)

    want = (
        pagerank(ds, n_nodes=n, n_iter=20, force_distributed=True)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    ck = str(tmp_path / "ck")
    pagerank(ds, n_nodes=n, n_iter=8, force_distributed=True, ckpt_dir=ck).to_pandas()
    assert os.path.exists(os.path.join(ck, "rank_iter0008.npy"))

    got = (
        pagerank(ds, n_nodes=n, n_iter=20, force_distributed=True, ckpt_dir=ck)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert os.path.exists(os.path.join(ck, "rank_iter0020.npy"))

    # third call: everything checkpointed — still identical
    again = (
        pagerank(ds, n_nodes=n, n_iter=20, force_distributed=True, ckpt_dir=ck)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again, want)
