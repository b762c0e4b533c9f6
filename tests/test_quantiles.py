"""Exact distributed float order statistics: order-preserving encoding
properties, numpy-reference equality at multiple block structures, and
the DuckDB oracle for the corpus query."""

import numpy as np
import pandas as pd
import pytest

from open_parse_ray.stages.quantiles import (
    ordered_u64,
    quantile_values,
    rank_of_percent,
    u64_to_float,
)


def _random_floats(rng, n):
    return np.concatenate(
        [
            rng.normal(0, 1e3, n // 3),
            rng.normal(0, 1e-9, n // 3),
            -rng.exponential(7, n - 2 * (n // 3) - 4),
            [np.inf, -np.inf, 0.0, 5e-324],
        ]
    )


def test_ordered_u64_is_monotone_and_invertible():
    rng = np.random.default_rng(11)
    x = np.sort(_random_floats(rng, 30_000))
    k = ordered_u64(x).astype(object)
    for i in range(len(k) - 1):
        if k[i + 1] < k[i]:
            # the ONLY allowed inversion: np.sort treats -0.0 == 0.0,
            # the encoding refines the tie to -0.0 < 0.0
            assert x[i] == 0.0 and x[i + 1] == 0.0
    sample = np.array([1.5, -2.25, 0.0, -0.0, np.inf, -np.inf, 5e-324, 1e308])
    for v, key in zip(sample, ordered_u64(sample)):
        back = u64_to_float(int(key))
        assert back == v and np.signbit(back) == np.signbit(v)
    with pytest.raises(ValueError):
        ordered_u64(np.array([1.0, np.nan]))


@pytest.mark.parametrize("num_parts", [3, 17])
def test_quantile_values_match_numpy_reference(ray_session, num_parts):
    import ray.data as rd

    rng = np.random.default_rng(23)
    vals = np.concatenate([_random_floats(rng, 9_000), np.repeat(3.5, 800)])
    gids = rng.integers(0, 4, len(vals)).astype(np.int64)
    ds = rd.from_pandas(
        pd.DataFrame({"gid": gids, "key": ordered_u64(vals)})
    ).repartition(num_parts)
    got = quantile_values(ds, [25, 50, 75, 95, 99])
    for g in range(4):
        v = np.sort(vals[gids == g])
        n = len(v)
        for p in (25, 50, 75, 95, 99):
            want = v[rank_of_percent(p, n) - 1]
            have = float(got[(got.gid == g) & (got.p == p)]["value"].iloc[0])
            assert have == want or (
                np.isinf(want) and np.isinf(have) and np.sign(want) == np.sign(have)
            ), (g, p, want, have)


def test_quantile_values_all_duplicates_and_empty(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(
        pd.DataFrame(
            {"gid": np.zeros(1000, dtype=np.int64),
             "key": ordered_u64(np.repeat(-7.25, 1000))}
        )
    ).repartition(5)
    got = quantile_values(ds, [25, 50, 75])
    assert (got["value"] == -7.25).all() and (got["n"] == 1000).all()

    empty = rd.from_pandas(
        pd.DataFrame(
            {"gid": pd.Series([], dtype="int64"),
             "key": pd.Series([], dtype="uint64")}
        )
    )
    assert len(quantile_values(empty, [50])) == 0


def test_ratio_quantiles_query_matches_duckdb(ray_session):
    import duckdb

    from open_parse_ray.stages.quantiles import ratio_quantiles_by_lang

    sf = "/root/testdata/sf0.001"
    got = ratio_quantiles_by_lang(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        """
        WITH toks AS (
          SELECT lang,
                 CAST(n_chars AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\\s+')) AS ratio
          FROM documents WHERE trim(text) <> ''
        ),
        ranked AS (
          SELECT lang, ratio,
                 row_number() OVER (PARTITION BY lang ORDER BY ratio) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM toks
        )
        SELECT lang, CAST(q.p AS BIGINT) AS p, ratio AS value
        FROM ranked JOIN (VALUES (25), (50), (75), (95)) AS q(p)
          ON rn = 1 + (q.p * (n - 1)) // 100
        ORDER BY lang, p
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_weighted_quantiles_match_numpy_and_oracle(ray_session):
    """With a wt column, quantile_values returns the value where the
    cumulative WEIGHT in value order first reaches 1+(p*(W-1))//100 —
    checked against a numpy weighted reference; the corpus query
    matches DuckDB's window cumsum and differs from the unweighted
    percentiles (the weights genuinely bind)."""
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(31)
    vals = rng.normal(0, 100, 4000)
    wts = rng.integers(1, 50, 4000).astype(np.int64)
    gids = rng.integers(0, 3, 4000).astype(np.int64)
    ds = rd.from_pandas(
        pd.DataFrame({"gid": gids, "key": ordered_u64(vals), "wt": wts})
    ).repartition(9)
    got = quantile_values(ds, [25, 50, 75])
    for g in range(3):
        order = np.argsort(vals[gids == g], kind="stable")
        v = vals[gids == g][order]
        w = wts[gids == g][order]
        cum = np.cumsum(w)
        W = int(cum[-1])
        for p in (25, 50, 75):
            target = rank_of_percent(p, W)
            want = v[np.searchsorted(cum, target)]
            have = float(got[(got.gid == g) & (got.p == p)]["value"].iloc[0])
            assert have == want, (g, p, want, have)

    from open_parse_ray.stages.quantiles import (
        ratio_quantiles_by_lang,
        token_weighted_ratio_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    gotq = token_weighted_ratio_quantiles(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        """
        WITH toks AS (
          SELECT lang,
                 CAST(n_chars AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\\s+')) AS ratio,
                 len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                 doc_id
          FROM documents WHERE trim(text) <> ''
        ),
        ranked AS (
          SELECT lang, ratio,
                 SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY ratio, doc_id) AS cum,
                 SUM(n_tokens) OVER (PARTITION BY lang) AS W
          FROM toks
        )
        SELECT lang, CAST(q.p AS BIGINT) AS p, min(ratio) AS value
        FROM ranked JOIN (VALUES (25), (50), (75), (95)) q(p)
          ON cum >= 1 + (q.p * (W - 1)) // 100
        GROUP BY lang, q.p
        ORDER BY lang, p
        """
    ).df()
    pd.testing.assert_frame_equal(gotq, want)
    unweighted = ratio_quantiles_by_lang(sf).to_pandas()
    assert not gotq["value"].equals(unweighted["value"])
