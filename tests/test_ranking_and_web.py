"""Gates for the tier-extraction ranking operator (stages/ranking.py)
and the web/URL operators (stages/web.py)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- ntile


def test_ntile_formula_matches_duckdb():
    import duckdb

    for n in list(range(1, 26)) + [100, 101]:
        for k in range(1, 8):
            exp = duckdb.sql(
                f"SELECT ntile({k}) OVER (ORDER BY i) AS t "
                f"FROM range(1, {n + 1}) r(i) ORDER BY i"
            ).df()["t"].to_numpy(dtype=np.int64)
            from open_parse_ray.stages.ranking import ntile_of_rank

            got = ntile_of_rank(np.arange(1, n + 1), n, k)
            assert np.array_equal(got, exp), (n, k)


# ------------------------------------------------------- global ranking


def _rank_df(df, k=4, num_parts=8):
    import ray.data as rd

    from open_parse_ray.stages.ranking import global_rank

    out = global_rank(rd.from_pandas(df), k=k, num_parts=num_parts).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _expected(df, k=4):
    from open_parse_ray.stages.ranking import ntile_of_rank

    e = df.sort_values(["n_tokens", "doc_id"]).reset_index(drop=True)
    e["rank"] = np.arange(1, len(e) + 1, dtype=np.int64)
    e["tier"] = ntile_of_rank(e["rank"].to_numpy(), len(e), k)
    return e.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_tokens", "rank", "tier"]
    ]


def test_global_rank_random_and_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            "n_tokens": rng.integers(0, 40, 500).astype(np.int64),
        }
    )
    exp = _expected(df)
    a = _rank_df(df, num_parts=3)
    b = _rank_df(df, num_parts=17)
    pd.testing.assert_frame_equal(a[exp.columns], exp)
    pd.testing.assert_frame_equal(b[exp.columns], exp)


def test_global_rank_single_hot_value_splits_partitions(ray_session):
    """A corpus where EVERY doc has the same token count (the viral-
    boilerplate shape): the composite (value, id) sub-split must keep
    partitions bounded and ranks exact by doc_id."""
    from open_parse_ray.stages.ranking import _boundaries

    df = pd.DataFrame(
        {
            "doc_id": np.arange(2000, dtype=np.int64),
            "n_tokens": np.full(2000, 37, dtype=np.int64),
        }
    )
    # boundary builder places >1 distinct cut INSIDE the hot value
    hist = pd.DataFrame({"v": [37], "cnt": [2000]})
    cuts = _boundaries(hist, max_id=1999, num_parts=8)
    assert len(cuts) == 7
    exp = _expected(df)
    got = _rank_df(df, num_parts=8)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_doc_tiers_matches_local_reference(ray_session):
    import pyarrow.parquet as pq

    from open_parse_ray.stages.analysis import n_tokens_sql_semantics
    from open_parse_ray.stages.ranking import doc_tiers

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    df = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "n_tokens": [n_tokens_sql_semantics(t) for t in docs["text"]],
        }
    )
    exp = _expected(df)
    got = doc_tiers(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


# ------------------------------------------------------------- web/URL


TRICKY = [
    ("HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&b=2&a=1#frag", "https://example.com/a/b?a=1&b=2"),
    ("http://example.com:80/", "http://example.com"),
    ("http://example.com:8080/x/", "http://example.com:8080/x"),
    ("https://example.com/a?fbclid=zz&gclid=yy&ref=rss", "https://example.com/a"),
    ("https://example.com/a?b=&a=", "https://example.com/a?a=&b="),
    ("https://example.com///", "https://example.com"),
    ("https://sub.www.example.com/a", "https://sub.www.example.com/a"),
]


def test_canonicalize_url_cases():
    from open_parse_ray.stages.web import canonicalize_url

    for raw, want in TRICKY:
        assert canonicalize_url(raw) == want, raw


def test_canonicalize_idempotent():
    from open_parse_ray.stages.web import canonicalize_url, synth_messy_url

    urls = [raw for raw, _ in TRICKY] + [
        synth_messy_url(i, "src") for i in range(300)
    ]
    for u in urls:
        c = canonicalize_url(u)
        assert canonicalize_url(c) == c, u


def test_synth_variants_recover_closed_form():
    from open_parse_ray.stages.web import canonicalize_url, synth_messy_url

    for i in range(600):
        m = i % 50
        want = f"https://src.org/d/{m}"
        if i % 3 == 0:
            want += f"?page={i % 7}"
        assert canonicalize_url(synth_messy_url(i, "src")) == want, i


def test_registered_domain():
    from open_parse_ray.stages.web import registered_domain

    assert registered_domain("HTTPS://WWW.Ex.ORG:443/a") == "ex.org"
    assert registered_domain("http://ex.org:8080/a") == "ex.org"


def test_url_canonical_dedup_group_counts(ray_session):
    """Group sizes must sum to the corpus size and every member of a
    group must share the representative's canonical form."""
    from open_parse_ray.stages.web import url_canonical_dedup

    out = url_canonical_dedup(SF).to_pandas()
    assert out["n_dups"].sum() == 500
    assert (out["n_dups"] > 1).any()  # the corpus really has URL dups
    assert out["canonical_url"].is_unique


# ---------------------------------------------------------------- tfidf


def test_tfidf_top_terms_matches_local_reference(ray_session):
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from open_parse_ray.stages.analysis import tfidf_top_terms

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    ws = re.compile(r"\s+")
    tf_rows = []
    for d, t in zip(docs["doc_id"], docs["text"]):
        t = t.strip()
        if not t:
            continue
        for term, tf in Counter(ws.split(t)).items():
            tf_rows.append((int(d), term, tf))
    tf = pd.DataFrame(tf_rows, columns=["doc_id", "term", "tf"])
    df_map = tf.groupby("term")["doc_id"].size()
    tf["df"] = tf["term"].map(df_map).astype("int64")
    tf["score"] = tf["tf"].to_numpy(dtype=np.float64) / tf["df"].to_numpy(np.float64)
    tf = tf.sort_values(["doc_id", "score", "term"], ascending=[True, False, True])
    tf["rank"] = tf.groupby("doc_id").cumcount() + 1
    exp = (
        tf[tf["rank"] <= 3][["doc_id", "rank", "term", "tf", "df"]]
        .astype({"doc_id": "int64", "rank": "int64", "tf": "int64", "df": "int64"})
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        tfidf_top_terms(SF)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


# ------------------------------------------------- bloom dup prefilter


def test_bloom_dup_groups_exact_even_with_tiny_bitmap(ray_session):
    """With m_bits=4096 almost every position collides (heavy false
    positives): the output must STILL be exactly the duplicate groups,
    because pass 2 verifies real keys. Also pins equality with the
    roomy-bitmap run and a local reference."""
    import pandas as pd

    from open_parse_ray.stages.dedup import bloom_dup_groups
    from open_parse_ray.stages.web import canonicalize_url, synth_messy_url

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"]).to_pandas()
    canon = pd.DataFrame(
        {
            "canonical_url": [
                canonicalize_url(synth_messy_url(int(d), s))
                for d, s in zip(docs["doc_id"], docs["source"])
            ],
            "doc_id": docs["doc_id"].astype("int64"),
        }
    )
    ref = canon.groupby("canonical_url", as_index=False).agg(
        n_dups=("doc_id", "size"), rep_doc_id=("doc_id", "min")
    )
    ref = ref[ref["n_dups"] >= 2].sort_values("canonical_url").reset_index(drop=True)

    tiny = (
        bloom_dup_groups(SF, m_bits=4096)
        .to_pandas()
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    roomy = (
        bloom_dup_groups(SF, m_bits=1 << 20)
        .to_pandas()
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    cols = ["canonical_url", "n_dups", "rep_doc_id"]
    pd.testing.assert_frame_equal(tiny[cols], ref[cols].astype({"n_dups": "int64", "rep_doc_id": "int64"}))
    pd.testing.assert_frame_equal(roomy[cols], tiny[cols])


def test_bloom_positions_deterministic_and_in_range():
    from open_parse_ray.stages.dedup import _bloom_positions

    fps = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    pos = _bloom_positions(fps, 1 << 20)
    assert pos.shape == (1000, 2)
    assert (pos >= 0).all() and (pos < (1 << 20)).all()
    assert np.array_equal(pos, _bloom_positions(fps, 1 << 20))


# ------------------------------------------------------ snapshot diff


def test_snapshot_diff_statuses_and_invariants(ray_session):
    """Every status present; deleted ids are exactly doc_id%11==0 (minus
    ones also re-added never happens: added ids live in a disjoint
    range); changed ids are %13 survivors; block-structure invariant."""
    from open_parse_ray.stages.incremental import _ADDED_OFFSET, snapshot_diff

    out = snapshot_diff(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    by = {s: set(g["doc_id"]) for s, g in out.groupby("status")}
    assert set(by) == {"added", "deleted", "changed"}
    assert all(d >= _ADDED_OFFSET for d in by["added"])
    assert all(d % 11 == 0 for d in by["deleted"])
    assert all(d % 13 == 0 and d % 11 != 0 for d in by["changed"])
    # no doc appears twice
    assert out["doc_id"].is_unique


# --------------------------------------------------------------- PII


def test_scrub_text_cases():
    from open_parse_ray.stages.pii import scrub_text

    red, e, i = scrub_text("mail me at bob123@host9.org or 192.168.0.1 ok")
    assert red == "mail me at [EMAIL] or [IP] ok"
    assert (e, i) == (1, 1)
    red, e, i = scrub_text("no pii here at all")
    assert red == "no pii here at all" and (e, i) == (0, 0)
    # multiple occurrences + email containing digits
    red, e, i = scrub_text("a1@b2.c d 1.2.3.4 5.6.7.8 x9@y8.zz")
    assert (e, i) == (2, 2)
    assert "[EMAIL]" in red and "[IP]" in red


def test_pii_scan_counts(ray_session):
    from open_parse_ray.stages.pii import pii_scan

    out = pii_scan(SF).to_pandas()
    assert (out["n_emails"] > 0).sum() == (out["doc_id"] % 5 == 0).sum()
    assert (out["n_ips"] > 0).sum() == (out["doc_id"] % 9 == 0).sum()


def test_canonicalize_url_hypothesis_invariants():
    """Property gate: for randomly assembled URLs, canonicalization is
    idempotent, never emits fragments/default ports/tracking params,
    and sorts surviving query keys."""
    from urllib.parse import parse_qsl, urlsplit

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from open_parse_ray.stages.web import canonicalize_url

    host_label = st.text("abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=6)
    key = st.text("abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=5)
    val = st.text("abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=5)

    @settings(max_examples=200, deadline=None)
    @given(
        scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
        www=st.booleans(),
        labels=st.lists(host_label, min_size=1, max_size=3),
        port=st.sampled_from(["", ":80", ":443", ":8080"]),
        segs=st.lists(st.text("abcdefghijklmnopqrstuvwxyz0-9", min_size=0, max_size=5), max_size=4),
        params=st.lists(st.tuples(key, val), max_size=4),
        tracking=st.booleans(),
        frag=st.sampled_from(["", "#x", "#sec2"]),
    )
    def check(scheme, www, labels, port, segs, params, tracking, frag):
        host = ("WWW." if www else "") + ".".join(labels)
        path = "/" + "/".join(segs) if segs else ""
        q = list(params) + ([("utm_source", "t"), ("fbclid", "z")] if tracking else [])
        query = "&".join(f"{k}={v}" for k, v in q)
        url = f"{scheme}://{host}{port}{path}" + (f"?{query}" if query else "") + frag
        c = canonicalize_url(url)
        assert canonicalize_url(c) == c  # idempotent
        parts = urlsplit(c)
        assert parts.fragment == ""
        assert parts.scheme in ("http", "https")
        assert not parts.netloc.startswith("www.")
        # only the scheme's OWN default port is stripped
        if parts.scheme == "https":
            assert not parts.netloc.endswith(":443")
        else:
            assert not parts.netloc.endswith(":80")
        keys = [k for k, _ in parse_qsl(parts.query, keep_blank_values=True)]
        assert keys == sorted(keys)
        assert not any(k.startswith("utm_") or k in ("fbclid", "gclid") for k in keys)
        assert "//" not in c.split("://", 1)[1]

    check()


def test_epoch_shuffle_oracle_permutation_and_partition_invariance(ray_session):
    """epoch_shuffle == DuckDB row_number over the md5 key; positions
    form a permutation; num_parts does not change the result; different
    epochs yield different permutations."""
    import duckdb
    import pandas as pd

    from open_parse_ray.stages.ranking import epoch_shuffle

    sf = "/root/testdata/sf0.001"
    got = epoch_shuffle(sf, epoch=1).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(
            """
        SELECT doc_id, CAST(row_number() OVER (
          ORDER BY md5(CAST(doc_id AS VARCHAR) || ':1'), doc_id) AS BIGINT) AS pos
        FROM documents ORDER BY doc_id
        """
        )
        .df()
        .astype({"doc_id": "int64", "pos": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)
    assert sorted(got["pos"]) == list(range(1, len(got) + 1))

    alt = (
        epoch_shuffle(sf, epoch=1, num_parts=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(alt, got)

    e2 = epoch_shuffle(sf, epoch=2).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert not e2["pos"].equals(got["pos"])
    assert sorted(e2["pos"]) == list(range(1, len(e2) + 1))


def test_domain_quality_filter_thresholds_and_survivors(ray_session):
    """Failing domains (mean chars < threshold by integer
    cross-multiplication) are removed entirely; surviving docs keep
    their domain; both pass and fail sets are non-empty at sf0.001."""
    from open_parse_ray.stages.web import domain_quality_filter, url_domain_stats

    sf = "/root/testdata/sf0.001"
    stats = url_domain_stats(sf).to_pandas()
    bad = set(stats[stats["total_chars"] < 300 * stats["n_docs"]]["domain"])
    good = set(stats["domain"]) - bad
    assert bad and good  # the threshold genuinely splits this corpus

    out = domain_quality_filter(sf).to_pandas()
    assert set(out["domain"]) == good
    n_good_docs = int(stats[stats["domain"].isin(good)]["n_docs"].sum())
    assert len(out) == n_good_docs
    assert out["doc_id"].is_unique


def test_leakage_safe_splits_group_cohesion(ray_session):
    """Every canonical-URL duplicate group lands in ONE split, and the
    operator is not vacuous: at least one group's members would straddle
    splits under the per-doc assignment."""
    import numpy as np
    import pandas as pd

    from open_parse_ray.stages.web import leakage_safe_splits

    sf = "/root/testdata/sf0.001"
    out = leakage_safe_splits(sf).to_pandas()
    g = out.groupby("rep_doc_id")["split"].nunique()
    assert (g == 1).all()  # cohesion
    # non-vacuous: per-doc buckets differ within some multi-member group
    ids = out["doc_id"].to_numpy().astype(np.uint64)
    per_doc = ((ids * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(100)
    out = out.assign(per_doc_bucket=per_doc.astype(np.int64))
    sizes = out.groupby("rep_doc_id")["doc_id"].transform("size")
    multi = out[sizes > 1]
    assert multi.groupby("rep_doc_id")["per_doc_bucket"].nunique().gt(1).any()
    # rep is a member of its own group and carries its own bucket
    reps = out[out["doc_id"] == out["rep_doc_id"]]
    assert (reps["bucket"].to_numpy() == (
        (reps["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
        % np.uint64(2**32) % np.uint64(100)
    ).astype(np.int64)).all()


def test_ed_le1_matches_dp_reference():
    """_ed_le1 == (full Levenshtein DP <= 1) over exhaustive short
    strings and seeded random perturbations."""
    import itertools

    from open_parse_ray.stages.web import _ed_le1

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]

    al = "abc"
    pool = [
        "".join(t) for n in range(0, 4) for t in itertools.product(al, repeat=n)
    ]
    for a in pool:
        for b in pool:
            assert _ed_le1(a, b) == (lev(a, b) <= 1), (a, b)

    rng = np.random.RandomState(99)
    for _ in range(300):
        n = rng.randint(1, 12)
        a = "".join(rng.choice(list("abcd"), n))
        b = list(a)
        op = rng.randint(0, 4)
        if op == 0 and len(b) > 1:
            del b[rng.randint(len(b))]
        elif op == 1:
            b.insert(rng.randint(len(b) + 1), "e")
        elif op == 2:
            b[rng.randint(len(b))] = "f"
        else:
            b = list("".join(rng.choice(list("abcd"), rng.randint(1, 12))))
        b = "".join(b)
        assert _ed_le1(a, b) == (lev(a, b) <= 1), (a, b)


def test_url_editdist_pairs_matches_bruteforce(ray_session):
    """The deletion-neighborhood join == brute-force ED-1 self-join over
    the same distinct canonical URLs at sf0.001."""
    import pyarrow.parquet as pq

    from open_parse_ray.stages.web import (
        canonicalize_url,
        synth_messy_url,
        url_editdist_pairs,
    )

    sf = "/root/testdata/sf0.001"
    df = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    urls = sorted(
        {
            canonicalize_url(synth_messy_url(int(d), s))
            for d, s in zip(df["doc_id"], df["source"])
        }
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]

    want = {
        (a, b)
        for i, a in enumerate(urls)
        for b in urls[i + 1 :]
        if lev(a, b) == 1
    }
    got = url_editdist_pairs(sf).to_pandas()
    assert set(zip(got["url_a"], got["url_b"])) == want
    assert len(want) > 100  # the corpus really has ED-1 structure


def test_charset_sniff_hand_cases():
    """Every detector branch: BOMs win, meta declaration honored,
    zero-byte heuristic catches BOM-less UTF-16 both ways (including
    CJK-heavy text where only ASCII bytes vote), fallback never
    throws."""
    from open_parse_ray.functions.charset import (
        decode_html_bytes,
        sniff_charset,
    )

    assert sniff_charset(b"\xef\xbb\xbfhi") == ("utf-8-sig", "bom")
    assert sniff_charset(b"\xff\xfeh\x00") == ("utf-16-le", "bom")
    assert sniff_charset(b"\xfe\xff\x00h") == ("utf-16-be", "bom")
    assert sniff_charset(b'<meta charset="ISO-8859-1">caf\xe9') == (
        "latin-1", "meta",
    )
    assert sniff_charset(b"<META CHARSET='utf-8'>x") == ("utf-8", "meta")
    # unknown declared codec -> sniffing continues to fallback
    assert sniff_charset(b'<meta charset="klingon">abc') == (
        "utf-8", "fallback",
    )
    s = "hello world this is ascii text " * 8
    assert sniff_charset(s.encode("utf-16-le")) == ("utf-16-le", "heuristic")
    assert sniff_charset(s.encode("utf-16-be")) == ("utf-16-be", "heuristic")
    # CJK-heavy: only spaces put zeros in the high byte, still detected
    zh = "中文 文本 编码 检测 " * 16
    assert sniff_charset(zh.encode("utf-16-le")) == ("utf-16-le", "heuristic")
    # latin-1 declared, undecodable-as-utf-8 byte present: no throw
    text, codec, how = decode_html_bytes(b'<meta charset="latin-1">caf\xe9')
    assert codec == "latin-1" and text.endswith("café")
    # mojibake fallback never throws
    text, codec, how = decode_html_bytes(b"ok \xff\xff broken")
    assert how == "fallback" and "�" in text
    # a second U+FEFF after the BOM is content and survives
    text, _, _ = decode_html_bytes(b"\xff\xfe" + "﻿x".encode("utf-16-le"))
    assert text == "﻿x"


def test_charset_synth_roundtrip_all_variants():
    """synth_encoded -> decode_html_bytes recovers the exact text (with
    the meta declaration as surviving content for variant 4) for every
    variant, over all five corpus languages' character sets."""
    from open_parse_ray.functions.charset import (
        _META_PREFIX,
        decode_html_bytes,
        synth_encoded,
    )

    samples = [
        "plain ascii words",
        "umläute & décors — ligné",
        "中文文本 编码 检测 正确",
        "mixed 中文 and ascii ¿señal?",
        "tabs\tand\nnewlines preserved",
    ]
    for text in samples:
        for v in range(6):
            decoded, codec, how = decode_html_bytes(synth_encoded(text, v))
            want = _META_PREFIX + text if v == 4 else text
            assert decoded == want, (v, text, decoded)
            assert how == ["fallback", "bom", "bom", "bom", "meta",
                           "heuristic"][v]


def test_charset_hypothesis_roundtrip():
    """Property: any text with at least one ASCII space and no leading
    U+FEFF/NUL roundtrips bit-exactly through every synth variant (the
    documented carve-outs: a content-leading BOM is indistinguishable
    from framing, and zero-ASCII utf-16 needs frequency models)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from open_parse_ray.functions.charset import (
        _META_PREFIX,
        decode_html_bytes,
        synth_encoded,
    )

    texts = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="﻿\x00"
        ),
        min_size=1,
        max_size=200,
    ).map(lambda s: s + " word")  # guarantee ASCII presence

    @settings(max_examples=200, deadline=None)
    @given(texts)
    def check(text):
        if text.startswith("﻿"):
            return
        for v in range(6):
            decoded, _, _ = decode_html_bytes(synth_encoded(text, v))
            want = _META_PREFIX + text if v == 4 else text
            assert decoded == want

    check()


def test_robots_parser_and_matcher_hand_cases():
    """RFC 9309 semantics: group selection ignores the specific-bot
    group, empty Disallow is a no-op, unknown directives are skipped,
    wildcards anchor/float correctly, longest pattern wins, and a
    literal-length tie goes to Allow."""
    from open_parse_ray.functions.robots import (
        RobotsMatcher,
        parse_robots,
        synth_robots_txt,
    )

    txt = synth_robots_txt("news")  # a = 4, allow /d/45, wildcard *7$
    rules = parse_robots(txt)
    # the FancyBot 'Disallow: /' and the empty Disallow must NOT be here
    assert (False, "/") not in rules
    assert all(p for _, p in rules)
    m = RobotsMatcher(rules)
    assert not m.allowed("/d/4")      # prefix disallow
    assert not m.allowed("/d/41")     # prefix match on longer path
    assert m.allowed("/d/45")         # allow (len 6) beats /d/4 (len 5)
    assert not m.allowed("/d/47")     # wildcard (len 7) beats allow (6)
    assert not m.allowed("/d/7")      # ends in 7
    assert not m.allowed("/d/37")     # ends in 7, no prefix match
    assert m.allowed("/d/3")          # no rule matches -> allowed
    assert not m.allowed("/private/x")

    # literal tie -> Allow wins
    tie = RobotsMatcher([(False, "/d/1"), (True, "/d/2")])
    assert not tie.allowed("/d/1") and tie.allowed("/d/2")
    tie2 = RobotsMatcher([(False, "/a/b"), (True, "/a/*")])
    # same length 4: Allow sorts first
    assert tie2.allowed("/a/b")

    # $ anchors: /d/1$ must not match /d/12
    anch = RobotsMatcher([(False, "/d/1$")])
    assert not anch.allowed("/d/1") and anch.allowed("/d/12")

    # consecutive User-agent lines share a group; agent-specific group obeyed
    multi = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    assert parse_robots(multi) == [(False, "/x")]
    only_bot = "User-agent: FancyBot\nDisallow: /\n"
    assert parse_robots(only_bot) == []

    # hostile input never throws
    assert parse_robots("\x00garbage\nDisallow /no-colon\n::\n") == []


def test_robots_filter_docs_blocked_fraction(ray_session):
    """Corpus sanity: both verdicts occur, and every blocked path either
    starts with the domain's disallowed digit or ends in 7."""
    from open_parse_ray.stages.web import robots_filter_docs

    out = robots_filter_docs("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert set(out["allowed"].unique()) == {0, 1}
    blocked = out[out["allowed"] == 0]
    assert len(blocked) > 0
    for _, r in blocked.iterrows():
        m = r["path"].rsplit("/", 1)[1]
        a = str(len(r["domain"].split(".")[0]) % 10)
        assert m.endswith("7") or m.startswith(a)


def test_rfc3986_reference_resolution_vectors():
    """The complete RFC 3986 §5.4.1 (normal) + §5.4.2 (abnormal)
    reference-resolution examples against the canonical base — the
    spec's own conformance suite, including the strict-parser case
    ('http:g' stays 'http:g', not merged)."""
    from open_parse_ray.functions.urlref import resolve_reference

    base = "http://a/b/c/d;p?q"
    cases = {
        "g:h": "g:h", "g": "http://a/b/c/g", "./g": "http://a/b/c/g",
        "g/": "http://a/b/c/g/", "/g": "http://a/g", "//g": "http://g",
        "?y": "http://a/b/c/d;p?y", "g?y": "http://a/b/c/g?y",
        "#s": "http://a/b/c/d;p?q#s", "g#s": "http://a/b/c/g#s",
        "g?y#s": "http://a/b/c/g?y#s", ";x": "http://a/b/c/;x",
        "g;x": "http://a/b/c/g;x", "g;x?y#s": "http://a/b/c/g;x?y#s",
        "": "http://a/b/c/d;p?q", ".": "http://a/b/c/",
        "./": "http://a/b/c/", "..": "http://a/b/", "../": "http://a/b/",
        "../g": "http://a/b/g", "../..": "http://a/", "../../": "http://a/",
        "../../g": "http://a/g",
        "../../../g": "http://a/g", "../../../../g": "http://a/g",
        "/./g": "http://a/g", "/../g": "http://a/g",
        "g.": "http://a/b/c/g.", ".g": "http://a/b/c/.g",
        "g..": "http://a/b/c/g..", "..g": "http://a/b/c/..g",
        "./../g": "http://a/b/g", "./g/.": "http://a/b/c/g/",
        "g/./h": "http://a/b/c/g/h", "g/../h": "http://a/b/c/h",
        "g;x=1/./y": "http://a/b/c/g;x=1/y",
        "g;x=1/../y": "http://a/b/c/y",
        "g?y/./x": "http://a/b/c/g?y/./x",
        "g?y/../x": "http://a/b/c/g?y/../x",
        "g#s/./x": "http://a/b/c/g#s/./x",
        "g#s/../x": "http://a/b/c/g#s/../x",
        "http:g": "http:g",
    }
    for ref, want in cases.items():
        assert resolve_reference(base, ref) == want, ref


def test_rfc3986_hypothesis_vs_urljoin():
    """Constrained fuzz agreement with urllib.parse.urljoin — the
    stdlib's independent implementation of §5.2. Constraints carve out
    urljoin's documented deviations from RFC strictness (it skips
    remove_dot_segments on network-path refs, collapses empty path
    segments, and inherits the base netloc for an empty authority), so
    inside the common subset the two must agree exactly."""
    from urllib.parse import urljoin

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from open_parse_ray.functions.urlref import resolve_reference

    seg = st.sampled_from(["a", "b", "x1", "..", "."])
    path = st.lists(seg, min_size=0, max_size=4).map(
        lambda s: "/" + "/".join(s) if s else "/"
    )
    base = st.tuples(
        st.sampled_from(["http", "https"]),
        st.sampled_from(["h0.org", "h1.org"]),
        path,
        st.sampled_from(["", "?q=1"]),
    ).map(lambda t: f"{t[0]}://{t[1]}{t[2]}{t[3]}")
    rel = st.lists(seg, min_size=1, max_size=4).map("/".join)
    ref = st.one_of(
        st.just("https://z.com/p"),
        st.just("//cdn.x/lib"),     # no dot segments (urljoin deviation)
        path,                       # absolute path
        rel,                        # relative path
        st.sampled_from(["?r=0", "?r=9", "#f", "#f2", ""]),
    )

    @settings(max_examples=300, deadline=None)
    @given(base, ref)
    def check(b, r):
        assert resolve_reference(b, r) == urljoin(b, r)

    check()


def test_remove_dot_segments_terminates_and_is_idempotent():
    """The consuming loop must strictly advance on hostile input (the
    fuzz-every-parser-loop rule) and its output must be a fixed point."""
    import random

    from open_parse_ray.functions.urlref import remove_dot_segments

    rng = random.Random(3)
    chars = "ab/.."
    for _ in range(2000):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 12)))
        out = remove_dot_segments(s)
        assert ".." not in out.split("/") and "." not in out.split("/")
        assert remove_dot_segments(out) == out


def test_extract_hrefs_hand_cases():
    """Attribute syntax coverage: double/single/unquoted hrefs, tag-case
    insensitivity, entity decoding, and the two skip rules (<a> without
    href; href on non-anchor tags)."""
    from open_parse_ray.functions.urlref import extract_hrefs, host_of

    doc = (
        '<a href="A">1</a><A HREF=\'B\'>2</A><a data-z="1" href=C>3</a>'
        '<a name="n">skip</a><link href="/css"><area href="/map">'
        '<a href="?q=1&amp;r=2">4</a><a\nhref = "D" >5</a>'
    )
    assert extract_hrefs(doc) == ["A", "B", "C", "?q=1&r=2", "D"]
    assert host_of("https://User@CDN.Ex.org:8080/p?q#f") == "cdn.ex.org"
    assert host_of("http://plain.org/") == "plain.org"


def test_extract_outlinks_per_doc_shape(ray_session):
    """Every doc emits exactly 7 http(s) outlinks (mailto filtered,
    decoys skipped) with dense link_idx 0..6, and the dots variant
    resolved away its ../ and /./ segments."""
    from open_parse_ray.stages.web import extract_outlinks

    out = extract_outlinks("/root/testdata/sf0.001").to_pandas()
    per = out.groupby("doc_id")["link_idx"].agg(["count", "min", "max"])
    assert (per["count"] == 7).all()
    assert (per["min"] == 0).all() and (per["max"] == 6).all()
    assert not out["url"].str.contains(r"\.\.", regex=True).any()
    assert not out["url"].str.contains("/./", regex=False).any()
    src10 = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "source"]
    ).set_index("doc_id")["source"].loc[10]
    d3 = out[(out["doc_id"] == 10) & (out["link_idx"] == 3)]["url"].iloc[0]
    assert d3 == f"https://{src10}.org/a/3/up/2"  # 10%7=3, 10%4=2


def test_extract_links_anchor_text_rules():
    """Anchor-text extraction: nested markup stripped, entities decoded,
    whitespace normalized, href-less anchors skipped, multiline inner
    text handled."""
    from open_parse_ray.functions.urlref import extract_links

    doc = (
        '<a href="u">hi <b>bold</b>&amp;x</a>'
        '<a name="n">skip me</a>'
        "<A HREF=v>two\n  words </A>"
        '<a href="w"></a>'
    )
    assert extract_links(doc) == [
        ("u", "hi bold &x"), ("v", "two words"), ("w", "")
    ]


def test_anchor_text_index_hand_case(ray_session, tmp_path):
    """Two docs pointing at the same external target with different
    anchors: the index row carries both anchors sorted and the link
    count; a doc's repeated identical (url, anchor) would collapse in
    the anchors set but still count in n_links."""
    from open_parse_ray.stages.web import anchor_text_index

    pd.DataFrame(
        {
            "doc_id": [0, 5],   # both m5 == 0 → same ext target
            "text": ["x", "y"],
            "lang": ["en", "en"],
            "source": ["sa", "sb"],
            "n_chars": [1, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    out = anchor_text_index(str(tmp_path)).to_pandas().set_index("url")
    ext = out.loc["https://ext0.com/x"]
    assert int(ext["n_links"]) == 2
    # doc 0: ref 0%7=0; doc 5: ref 5%7=5 — sorted distinct anchors
    assert ext["anchors"] == "ext site 0 ref 0|ext site 0 ref 5"
    cdn = out.loc["https://cdn.sa.org/lib.js"]
    assert int(cdn["n_links"]) == 1 and cdn["anchors"] == "cdn lib"


def test_frontier_next_urls_anti_join_and_ranking(ray_session, tmp_path):
    """Hand corpus: doc 0 (src 'sa') links /d/3; doc 3 exists with
    doc_id%50==3 and doc_id%3==0 → its canonical carries ?page=, so the
    BARE /d/3 is NOT crawled and stays on the frontier. doc 10's /d/13
    target is crawled by doc 13 (13%3=1 → bare canonical) → excluded.
    Ranking: within a host, higher in-link count wins, then url ASC."""
    from open_parse_ray.stages.web import frontier_next_urls

    pd.DataFrame(
        {
            "doc_id": [0, 3, 10, 13],
            "text": ["x"] * 4,
            "lang": ["en"] * 4,
            "source": ["sa"] * 4,
            "n_chars": [1] * 4,
        }
    ).to_parquet(tmp_path / "documents.parquet")

    # large k: membership assertions must not be per-host-truncated
    out = frontier_next_urls(str(tmp_path), per_host_k=100).to_pandas()
    urls = set(out["url"])
    # doc 0 → /d/3: doc 3's canonical is /d/3?page=3 (3%3==0) → bare
    # /d/3 uncrawled → present
    assert "https://sa.org/d/3" in urls
    # doc 10 → /d/13: doc 13 (13%3==1) canonicalizes to the bare
    # /d/13 → crawled → anti-joined away
    assert "https://sa.org/d/13" not in urls
    # per-host rank is dense from 1 and ordered by (n_links DESC, url)
    for _, grp in out.groupby("host"):
        g = grp.sort_values("rank")
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        pairs = list(zip(-g["n_links"].to_numpy(), g["url"]))
        assert pairs == sorted(pairs)


def test_frontier_distributed_path_equals_broadcast(ray_session):
    """The threshold switch (paragraph_dedup pattern): forcing the
    distributed tagged anti-join (max_broadcast_urls=0) must produce
    exactly the broadcast path's frame."""
    from open_parse_ray.stages.web import frontier_next_urls

    sf = "/root/testdata/sf0.001"
    a = (
        frontier_next_urls(sf)
        .to_pandas()
        .sort_values(["host", "rank"])
        .reset_index(drop=True)
    )
    b = (
        frontier_next_urls(sf, max_broadcast_urls=0)
        .to_pandas()
        .sort_values(["host", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
