"""Property-based tests: the round-2 pipeline operators vs exact
pure-Python references on random inputs (the same strategy that pins the
decimation family in test_decimate_properties.py)."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from cassandra_pv_archiver_spark.operators import dedup, stats
from cassandra_pv_archiver_spark.operators.events import sessionize

MIN_NS = 60 * 1_000_000_000
GAP_MIN = 30


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.integers(min_value=0, max_value=300),  # minute
        st.sampled_from(["click", "error"]),
        st.integers(min_value=0, max_value=9999),  # value in cents
    ),
    min_size=1,
    max_size=40,
)


def py_sessionize(rows):
    """Exact reference: per user, sort by time, split when the gap
    STRICTLY exceeds GAP_MIN (Spark merges at exactly-gap), decimal
    value sums."""
    out = {}
    by_user = {}
    for u, m, et, cents in rows:
        by_user.setdefault(u, []).append((m * 60_000_000, et, cents))
    for u, evs in by_user.items():
        evs.sort()
        cur = None
        for t, et, cents in evs:
            if cur is None or t - cur["end"] > GAP_MIN * 60_000_000:
                if cur is not None:
                    out[(u, cur["start"])] = cur
                cur = {"start": t, "end": t, "n": 0, "err": 0,
                       "val": Decimal(0)}
            cur["end"] = max(cur["end"], t)
            cur["n"] += 1
            cur["err"] += et == "error"
            cur["val"] += Decimal(cents) / 100
        out[(u, cur["start"])] = cur
    return out


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(events_strategy)
def test_sessionize_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(u, m * MIN_NS, et, cents / 100.0) for u, m, et, cents in rows],
        "user_id long, ts long, event_type string, value double",
    )
    got = {(r.user_id, r.session_start): r for r in sessionize(df, GAP_MIN).collect()}
    want = py_sessionize(rows)
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k, w in want.items():
        r = got[k]
        assert r.session_end == w["end"]
        assert r.n_events == w["n"]
        assert r.n_errors == w["err"]
        assert r.total_value == float(w["val"])


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ),
    min_size=0,
    max_size=20,
)


def py_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    n = 16
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    ).filter("id_a != id_b")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {
        r.doc_id: r.comp
        for r in dedup.connected_components(pairs, nodes).collect()
    }
    # union-find roots are not necessarily the min of the component;
    # canonicalize both sides to min-of-component
    uf = py_components(n, edges)
    groups = {}
    for i, r in uf.items():
        groups.setdefault(r, []).append(i)
    want = {i: min(groups[r]) for i, r in uf.items()}
    assert got == want


values_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(values_strategy)
def test_group_quantiles_match_sorted_index(spark, rows):
    df = spark.createDataFrame(
        [(k, float(v), i) for i, (k, v) in enumerate(rows)],
        "k string, v double, id long",
    )
    qs = (0.1, 0.5, 0.9)
    got = {
        (r.k, r.q): r.q_value
        for r in stats.group_discrete_quantiles(df, "k", "v", qs, "id").collect()
    }
    by_key = {}
    for i, (k, v) in enumerate(rows):
        by_key.setdefault(k, []).append((float(v), i))
    want = {}
    for k, vals in by_key.items():
        vals.sort()
        for q in qs:
            want[(k, q)] = vals[math.ceil(q * len(vals)) - 1][0]
    assert got == want


names_strategy = st.lists(
    st.text(alphabet="abc:_", min_size=1, max_size=6),
    min_size=1,
    max_size=25,
    unique=True,
)


@given(names_strategy)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_fuzzy_pairs_equals_bruteforce(spark, names):
    """FastSS deletion-neighborhood blocking finds EXACTLY the pairs the
    O(n^2) levenshtein scan finds at radius 1 — the recall guarantee the
    operator's docstring claims, verified on random short strings."""
    from cassandra_pv_archiver_spark.operators.linkage import fuzzy_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b, lev(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if lev(a, b) <= 1
    }
    want = {(min(a, b), max(a, b), d) for a, b, d in want}
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r.name_a, r.name_b, r.dist) for r in fuzzy_pairs(df).collect()
    }
    assert got == want


align_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=15,
             unique=True),
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=15,
             unique=True),
)


@given(align_strategy)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_align_equals_per_row_probe(spark, tv):
    """asof_align's union-merge window equals the brute-force per-row
    'latest ref at-or-before t' probe on random series."""
    from cassandra_pv_archiver_spark.operators.asof import asof_align

    base_ts, ref_ts = tv
    base = spark.createDataFrame(
        [("X", t, float(t)) for t in base_ts], "channel string, t long, v double"
    )
    ref = spark.createDataFrame(
        [("X", t, float(t * 10)) for t in ref_ts],
        "channel string, t long, v double",
    )
    got = {r.t: r.ref_v for r in asof_align(base, ref).collect()}
    for t in base_ts:
        earlier = [r for r in ref_ts if r <= t]
        want = float(max(earlier) * 10) if earlier else None
        assert got[t] == want, f"t={t}: {got[t]} != {want}"


packing_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=999),  # doc_id
        st.integers(min_value=1, max_value=5000),  # n_tokens
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)


@given(packing_strategy)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_sequence_packing_invariants(spark, rows):
    """Packing invariants on random inputs: within each shard stream the
    offsets are the exclusive prefix sums of doc_id-ordered token counts
    (gapless, non-overlapping), and pack_id == start_offset // window."""
    from cassandra_pv_archiver_spark.operators.sampling import sequence_packing

    d = spark.createDataFrame(
        [(i, "en", n) for i, n in rows], "doc_id long, lang string, n_tokens long"
    )
    out = sequence_packing(d, window_tokens=2048, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
        assert r.pack_id == r.start_offset // 2048
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.doc_id)
        acc = 0
        for r in rs:
            assert r.start_offset == acc, (r, acc)
            acc += r.n_tokens


wsample_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),   # doc id (dups possible)
        st.sampled_from(["g1", "g2"]),            # group
        st.integers(min_value=0, max_value=5),    # weight (0 = no ticket)
    ),
    min_size=1,
    max_size=50,
    unique_by=lambda r: r[0],
)


def py_weighted_sample(rows, k):
    """Exact reference: per group, race key = max md5 ticket, top-k by
    (key desc, id asc) — mirrors operators/sampling.weighted_sample."""
    import hashlib

    by_group: dict = {}
    for i, g, w in rows:
        if w < 1:
            continue
        key = max(
            hashlib.md5(f"wsample:{i}:{r}".encode()).hexdigest()
            for r in range(w)
        )
        by_group.setdefault(g, []).append((key, i, w))
    out = []
    for g, items in by_group.items():
        items.sort(key=lambda r: r[1])
        items.sort(key=lambda r: r[0], reverse=True)
        for rank, (key, i, w) in enumerate(items[:k], start=1):
            out.append((g, rank, i, w, key))
    return sorted(out)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(rows=wsample_strategy, k=st.integers(min_value=1, max_value=6))
def test_weighted_sample_matches_python_reference(spark, rows, k):
    from pyspark.sql import functions as F

    from cassandra_pv_archiver_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(rows, "doc_id long, lang string, w int")
    got = sorted(
        (r.lang, r.rank, r.doc_id, r.weight, r.sample_key)
        for r in weighted_sample(
            df, k=k, weight=F.col("w"), group_col="lang", n_buckets=4
        ).collect()
    )
    assert got == py_weighted_sample(rows, k)


seasonal_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=47),   # hour slot (2 days)
        st.integers(min_value=0, max_value=20),   # offset inside the hour
        st.integers(min_value=-500, max_value=500),  # value in cents
    ),
    min_size=2,
    max_size=60,
    unique_by=lambda r: (r[0], r[1]),
)


def py_seasonal(rows, k=3):
    """Exact integer reference for stats.seasonal_hod_anomalies."""
    cells: dict = {}
    hour_ns = 3_600_000_000_000
    for slot, off, cents in rows:
        t = slot * hour_ns + off
        cells.setdefault(slot % 24, []).append(cents)
    out = {}
    for hod, vis in cells.items():
        n, s, s2 = len(vis), sum(vis), sum(x * x for x in vis)
        flags = sum(
            1 for x in vis if (x * n - s) ** 2 > k * k * (n * s2 - s * s)
        )
        out[hod] = (n, flags)
    return out


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(rows=seasonal_strategy)
def test_seasonal_census_matches_python_reference(spark, rows):
    from cassandra_pv_archiver_spark.operators.stats import (
        seasonal_hod_anomalies,
    )

    hour_ns = 3_600_000_000_000
    df = spark.createDataFrame(
        [("c", slot * hour_ns + off, cents / 100.0)
         for slot, off, cents in rows],
        "channel string, t long, v double",
    )
    got = {
        r.hod: (r.n_samples, r.n_anomalies)
        for r in seasonal_hod_anomalies(df).collect()
    }
    assert got == py_seasonal(rows)
