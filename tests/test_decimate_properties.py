"""Property-based tests for the decimation core.

Two invariants the reference guarantees, checked on random series:

1. `decimate` matches an exact pure-Python implementation of the
   hold-forward time-weighted contract (`SampleDecimator.java:36-113`,
   weights via `AbstractStatefulSampleDecimator.java:74-92`) computed in
   rational arithmetic.
2. Cascade exactness (`AggregatedScalarDoubleAggregator.java:62-109`):
   re-aggregating the p-level to 2p recombines to the direct 2p
   decimation (up to the documented 1e-4 input quantization of the
   cascade path) on every window both paths emit.
"""

from __future__ import annotations

import math
from fractions import Fraction

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from cassandra_pv_archiver_spark.operators.decimate import NS, decimate, reaggregate

PERIOD_S = 60
PERIOD_NS = PERIOD_S * NS


@st.composite
def sample_series(draw):
    n = draw(st.integers(min_value=2, max_value=25))
    ts = draw(
        st.lists(
            st.integers(min_value=0, max_value=10 * PERIOD_NS),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    ts.sort()
    vs = draw(
        st.lists(
            st.integers(min_value=-10_000, max_value=10_000),
            min_size=n,
            max_size=n,
        )
    )
    sev = draw(
        st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n)
    )
    return [
        (t, v / 100.0, s, s * 6) for t, v, s in zip(ts, vs, sev)
    ]


def py_decimate(rows, period_ns):
    """Exact rational-arithmetic hold-forward decimation of one channel.

    rows: [(t_ns, v, severity, status)] strictly increasing t.
    Returns {win: (mean, std, vmin, vmax, frac, severity, status, n)}.
    """
    hwm = rows[-1][0]
    per_win: dict[int, list] = {}
    for i, (t, v, sev, stat) in enumerate(rows):
        t_end = rows[i + 1][0] if i + 1 < len(rows) else hwm
        if t_end <= t:
            continue
        for win in range(t // period_ns, (t_end - 1) // period_ns + 1):
            if (win + 1) * period_ns > hwm:
                break
            clip = max(t, win * period_ns)
            w = min(t_end, (win + 1) * period_ns) - clip
            per_win.setdefault(win, []).append((clip, w, v, sev, stat))
    out = {}
    for win, parts in per_win.items():
        sw = sum(w for _, w, _, _, _ in parts)
        vq = lambda v: Fraction(math.floor(v * 100 + 0.5), 100)
        mean = sum(Fraction(w) * vq(v) for _, w, v, _, _ in parts) / sw
        e2 = sum(Fraction(w) * vq(v) ** 2 for _, w, v, _, _ in parts) / sw
        var = e2 - mean * mean
        best = max(parts, key=lambda p: (p[3], -p[0]))  # max sev, earliest
        out[win] = (
            float(mean),
            math.sqrt(max(float(var), 0.0)),
            min(v for _, _, v, _, _ in parts),
            max(v for _, _, v, _, _ in parts),
            float(Fraction(sw, period_ns)),
            best[3],
            best[4],
            len(parts),
        )
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(sample_series())
def test_decimate_matches_rational_oracle(spark, series):
    df = spark.createDataFrame(
        [("X", t, v, s, st_) for t, v, s, st_ in series],
        "channel string, t long, v double, severity int, status int",
    )
    got = {
        r.t // PERIOD_NS: r for r in decimate(df, PERIOD_S).collect()
    }
    want = py_decimate(series, PERIOD_NS)
    assert set(got) == set(want), (sorted(got), sorted(want))
    for win, (mean, std, vmin, vmax, frac, sev, stat, n) in want.items():
        r = got[win]
        assert abs(r.mean - mean) < 1e-9, (win, r.mean, mean)
        # sqrt(E[v^2] - mean^2) in doubles (same formula as the reference
        # and the DuckDB oracle) suffers |v|*sqrt(eps) cancellation near
        # std=0; the rational oracle is exact, so allow that envelope
        tol = 3e-8 * (1.0 + max(abs(r.vmin), abs(r.vmax))) + 1e-9
        assert abs(r.std - std) < tol, (win, r.std, std)
        assert r.vmin == vmin and r.vmax == vmax
        assert abs(r.covered_fraction - frac) < 1e-12
        assert 0 < r.covered_fraction <= 1 + 1e-12
        assert r.vmin - 1e-9 <= r.mean <= r.vmax + 1e-9
        assert r.severity == sev and r.status == stat
        assert r.n_samples == n


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(sample_series())
def test_cascade_recombines_to_direct_decimation(spark, series):
    df = spark.createDataFrame(
        [("X", t, v, s, st_) for t, v, s, st_ in series],
        "channel string, t long, v double, severity int, status int",
    )
    direct = {r.t: r for r in decimate(df, 2 * PERIOD_S).collect()}
    fine = decimate(df, PERIOD_S)
    casc = {
        r.t: r for r in reaggregate(fine, PERIOD_S, 2 * PERIOD_S).collect()
    }
    # the cascade can only emit windows whose source coverage is complete;
    # every window it emits must also exist in the direct path
    assert set(casc) <= set(direct)
    for t, r in casc.items():
        d = direct[t]
        assert abs(r.mean - d.mean) < 5e-3, (t, r.mean, d.mean)
        assert abs(r.std - d.std) < 5e-2, (t, r.std, d.std)
        assert r.vmin == d.vmin and r.vmax == d.vmax
        assert abs(r.covered_fraction - d.covered_fraction) < 1e-3
        assert r.severity == d.severity and r.status == d.status
        # n_samples is our diagnostic extension (the reference's aggregated
        # samples carry no count). The cascade sums per-source-window
        # contribution counts, so a sample held forward across a fine-window
        # boundary counts once per fine window it seeds — >= the direct
        # path's count of distinct weighted parts.
        assert r.n_samples >= d.n_samples


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(sample_series())
def test_deep_cascade_recombines_to_direct_decimation(spark, series):
    """Depth-3 stack (p -> 2p -> 4p) recombines to the direct 4p
    decimation — the associativity the production level hierarchy relies
    on (each level is built from the next-finer level, never from raw).
    Tolerances match the single-stage test; quantization error compounds
    once more through the second stage."""
    df = spark.createDataFrame(
        [("X", t, v, s, st_) for t, v, s, st_ in series],
        "channel string, t long, v double, severity int, status int",
    )
    direct = {r.t: r for r in decimate(df, 4 * PERIOD_S).collect()}
    fine = decimate(df, PERIOD_S)
    mid = reaggregate(fine, PERIOD_S, 2 * PERIOD_S)
    casc = {
        r.t: r
        for r in reaggregate(mid, 2 * PERIOD_S, 4 * PERIOD_S).collect()
    }
    assert set(casc) <= set(direct)
    for t, r in casc.items():
        d = direct[t]
        assert abs(r.mean - d.mean) < 1e-2, (t, r.mean, d.mean)
        assert abs(r.std - d.std) < 1e-1, (t, r.std, d.std)
        assert r.vmin == d.vmin and r.vmax == d.vmax
        assert abs(r.covered_fraction - d.covered_fraction) < 1e-3
        assert r.severity == d.severity and r.status == d.status
        assert r.n_samples >= d.n_samples
