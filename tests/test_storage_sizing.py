"""Storage-sizing operators (operators/storage.py): Gorilla delta-of-delta
timestamp bits, the decimated-level lattice, offset-grid bucket rollover,
and the severity transition matrix."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_pv_archiver_spark.operators.storage import (
    GORILLA_DOD_ESCAPE_BITS,
    GORILLA_FIRST_DELTA_BITS,
    GORILLA_FIRST_TS_BITS,
    bucket_rollover_estimate,
    decimation_lattice,
    gorilla_ts_bits,
    severity_transitions,
)

NS = 1_000_000_000


def _series(spark, ts, channel="PV:1"):
    return spark.createDataFrame(
        [(channel, int(t)) for t in ts], "channel string, t long"
    )


class TestGorillaTsBits:
    def test_regular_lattice_costs_one_bit_per_tail_sample(self, spark):
        # perfectly regular 10s spacing: header 64 + first delta 27 +
        # (n-2) x 1 bit of dod==0
        n = 12
        s = _series(spark, [i * 10 * NS for i in range(n)])
        row = gorilla_ts_bits(s).collect()[0]
        assert row.n_samples == n
        assert row.bits_ts == (
            GORILLA_FIRST_TS_BITS + GORILLA_FIRST_DELTA_BITS + (n - 2)
        )
        assert row.bytes_est == (row.bits_ts + 7) // 8
        assert row.bytes_raw == 8 * n

    def test_dod_bucket_boundaries(self, spark):
        # deltas (s): 100, then 164 (dod 64 -> 9 bits), then 420
        # (dod 256 -> 12 bits), then 2468 (dod 2048 -> 16 bits), then
        # 4517 (dod 2049 -> escape 36 bits)
        deltas = [100, 164, 420, 2468, 4517]
        ts, cur = [0], 0
        for d in deltas:
            cur += d * NS
            ts.append(cur)
        row = gorilla_ts_bits(_series(spark, ts)).collect()[0]
        assert row.bits_ts == (
            GORILLA_FIRST_TS_BITS
            + GORILLA_FIRST_DELTA_BITS
            + 9
            + 12
            + 16
            + GORILLA_DOD_ESCAPE_BITS
        )

    def test_sub_grid_jitter_is_invisible(self, spark):
        # +0.4s jitter on a 10s grid truncates away: same bits as regular
        ts = [i * 10 * NS + (400_000_000 if i % 2 else 0) for i in range(8)]
        reg = [i * 10 * NS for i in range(8)]
        j = gorilla_ts_bits(_series(spark, ts)).collect()[0]
        r = gorilla_ts_bits(_series(spark, reg)).collect()[0]
        assert j.bits_ts == r.bits_ts

    def test_single_sample_header_only(self, spark):
        row = gorilla_ts_bits(_series(spark, [123 * NS])).collect()[0]
        assert row.bits_ts == GORILLA_FIRST_TS_BITS
        assert row.bytes_est == 8

    def test_series_column_partitions_independently(self, spark):
        a = _series(spark, [0, 10 * NS]).withColumn("series", F.lit("x"))
        b = _series(spark, [5 * NS]).withColumn("series", F.lit("y"))
        rows = {
            r.series: r
            for r in gorilla_ts_bits(
                a.unionByName(b), series_col="series"
            ).collect()
        }
        assert rows["x"].bits_ts == (
            GORILLA_FIRST_TS_BITS + GORILLA_FIRST_DELTA_BITS
        )
        assert rows["y"].bits_ts == GORILLA_FIRST_TS_BITS


class TestDecimationLattice:
    def test_lattice_covers_span_inclusive(self, spark):
        p = 3600 * NS
        s = _series(spark, [p + 5, 3 * p + 1])  # windows 1..3
        got = sorted(r.t for r in decimation_lattice(s, p).collect())
        assert got == [p, 2 * p, 3 * p]

    def test_exact_boundary_sample(self, spark):
        # t exactly on a window boundary: `div` must not truncate below
        # (the double-division off-by-one this module guards against)
        p = 3600 * NS
        s = _series(spark, [2 * p])
        got = [r.t for r in decimation_lattice(s, p).collect()]
        assert got == [2 * p]

    def test_per_channel_bounds(self, spark):
        p = 100
        a = _series(spark, [100, 250], channel="A")
        b = _series(spark, [300, 310], channel="B")
        got = sorted(
            (r.channel, r.t)
            for r in decimation_lattice(a.unionByName(b), p).collect()
        )
        assert got == [("A", 100), ("A", 200), ("B", 300)]


class TestBucketRollover:
    def test_offset_grid_assignment(self, spark):
        # 5 samples x 40 bytes with cap 100: offsets 0,40,80,120,160 ->
        # buckets 0,0,0,1,1
        df = spark.createDataFrame(
            [("c", t, "x" * 8) for t in range(5)],
            "channel string, t long, sval string",
        )
        got = (
            bucket_rollover_estimate(
                df, cap_bytes=100, overhead_bytes=32,
                payload_len=F.octet_length("sval"),
            )
            .orderBy("bucket_seq")
            .collect()
        )
        assert [(r.bucket_seq, r.n_samples, r.bucket_bytes) for r in got] == [
            (0, 3, 120),
            (1, 2, 80),
        ]
        assert (got[0].t_first, got[0].t_last) == (0, 2)
        assert (got[1].t_first, got[1].t_last) == (3, 4)

    def test_bytes_conserved_across_buckets(self, spark):
        df = spark.createDataFrame(
            [("c", t, "y" * (t % 7)) for t in range(50)],
            "channel string, t long, sval string",
        )
        got = bucket_rollover_estimate(
            df, cap_bytes=128, overhead_bytes=32,
            payload_len=F.octet_length("sval"),
        )
        total = got.agg(
            F.sum("bucket_bytes").alias("b"), F.sum("n_samples").alias("n")
        ).collect()[0]
        assert total.n == 50
        assert total.b == sum(32 + (t % 7) for t in range(50))


class TestSeverityTransitions:
    def test_matrix_counts(self, spark):
        rows = [
            ("A", 0, 0), ("A", 1, 2), ("A", 2, 0),  # A: 0->2, 2->0
            ("B", 0, 0), ("B", 1, 2),               # B: 0->2
        ]
        df = spark.createDataFrame(
            rows, "channel string, t long, severity int"
        )
        got = {
            (r.from_sev, r.to_sev): (r.n_transitions, r.n_channels)
            for r in severity_transitions(df).collect()
        }
        assert got == {(0, 2): (2, 2), (2, 0): (1, 1)}

    def test_single_sample_channel_contributes_nothing(self, spark):
        df = spark.createDataFrame(
            [("A", 0, 1)], "channel string, t long, severity int"
        )
        assert severity_transitions(df).count() == 0


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    def _py_gorilla_bits(ts, grid_ns=NS):
        """Brute-force Gorilla §4.1.1 bit count of one sorted series."""
        g = [t // grid_ns for t in ts]
        bits = 0
        prev_d = None
        for i, _ in enumerate(g):
            if i == 0:
                bits += GORILLA_FIRST_TS_BITS
                continue
            d = g[i] - g[i - 1]
            if prev_d is None:
                bits += GORILLA_FIRST_DELTA_BITS
            else:
                dod = d - prev_d
                if dod == 0:
                    bits += 1
                elif -63 <= dod <= 64:
                    bits += 9
                elif -255 <= dod <= 256:
                    bits += 12
                elif -2047 <= dod <= 2048:
                    bits += 16
                else:
                    bits += GORILLA_DOD_ESCAPE_BITS
            prev_d = d
        return bits

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.integers(min_value=0, max_value=3_000_000 * NS),
            min_size=1,
            max_size=40,
            unique=True,
        )
    )
    def test_gorilla_bits_match_bruteforce(spark, ts):
        ts = sorted(ts)
        row = gorilla_ts_bits(_series(spark, ts)).collect()[0]
        want = _py_gorilla_bits(ts)
        assert row.bits_ts == want
        assert row.bytes_est == (want + 7) // 8

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=0, max_value=12),
            ),
            min_size=1,
            max_size=60,
            unique_by=lambda p: p[0],
        ),
        st.integers(min_value=64, max_value=512),
    )
    def test_rollover_matches_bruteforce_offset_grid(spark, rows, cap):
        rows = sorted(rows)
        df = spark.createDataFrame(
            [("c", t, "z" * ln) for t, ln in rows],
            "channel string, t long, sval string",
        )
        got = {
            r.bucket_seq: (r.n_samples, r.bucket_bytes)
            for r in bucket_rollover_estimate(
                df, cap_bytes=cap, overhead_bytes=32,
                payload_len=F.octet_length("sval"),
            ).collect()
        }
        want: dict[int, list[int]] = {}
        off = 0
        for _t, ln in rows:
            sz = 32 + ln
            want.setdefault(off // cap, []).append(sz)
            off += sz
        assert got == {
            b: (len(szs), sum(szs)) for b, szs in want.items()
        }
