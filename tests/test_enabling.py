"""J4 enabling-channel link: archiving gated by another PV's value
(`channelaccess/internal/EnablingChannel.java`)."""

from __future__ import annotations

from cassandra_pv_archiver_spark.operators.asof import enabling_filter


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_enabling_filter_gates_by_asof_value(spark):
    samples = _df(
        spark,
        [("X", t) for t in [5, 15, 25, 35, 45]],
        "channel string, t long",
    )
    # enabled on [10, 30), disabled on [30, 40), enabled again from 40
    enabling = _df(
        spark,
        [(10, True), (30, False), (40, True)],
        "t long, en boolean",
    )
    got = sorted(r.t for r in enabling_filter(samples, enabling).collect())
    # t=5 predates the first enabling sample -> dropped (treated disabled);
    # t=15, 25 inside [10,30); t=35 disabled; t=45 enabled again
    assert got == [15, 25, 45]


def test_enabling_filter_boundary_is_inclusive(spark):
    samples = _df(spark, [("X", 10), ("X", 30)], "channel string, t long")
    enabling = _df(spark, [(10, True), (30, False)], "t long, en boolean")
    got = [r.t for r in enabling_filter(samples, enabling).collect()]
    # a sample exactly at the switch time sees the NEW value (t_e <= t)
    assert got == [10]


def test_enabling_filter_preserves_columns(spark):
    samples = _df(spark, [("X", 12, 1.5)], "channel string, t long, v double")
    enabling = _df(spark, [(10, True)], "t long, en boolean")
    out = enabling_filter(samples, enabling)
    assert out.columns == ["channel", "t", "v"]
    assert out.collect()[0].v == 1.5


def test_asof_align_boundary_and_leading_null(spark):
    from cassandra_pv_archiver_spark.operators.asof import asof_align

    base = _df(
        spark,
        [("X", 5, 50.0), ("X", 10, 51.0), ("X", 20, 52.0), ("Y", 10, 9.0)],
        "channel string, t long, v double",
    )
    # ref AT t=10 must be visible to base t=10 (at-or-before is inclusive);
    # base t=5 precedes every ref -> null; Y has no ref at all -> null
    ref = _df(
        spark,
        [("X", 10, 1.0), ("X", 15, 2.0)],
        "channel string, t long, v double",
    )
    got = {(r.channel, r.t): r for r in asof_align(base, ref).collect()}
    assert got[("X", 5)].ref_v is None
    assert got[("X", 5)].v == 50.0
    assert got[("X", 10)].ref_v == 1.0
    assert got[("X", 20)].ref_v == 2.0
    assert got[("Y", 10)].ref_v is None


def test_enabling_filter_linked_per_channel_gates(spark):
    """Per-channel links (`ConfigurationOptions.java:76`): X follows E1,
    Y follows E2, Z has no link (always archived), W links to a PV that
    never reported (never-seen -> disabled, everything dropped)."""
    from cassandra_pv_archiver_spark.operators.asof import enabling_filter_linked

    samples = _df(
        spark,
        [(ch, t) for ch in ("X", "Y", "Z", "W") for t in [5, 15, 25]],
        "channel string, t long",
    )
    enabling = _df(
        spark,
        [("E1", 10, True), ("E1", 20, False), ("E2", 0, False), ("E2", 20, True)],
        "channel string, t long, en boolean",
    )
    links = _df(
        spark,
        [("X", "E1"), ("Y", "E2"), ("W", "E-silent")],
        "channel string, enabling_channel string",
    )
    got = sorted(
        (r.channel, r.t)
        for r in enabling_filter_linked(samples, enabling, links).collect()
    )
    assert got == [
        ("X", 15),            # E1 on [10,20); 5 predates, 25 disabled
        ("Y", 25),            # E2 off [0,20), on from 20
        ("Z", 5), ("Z", 15), ("Z", 25),  # unlinked -> always kept
    ]


def test_enabling_gate_window_is_partitioned(spark):
    """The interval-build window must be keyed by enabling channel —
    a long transition series never single-tasks (VERDICT r4 #3)."""
    from cassandra_pv_archiver_spark.operators.asof import enabling_filter_linked

    samples = _df(spark, [("X", 5)], "channel string, t long")
    enabling = _df(spark, [("E1", 1, True)], "channel string, t long, en boolean")
    links = _df(spark, [("X", "E1")], "channel string, enabling_channel string")
    plan = enabling_filter_linked(samples, enabling, links)._jdf.queryExecution().executedPlan().toString()
    lead_lines = [ln for ln in plan.splitlines() if "lead(_et" in ln]
    assert lead_lines, plan
    for ln in lead_lines:
        # partition spec leads the windowspecdefinition: (_ech, _et ASC ...)
        assert "windowspecdefinition(_ech" in ln, ln
