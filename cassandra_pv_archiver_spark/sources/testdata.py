"""Canonical readers over the driver's synthetic parquet tables.

The ``events`` stream table stands in for the reference's raw-sample feed
(FIXTURES.md §6): ``ts -> t`` (ns-epoch int64), ``user_id -> channel``,
``value -> v`` (scalar_double payload), with a deterministic severity/status
mapping so severity-propagation operators have signal.

Timestamps are kept as **int64 nanoseconds** end-to-end (Spark TimestampType
is µs — see SURVEY.md §7 "What's hard" #4); reference semantics:
`Sample.java:19-29` (ns-epoch, signed 64-bit).

The monotonicity filter (F5, `ArchivedChannelDecimationLevel.java:398-425`)
is applied at load: for duplicate (channel, t) the first row by event_id
wins, mirroring "discard sample if t <= last written t". Expressed as a
window `row_number` so it stays JVM-side and pushes the heavy lifting into
one shuffle by (channel) that downstream per-channel operators reuse.

``SAMPLES_CTE`` is the *same* transformation as DuckDB SQL, prefixed to
every oracle query so the Spark plan and the oracle read identical inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

NS = 1_000_000_000  # ns per second



#: (applicationId, path, dir-mtime) -> lazy source DataFrame. Each
#: ``spark.read.parquet(path)`` re-lists the directory and re-reads a
#: footer for schema inference — ~80-100 ms of driver-side work per call
#: on this host (guide §6 "file listing"), paid hundreds of times across
#: the registry for the same ten immutable tables. Caching the *unresolved
#: scan* (plan metadata only — never rows, never results; every action
#: still scans parquet) is the metastore/manifest analog of
#: ``spark.sql.hive.filesourcePartitionFileCacheSize``. The mtime in the
#: key drops the entry if anything rewrites the directory (tests build
#: scratch sf dirs), and the applicationId scopes it to one session.
_SCAN_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's events.parquet has stored TIMESTAMP(NANOS), which Spark 4
    # rejects by default; nanosAsLong surfaces it as the raw int64 ns value —
    # exactly our canonical representation. Set at call time so it also works
    # on sessions we didn't build (the driver's).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    try:
        # max mtime over the directory AND its entries: an in-place
        # rewrite of a part file (same filename) bumps the file's mtime
        # but not the directory's, which served a stale file index
        # before (r11 review)
        mtime = os.stat(path).st_mtime_ns
        if os.path.isdir(path):
            with os.scandir(path) as it:
                for e in it:
                    mtime = max(mtime, e.stat().st_mtime_ns)
    except OSError:
        # unstattable (non-local fs): fall through, uncached
        return spark.read.parquet(path)
    app_id = spark.sparkContext.applicationId
    key = (app_id, path, mtime)
    df = _SCAN_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        # drop superseded versions of the same path (rewritten scratch
        # dirs) and every entry of a dead session — a process cycling
        # SparkSessions would otherwise grow the dict unboundedly
        # (r11 review)
        for k in [
            k for k in _SCAN_CACHE
            if k[0] != app_id or (k[1] == path and k[2] != mtime)
        ]:
            del _SCAN_CACHE[k]
        _SCAN_CACHE[key] = df
    return df


def load_events(
    spark: SparkSession,
    sf_dir: str,
    lo_ns: int | None = None,
    hi_ns: int | None = None,
) -> DataFrame:
    """events.parquet with ``ts`` normalized to int64 ns — the single entry
    point every events consumer goes through.

    The driver has produced two physical encodings of ``ts`` across rounds:
    TIMESTAMP(NANOS) (read as raw int64 via ``nanosAsLong``) and
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Both normalize to the same
    int64 ns-epoch values, so every downstream expression — and the DuckDB
    oracles' ``epoch_ns(ts)`` — is encoding-agnostic.

    ``lo_ns``/``hi_ns`` are applied as range predicates on the PHYSICAL
    column *before* normalization (in the column's native type), so they
    reach the parquet row-group stats; they are deliberately µs-slack
    bounds — exact trimming happens on the derived ``t`` downstream.
    """
    ev = load_table(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
        if lo_ns is not None:
            ev = ev.filter(F.col("ts") >= lo_ns)
        if hi_ns is not None:
            ev = ev.filter(F.col("ts") < hi_ns + 1000)  # t truncates to µs
        return ev
    # µs TIMESTAMP / TIMESTAMP_NTZ: wall times are UTC epoch by contract
    # (the oracle's epoch_ns assumes the same), so pin the session zone
    # before any timestamp<->epoch conversion.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if lo_ns is not None:
        lo_us = (lo_ns + 999) // 1000
        ev = ev.filter(
            F.col("ts") >= F.expr(f"CAST(timestamp_micros({lo_us}) AS {ts_type})")
        )
    if hi_ns is not None:
        hi_us = (hi_ns + 1999) // 1000  # ts_us < hi_us  <=>  ts_ns < hi_ns+1000
        ev = ev.filter(
            F.col("ts") < F.expr(f"CAST(timestamp_micros({hi_us}) AS {ts_type})")
        )
    return ev.withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    )


def load_samples(
    spark: SparkSession,
    sf_dir: str,
    channels=None,
    lo_ns: int | None = None,
    hi_ns: int | None = None,
) -> DataFrame:
    """events.parquet -> canonical raw numeric sample series.

    Columns: channel string, t long (ns), v double, severity int, status int,
    event_id long.  Strictly increasing t per channel (F5 dedup applied).

    ``channels``/``lo_ns``/``hi_ns`` are translated to predicates on the
    PHYSICAL columns (user_id, ts) *before* the channel projection — the
    derived ``channel``/``t`` columns block Catalyst's own pushdown, so this
    is the by-hand filter pushdown that lets the parquet scan prune row
    groups. Filtering commutes with the per-(channel, t) dedup.
    """
    ev = load_events(spark, sf_dir, lo_ns=lo_ns, hi_ns=hi_ns)
    if channels is not None:
        ids = [int(str(c).split(":", 1)[1]) for c in channels]
        ev = ev.filter(F.col("user_id").isin(ids))
    # ts arrives as int64 ns (nanosAsLong); truncate to µs precision because
    # the DuckDB oracle reads the column as µs TIMESTAMP — both sides see
    # identical t values. (String-expression form: plan construction cost
    # is ~1 driver call instead of ~30 — OPTIMIZATION_r11.md §build.)
    sev = ("CASE WHEN event_type = 'error' THEN 2"
           " WHEN event_type = 'signup' THEN 1 ELSE 0 END")
    s = ev.selectExpr(
        "concat('PV:', CAST(user_id AS STRING)) AS channel",
        "(ts div 1000) * 1000 AS t",
        "value AS v",
        f"CAST({sev} AS INT) AS severity",
        f"CAST(({sev}) * 6 AS INT) AS status",
        "event_id",
    )
    return _dedup_by_channel(s)


def _dedup_by_channel(s: DataFrame) -> DataFrame:
    """F5 dedup with ONE exchange: pre-hash by channel, then the (channel,t)
    dedup window's clustering requirement is already satisfied (hash(channel)
    ⊆ cluster keys) and its (channel, t, event_id) sort is a superset of the
    (channel, t) ordering every downstream per-channel window needs — so
    decimate/asof plans reuse this single exchange end-to-end."""
    return (
        s.repartition("channel")
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY channel, t"
            " ORDER BY event_id) AS _rn",
        )
        .filter("_rn = 1")
        .drop("_rn")
    )


def load_string_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> non-aggregatable (string-payload) sample series.

    Used by pick-first decimation (A5): payload = event_type, channel keyed
    by user_id with an 'EVT:' prefix so the two series don't collide.
    """
    ev = load_events(spark, sf_dir)
    s = ev.selectExpr(
        "concat('EVT:', CAST(user_id AS STRING)) AS channel",
        "(ts div 1000) * 1000 AS t",
        "event_type AS sval",
        "event_id",
    )
    return _dedup_by_channel(s)


def load_mixed_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> tagged-union mixed-type sample series (A6 input).

    Type mapping (deterministic, exercises every A6 branch):
      click/view -> scalar_double (v = value)
      purchase   -> scalar_long   (v = floor(value), integral payload)
      signup     -> scalar_string (sval, non-aggregatable non-marker -> veto)
      error      -> disconnected  (marker, no payload)
    """
    ev = load_events(spark, sf_dir)
    s = ev.selectExpr(
        "concat('PV:', CAST(user_id AS STRING)) AS channel",
        "(ts div 1000) * 1000 AS t",
        "CASE WHEN event_type IN ('click', 'view') THEN 'scalar_double'"
        " WHEN event_type = 'purchase' THEN 'scalar_long'"
        " WHEN event_type = 'signup' THEN 'scalar_string'"
        " ELSE 'disconnected' END AS type",
        "event_id",
        "value",
        "event_type",
    ).selectExpr(
        "channel",
        "t",
        "type",
        "CASE WHEN type = 'scalar_long' THEN CAST(floor(value) AS DOUBLE)"
        " WHEN type = 'scalar_double' THEN value END AS v",
        "CASE WHEN type = 'scalar_string'"
        " THEN concat('S', CAST(event_id % 100 AS STRING)) END AS sval",
        "CASE WHEN type IN ('scalar_double', 'scalar_long', 'scalar_string')"
        " THEN CAST(event_id % 4 AS INT) END AS severity",
        "CASE WHEN type IN ('scalar_double', 'scalar_long', 'scalar_string')"
        " THEN CAST((event_id % 4) * 6 AS INT) END AS status",
        "event_id",
    )
    return _dedup_by_channel(s)


#: Enum label set for the typed fixture's SCALAR_ENUM channels (the
#: reference stores labels per sample, `ChannelAccessSampleValueAccess
#: .java:183-186`).
ENUM_LABELS = ("OFF", "ON", "FAULT", "UNKNOWN")


def load_typed_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> FULL sample-type union (arrays + enum + display
    metadata), the §1.3 tagged union covering the reference's 20-type
    system (`ChannelAccessSampleType.java:18-129`).

    Type mapping (deterministic; array elements and limits are
    integral-valued doubles so cross-engine text renderings agree):

      click    -> scalar_double  (v = value; numeric display metadata)
      view     -> array_double   (aval = [d, 2d, 3d], d = round(100*value);
                                  numeric display metadata)
      purchase -> scalar_enum    (eval = event_id % 4, labels = ENUM_LABELS)
                  / array_enum   (aval = 2 indexes) by event_id parity
      signup   -> array_string   (asval = 2 derived strings)
      error    -> disabled / disconnected markers (by event_id parity)

    Payload slots (exactly one family non-null per row): ``v`` scalar
    numeric, ``aval array<double>`` numeric arrays, ``eval int`` enum
    index, ``labels array<string>`` enum labels, ``sval string`` scalar
    string, ``asval array<string>`` string arrays. ``meta`` is the numeric
    display-metadata struct (units/precision/8 limits,
    `ChannelAccessSampleValueAccess.java:98-132,188-207`); precision
    varies per event so "metadata of the first used sample" semantics are
    exercised (`ChannelAccessSampleDecimatorTest.java:700-757`).
    """
    ev = load_events(spark, sf_dir)
    # string-expression form (plan-construction cost; see
    # OPTIMIZATION_r11.md §build) — semantics unchanged, the DuckDB
    # mirror below stays the lockstep reference
    d = "CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DOUBLE)"
    wl = "CAST((user_id % 7) * 10 AS DOUBLE)"
    labels_arr = "array(" + ", ".join(f"'{x}'" for x in ENUM_LABELS) + ")"
    s = ev.selectExpr(
        "concat('PV:', CAST(user_id AS STRING)) AS channel",
        "(ts div 1000) * 1000 AS t",
        "CASE WHEN event_type = 'click' THEN 'scalar_double'"
        " WHEN event_type = 'view' THEN 'array_double'"
        " WHEN event_type = 'purchase' AND event_id % 2 = 0"
        " THEN 'scalar_enum'"
        " WHEN event_type = 'purchase' THEN 'array_enum'"
        " WHEN event_type = 'signup' THEN 'array_string'"
        " WHEN event_id % 2 = 0 THEN 'disabled'"
        " ELSE 'disconnected' END AS type",
        "event_id",
        "user_id",
        "value",
    ).selectExpr(
        "channel",
        "t",
        "type",
        "CASE WHEN type = 'scalar_double' THEN value END AS v",
        f"CASE WHEN type = 'array_double'"
        f" THEN array({d}, ({d}) * 2, ({d}) * 3)"
        " WHEN type = 'array_enum'"
        " THEN array(CAST(event_id % 4 AS DOUBLE),"
        " CAST((event_id + 1) % 4 AS DOUBLE)) END AS aval",
        "CASE WHEN type = 'scalar_enum'"
        " THEN CAST(event_id % 4 AS INT) END AS eval",
        f"CASE WHEN type IN ('scalar_enum', 'array_enum')"
        f" THEN {labels_arr} END AS labels",
        "CASE WHEN type = 'array_string'"
        " THEN array(concat('S', CAST(event_id % 100 AS STRING)),"
        " concat('T', CAST(user_id % 50 AS STRING))) END AS asval",
        "CAST(NULL AS STRING) AS sval",
        "CASE WHEN type IN ('scalar_double', 'array_double')"
        " THEN named_struct("
        "'precision', CAST(event_id % 5 AS INT),"
        " 'units', concat('V', CAST(user_id % 3 AS STRING)),"
        f" 'lower_warning_limit', -({wl}),"
        f" 'upper_warning_limit', ({wl}) + 10.0D,"
        f" 'lower_alarm_limit', -({wl}) - 10.0D,"
        f" 'upper_alarm_limit', ({wl}) + 20.0D,"
        f" 'lower_display_limit', -({wl}) - 20.0D,"
        f" 'upper_display_limit', ({wl}) + 30.0D,"
        f" 'lower_control_limit', -({wl}) - 20.0D,"
        f" 'upper_control_limit', ({wl}) + 30.0D"
        ") END AS meta",
        "CASE WHEN NOT (type IN ('disabled', 'disconnected'))"
        " THEN CAST(event_id % 4 AS INT) END AS severity",
        "CASE WHEN NOT (type IN ('disabled', 'disconnected'))"
        " THEN CAST((event_id % 4) * 6 AS INT) END AS status",
        "event_id",
    )
    return _dedup_by_channel(s)


_ENUM_LABELS_SQL = "list_value(" + ", ".join(f"'{x}'" for x in ENUM_LABELS) + ")"

#: DuckDB mirror of load_typed_samples(); prepend as `WITH typed_samples AS`.
TYPED_SAMPLES_CTE = f"""
typed_samples AS (
  SELECT channel, t, type, v, aval, eval, labels, asval, sval, meta,
         severity, status, event_id FROM (
    SELECT 'PV:' || CAST(user_id AS VARCHAR) AS channel,
           (epoch_ns(ts) // 1000) * 1000 AS t,
           CASE WHEN event_type = 'click' THEN 'scalar_double'
                WHEN event_type = 'view' THEN 'array_double'
                WHEN event_type = 'purchase' AND event_id % 2 = 0 THEN 'scalar_enum'
                WHEN event_type = 'purchase' THEN 'array_enum'
                WHEN event_type = 'signup' THEN 'array_string'
                WHEN event_id % 2 = 0 THEN 'disabled'
                ELSE 'disconnected' END AS type,
           CASE WHEN event_type = 'click' THEN value END AS v,
           CASE WHEN event_type = 'view' THEN list_value(
             CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DOUBLE),
             CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DOUBLE) * 2,
             CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DOUBLE) * 3)
                WHEN event_type = 'purchase' AND event_id % 2 = 1 THEN list_value(
             CAST(event_id % 4 AS DOUBLE),
             CAST((event_id + 1) % 4 AS DOUBLE)) END AS aval,
           CAST(CASE WHEN event_type = 'purchase' AND event_id % 2 = 0
                THEN event_id % 4 END AS INTEGER) AS eval,
           CASE WHEN event_type = 'purchase' THEN {_ENUM_LABELS_SQL} END AS labels,
           CASE WHEN event_type = 'signup' THEN list_value(
             'S' || CAST(event_id % 100 AS VARCHAR),
             'T' || CAST(user_id % 50 AS VARCHAR)) END AS asval,
           CAST(NULL AS VARCHAR) AS sval,
           CASE WHEN event_type IN ('click', 'view') THEN struct_pack(
             "precision" := CAST(event_id % 5 AS INTEGER),
             units := 'V' || CAST(user_id % 3 AS VARCHAR),
             lower_warning_limit := -CAST((user_id % 7) * 10 AS DOUBLE),
             upper_warning_limit := CAST((user_id % 7) * 10 AS DOUBLE) + 10.0,
             lower_alarm_limit := -CAST((user_id % 7) * 10 AS DOUBLE) - 10.0,
             upper_alarm_limit := CAST((user_id % 7) * 10 AS DOUBLE) + 20.0,
             lower_display_limit := -CAST((user_id % 7) * 10 AS DOUBLE) - 20.0,
             upper_display_limit := CAST((user_id % 7) * 10 AS DOUBLE) + 30.0,
             lower_control_limit := -CAST((user_id % 7) * 10 AS DOUBLE) - 20.0,
             upper_control_limit := CAST((user_id % 7) * 10 AS DOUBLE) + 30.0) END AS meta,
           CAST(CASE WHEN event_type IN ('click','view','purchase','signup')
                THEN event_id % 4 END AS INTEGER) AS severity,
           CAST(CASE WHEN event_type IN ('click','view','purchase','signup')
                THEN (event_id % 4) * 6 END AS INTEGER) AS status,
           event_id,
           row_number() OVER (PARTITION BY user_id, (epoch_ns(ts) // 1000) * 1000 ORDER BY event_id) AS _rn
    FROM events) WHERE _rn = 1
)
"""


MIXED_SAMPLES_CTE = """
mixed_samples AS (
  SELECT channel, t, type, v, sval, severity, status, event_id FROM (
    SELECT 'PV:' || CAST(user_id AS VARCHAR) AS channel,
           (epoch_ns(ts) // 1000) * 1000 AS t,
           CASE WHEN event_type IN ('click','view') THEN 'scalar_double'
                WHEN event_type = 'purchase' THEN 'scalar_long'
                WHEN event_type = 'signup' THEN 'scalar_string'
                ELSE 'disconnected' END AS type,
           CASE WHEN event_type = 'purchase' THEN CAST(floor(value) AS DOUBLE)
                WHEN event_type IN ('click','view') THEN value END AS v,
           CASE WHEN event_type = 'signup'
                THEN 'S' || CAST(event_id % 100 AS VARCHAR) END AS sval,
           CAST(CASE WHEN event_type IN ('click','view','purchase','signup')
                THEN event_id % 4 END AS INTEGER) AS severity,
           CAST(CASE WHEN event_type IN ('click','view','purchase','signup')
                THEN (event_id % 4) * 6 END AS INTEGER) AS status,
           event_id,
           row_number() OVER (PARTITION BY user_id, (epoch_ns(ts) // 1000) * 1000 ORDER BY event_id) AS _rn
    FROM events) WHERE _rn = 1
)
"""


# DuckDB-side mirror of load_samples(); prepend to oracle SQL as
# `WITH samples AS (...)`.  t truncates epoch_ns(ts) to the µs grid the
# Spark loaders use ((ts div 1000)*1000): under a TIMESTAMP(MICROS) file
# both forms are identical, and under a TIMESTAMP(NANOS) file (which
# DuckDB reads at full ns precision while Spark's loaders truncate) the
# truncation keeps the two engines' t values — and their dedup groups —
# in lockstep.  epoch_ns(ts) == unix_micros(ts)*1000 because the
# parquet timestamps are µs precision.
SAMPLES_CTE = """
samples AS (
  SELECT channel, t, v, severity, status, event_id FROM (
    SELECT 'PV:' || CAST(user_id AS VARCHAR) AS channel,
           (epoch_ns(ts) // 1000) * 1000 AS t,
           value AS v,
           CAST(CASE event_type WHEN 'error' THEN 2 WHEN 'signup' THEN 1 ELSE 0 END AS INTEGER) AS severity,
           CAST(6 * (CASE event_type WHEN 'error' THEN 2 WHEN 'signup' THEN 1 ELSE 0 END) AS INTEGER) AS status,
           event_id,
           row_number() OVER (PARTITION BY user_id, (epoch_ns(ts) // 1000) * 1000 ORDER BY event_id) AS _rn
    FROM events) WHERE _rn = 1
)
"""

STRING_SAMPLES_CTE = """
string_samples AS (
  SELECT channel, t, sval, event_id FROM (
    SELECT 'EVT:' || CAST(user_id AS VARCHAR) AS channel,
           (epoch_ns(ts) // 1000) * 1000 AS t,
           event_type AS sval,
           event_id,
           row_number() OVER (PARTITION BY user_id, (epoch_ns(ts) // 1000) * 1000 ORDER BY event_id) AS _rn
    FROM events) WHERE _rn = 1
)
"""
