"""T4: min/max update-period limiting (rate limit + heartbeat re-emit).

Reference (`LimitingSampleWriterDelegate.java:20-105`, options
`ConfigurationOptions.java:78,80`):

  * ``minUpdatePeriod`` — a sample is written only if at least the period
    elapsed since the last *written* sample; faster arrivals are dropped
    (the last received sample is remembered so a later heartbeat can emit
    it).
  * ``maxUpdatePeriod`` — if nothing was written for the period, the last
    received sample is re-written with a fresh timestamp (heartbeat).

The min-period filter is inherently sequential per channel (whether a row
is kept depends on which earlier rows were kept), so it is implemented with
``applyInPandas`` — Arrow-batched, one group per channel, the ONE place in
the archiver core where Python touches rows (SURVEY.md §2.10 allows
exactly this for stateful decimator-style logic). Everything stays
distributed: groups are processed in parallel across executors.

The heartbeat is NOT sequential (re-emission points are a pure function of
each sample's validity gap) and is expressed with ``sequence``/``explode``
— JVM-side, whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NS = 1_000_000_000


def min_update_period(
    df: DataFrame, min_period_s: float, key: str = "channel", t: str = "t"
) -> DataFrame:
    """Greedy per-channel rate limit: keep a row iff ``t - t_last_kept >=
    min_period`` (first row always kept). Matches the reference's
    clock-time check applied to sample time on a replayable series."""
    min_ns = int(min_period_s * NS)
    schema = df.schema

    def _filter(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t)
        ts = pdf[t].to_numpy()
        keep = [False] * len(ts)
        last = None
        for i, ti in enumerate(ts):
            if last is None or ti - last >= min_ns:
                keep[i] = True
                last = ti
        return pdf[pd.Series(keep, index=pdf.index)]

    return df.groupBy(key).applyInPandas(_filter, schema=schema)


def min_update_period_stream(
    df: DataFrame, min_period_s: float, key: str = "channel", t: str = "t"
) -> DataFrame:
    """Streaming-native T4 rate limit: the same greedy per-channel filter
    as :func:`min_update_period`, but over an unbounded stream — the
    last-*kept* timestamp is held in ``GroupState`` so the decision
    carries across micro-batches (the Spark analog of the reference's
    per-channel ``LimitingSampleWriterDelegate`` instance state,
    `LimitingSampleWriterDelegate.java:20-105`).

    ``df`` must be a streaming DataFrame. Out-of-order arrivals across
    micro-batches are dropped by the same monotonicity rule the archiver
    applies at write time (F5), since the kept-watermark only advances.
    State is one long per channel — O(#channels) cluster-wide, hash
    partitioned, no skew concern.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    min_ns = int(min_period_s * NS)
    out_schema = df.schema

    def _fn(key_, pdf_iter, state: GroupState):
        last = state.get[0] if state.exists else None
        # the group arrives as MULTIPLE Arrow chunks in shuffle order for
        # large micro-batches (> arrow maxRecordsPerBatch rows): sorting
        # each chunk independently would run the greedy filter out of
        # time order and keep/drop the wrong rows — concatenate the whole
        # group first (state stays one long; the batch buffer is the same
        # memory the batch operator needs)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(t)
            keep = []
            for ti in pdf[t].to_numpy():
                if last is None or ti - last >= min_ns:
                    keep.append(True)
                    last = int(ti)
                else:
                    keep.append(False)
            out = pdf[pd.Series(keep, index=pdf.index)]
            if len(out):
                yield out
        if last is not None:
            state.update((int(last),))

    return df.groupBy(key).applyInPandasWithState(
        _fn,
        out_schema,
        "last_kept long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def max_update_period_stream(
    stream: DataFrame,
    max_period_s: int,
    key: str = "channel",
    t: str = "t",
    markers: DataFrame | None = None,
) -> DataFrame:
    """Streaming-native T4+T5 fused heartbeat (VERDICT r10 #4): the
    connection-aware re-emission contract of :func:`max_update_period`
    with ``markers``, over unbounded streams — per-channel ``GroupState``
    holds the last sample (payload included) and the buffered
    disconnect times ahead of it, the Spark analog of the reference's
    per-channel delegate state (`LimitingSampleWriterDelegate.java:
    20-105` composed with `ControlSystemSupport.java:208-258`).

    ``markers`` is a STREAMING ``(key, t, type)`` DataFrame (e.g. from
    :func:`.markers.disconnect_markers_stream` or a replayed T5 table);
    it is unioned into the sample stream so each channel's walk sees
    samples and disconnects in one event-time order.

    Emission is deliberately **sample-closure driven** (no
    processing-time or watermark timeouts): heartbeats for the gap
    after sample ``s`` are emitted only when the NEXT SAMPLE of that
    channel arrives — beats at ``s.t + k*period`` up to the closing
    sample, clipped to the first disconnect marker seen inside the gap.
    A marker alone emits nothing (it only records the clip point), and
    a sample still awaiting its successor emits nothing — both exactly
    the batch operator's rules (its gap needs a ``lead(t)`` to exist at
    all; the final sample's validity end is unknown). That is what
    makes the operator REPLAY-DETERMINISTIC: the output is a pure
    function of the per-channel event sequence, independent of
    micro-batch pacing, watermark progress, or restarts, so a replay
    equals the batch ``max_update_period(df, markers=...)`` on the same
    data bit-for-bit (pinned by test + the
    ``heartbeat_stream_connected_1h`` oracle row).

    Monotonic contract (F5, as everywhere in the archiver): per channel,
    a SAMPLE at ``t <= last seen sample t`` is dropped. Markers may
    arrive ahead of the samples they will eventually clip (the union
    of two individually-ordered streams can deliver the marker stream
    early under micro-batch pacing skew): future markers are BUFFERED
    in state and applied when their gap closes, so marker-leading skew
    never changes the output. The converse — a marker for a gap whose
    closing sample was already processed — cannot be honored in append
    mode (the beats are emitted); the marker stream must not LAG a
    channel's sample stream past a gap boundary. A marker at or before
    the last sample's t is ignored, matching the batch operator's
    strictly-inside-the-gap condition.

    Payloads ride through the walk as one nullable STRUCT column with
    every child transported AS A STRING (round-11 review): the marker
    union nulls payload values, and pyspark's Arrow->pandas conversion
    of null-carrying children upcasts int64 to lossy float64 (silently
    rounding past 2^53) and conflates a genuine NaN double with NULL —
    both verified empirically. Spark's numeric->string casts are
    shortest-round-trip, so parsing them back (``int``/``float``)
    restores the exact value, NaN / Infinity / -0.0 included, while
    NULL stays the struct-level None; the walk emits via object-dtype
    pandas columns so the output conversion cannot re-upcast either.
    Payload columns must be ATOMIC types (string/numeric/boolean) —
    anything else raises loudly at construction.

    State is O(#channels) cluster-wide: one long + the buffered marker
    times + one payload row each, hash-partitioned by key — no skew
    concern at the 100k-channel envelope."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    max_ns = max_period_s * NS
    payload = [c for c in stream.columns if c not in (key, t)]
    ptypes = dict(stream.dtypes)
    _atomic = {
        "string", "double", "float", "int", "bigint", "smallint",
        "tinyint", "boolean",
    }
    bad = [c for c in payload if ptypes[c] not in _atomic]
    if bad:
        raise NotImplementedError(
            "max_update_period_stream payload columns must be atomic "
            f"(string/numeric/boolean); got {bad[0]}: {ptypes[bad[0]]}"
        )
    struct_t = "struct<" + ",".join(f"{c}:string" for c in payload) + ">"
    if payload:
        src = stream.select(
            F.col(key), F.col(t),
            F.struct(
                *[F.col(c).cast("string").alias(c) for c in payload]
            ).alias("_p"),
            F.lit(False).alias("_marker"),
        )
    else:  # bare (key, t) stream: no payload struct at all
        src = stream.select(
            F.col(key), F.col(t),
            F.lit(None).cast("struct<dummy:int>").alias("_p"),
            F.lit(False).alias("_marker"),
        )
        struct_t = "struct<dummy:int>"
    if markers is not None:
        m = markers.filter(F.col("type") == "disconnected").select(
            F.col(key),
            F.col(t),
            F.lit(None).cast(struct_t).alias("_p"),
            F.lit(True).alias("_marker"),
        )
        src = src.unionByName(m)
    out_schema = f"{key} {ptypes[key]}, {t} long" + "".join(
        f", {c} {ptypes[c]}" for c in payload
    ) + ", heartbeat boolean"
    state_schema = (
        f"last_t long, pending array<bigint>, payload {struct_t}"
    )

    _int_cols = {
        c for c in payload
        if ptypes[c] in ("int", "bigint", "smallint", "tinyint")
    }
    _float_cols = {c for c in payload if ptypes[c] in ("double", "float")}
    _bool_cols = {c for c in payload if ptypes[c] == "boolean"}

    def _py(v):
        return v.item() if hasattr(v, "item") else v

    def _parse(c, v):
        # string wire transport back to the declared type (docstring).
        # float() of Spark's shortest-round-trip cast restores the
        # exact double, including NaN / Infinity / -0.0 — NULL stays
        # None (the struct null), so NaN-vs-NULL survives too.
        if v is None:
            return None
        if c in _int_cols:
            return int(v)
        if c in _float_cols:
            return float(v)
        if c in _bool_cols:
            return v == "true"
        return _py(v)

    def _fn(key_, pdf_iter, state):
        # pvals stays in WIRE format (ints as strings) end-to-end —
        # matching both the state struct's schema and the input struct;
        # _parse converts at each emission
        if state.exists:
            st = state.get
            last = st[0]
            pending = sorted(st[1] or [])
            prow = st[2]  # Row | None, wire format
            pvals = None if prow is None else list(prow)
        else:
            last, pending, pvals = None, [], None
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            return
        # whole group first, then ONE time-ordered walk: chunk-local
        # sorting would run the greedy state machine out of order (the
        # min_update_period_stream lesson). Marker-vs-sample order at
        # EQUAL t is provably irrelevant here (a marker at a sample's
        # own t never clips anything), but sort on (t, _marker) anyway
        # so replays are byte-stable.
        pdf = pd.concat(chunks).sort_values([t, "_marker"])
        ts_arr = pdf[t].to_numpy()
        is_m = pdf["_marker"].to_numpy()
        pay_col = pdf["_p"].tolist()  # dict | None per row, exact values
        out = {c: [] for c in (key, t, *payload, "heartbeat")}

        import bisect

        for i in range(len(ts_arr)):
            ti = int(ts_arr[i])
            if is_m[i]:
                # markers strictly after the last sample are candidates
                # to clip the open OR a future gap (marker-leading skew
                # across the two streams) — buffer, apply at closure
                if last is None or ti > last:
                    bisect.insort(pending, ti)
            else:
                if last is None or ti > last:
                    if last is not None:
                        # first buffered marker strictly inside the gap
                        # clips it; the batch bound (no beat ON the
                        # closing event): k = 1 .. (upper-1-last) div p
                        clip = next(
                            (p for p in pending if p < ti), None
                        )
                        upper = ti if clip is None else clip
                        for k in range(
                            1, int((upper - 1 - last) // max_ns) + 1
                        ):
                            out[key].append(key_[0])
                            out[t].append(last + k * max_ns)
                            for c, v in zip(payload, pvals):
                                out[c].append(_parse(c, v))
                            out["heartbeat"].append(True)
                    # markers at or before this sample cannot affect any
                    # future gap (strictly-inside needs > ti)
                    pending = [p for p in pending if p > ti]
                    last = ti
                    row = pay_col[i]
                    pvals = (
                        [_py(row[c]) for c in payload] if payload else []
                    )
                    out[key].append(key_[0])
                    out[t].append(ti)
                    for c, v in zip(payload, pvals):
                        out[c].append(_parse(c, v))
                    out["heartbeat"].append(False)
                # else: out-of-order duplicate — dropped (F5)
        if out[t]:
            import numpy as np

            odf = pd.DataFrame({key: out[key], t: out[t]})
            for c in payload:
                vals = out[c]
                mask = np.array([v is None for v in vals], dtype=bool)
                if c in _float_cols:
                    # hand-built masked array: the mask carries NULL,
                    # the data may carry a GENUINE NaN — the only
                    # pandas shape pyspark's pandas->Arrow conversion
                    # (nan_as_null) cannot conflate. A plain float64
                    # ndarray or object column loses NaN to NULL;
                    # pd.array(..., dtype='Float64') coerces nan to NA
                    # at construction.
                    data = np.array(
                        [0.0 if v is None else v for v in vals],
                        dtype="float64",
                    )
                    odf[c] = pd.arrays.FloatingArray(data, mask)
                elif c in _int_cols:
                    data = np.array(
                        [0 if v is None else v for v in vals],
                        dtype="int64",
                    )
                    odf[c] = pd.arrays.IntegerArray(data, mask)
                elif c in _bool_cols:
                    data = np.array(
                        [False if v is None else v for v in vals],
                        dtype=bool,
                    )
                    odf[c] = pd.arrays.BooleanArray(data, mask)
                else:
                    odf[c] = pd.Series(vals, dtype=object)
            odf["heartbeat"] = out["heartbeat"]
            yield odf
        if last is not None or pending:
            # pending alone matters too: a marker can precede its
            # channel's first sample by whole micro-batches
            state.update(
                (
                    None if last is None else int(last),
                    [int(p) for p in pending],
                    # bare (key, t) streams carry a 1-field dummy
                    # struct: store None, never an empty tuple
                    None
                    if (pvals is None or not payload)
                    else tuple(pvals),
                )
            )

    return src.groupBy(key).applyInPandasWithState(
        _fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def max_update_period(
    df: DataFrame,
    max_period_s: int,
    key: str = "channel",
    t: str = "t",
    markers: DataFrame | None = None,
) -> DataFrame:
    """Heartbeat: for each hold-forward validity gap longer than
    ``max_period``, re-emit the sample at ``t + k*max_period`` for
    ``k = 1..`` until the next sample (re-emitted rows flagged
    ``heartbeat = true``, carrying the original payload with the fresh
    timestamp, cf. `updateSampleTimeStamp`).

    The final sample of each channel emits no heartbeats (its validity end
    is unknown) — matching the reference, which only re-emits while the
    channel stays connected and silent up to 'now'.

    ``markers`` (optional, round-10 review): the T5 disconnect-marker
    table ``(key, t, type)`` from :mod:`.markers`. The reference only
    re-emits while the channel STAYS CONNECTED — an interior outage gets
    a 'disconnected' marker, not fabricated heartbeats asserting the
    stale payload persisted through the outage. When given, a gap whose
    originating sample is followed by a disconnect marker before the
    next sample emits heartbeats only UP TO the marker. Without
    ``markers`` every archived gap heartbeats (the connection-agnostic
    batch semantics the heartbeat_1h oracle pins)."""
    max_ns = max_period_s * NS
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(t)
    payload = [c for c in df.columns if c != key and c != t]
    d = df.withColumn("_tn", F.lead(t).over(w)).filter(
        F.col("_tn").isNotNull()
    )
    if markers is not None:
        # first disconnect marker strictly inside (t, _tn): heartbeats
        # stop there. Broadcast range join — the marker table is
        # O(#outages), tiny next to the sample table.
        m = (
            markers.filter(F.col("type") == "disconnected")
            .select(F.col(key).alias("_mk"), F.col(t).alias("_mt"))
        )
        # aggregate the stop per (key, t) on a payload-free projection:
        # grouping on payload doubles would normalize -0.0 to 0.0 in the
        # group keys (the bit-exactness pitfall class)
        stops = (
            d.select(key, t, "_tn")
            .join(
                F.broadcast(m),
                (F.col(key) == F.col("_mk"))
                & (F.col("_mt") > F.col(t))
                & (F.col("_mt") < F.col("_tn")),
                "inner",
            )
            .groupBy(key, t)
            .agg(F.min("_mt").alias("_stop"))
        )
        d = (
            d.join(F.broadcast(stops), [key, t], "left")
            .withColumn("_tn", F.coalesce(F.col("_stop"), F.col("_tn")))
            .drop("_stop")
        )
    d = (
        d.withColumn("_n", F.expr(f"CAST(((_tn - 1 - {t}) div {max_ns}) AS INT)"))
        .filter(F.col("_n") >= 1)  # sequence(1,0) would count DOWN in Spark
        .withColumn("_kk", F.explode(F.expr("sequence(1, _n)")))
    )
    beats = d.select(
        F.col(key),
        (F.col(t) + F.col("_kk") * F.lit(max_ns)).alias(t),
        *[F.col(c) for c in payload],
        F.lit(True).alias("heartbeat"),
    )
    originals = df.select(
        F.col(key), F.col(t), *[F.col(c) for c in payload],
        F.lit(False).alias("heartbeat"),
    )
    return originals.unionByName(beats)
