"""Online changepoint detection over the live sample stream.

The batch operator (`operators/stats.cusum_alarms`) is retrospective: it
judges every point against the series' own global mean. A LIVE detector
cannot know the future mean, so the streaming variant runs the classic
online CUSUM against a FIXED per-channel baseline (mu, mean absolute
deviation) learned batch-side from history — the standard two-phase
monitoring deployment (profile on the archive, detect on the stream).

Exactness: the recursion S := max(0, S + (vi - mu)) runs on scaled
integers (vi = floor(v*100+0.5), mu/mad pre-scaled the same way), the
alarm rule ``S > lam * mad`` is an integer comparison, and GroupState
carries the two accumulators across micro-batches — so a stream replay
of a batch fixture produces bit-identical alarms to a sequential batch
evaluation (pytest-pinned parity).

100 TB shape: state is two longs per channel (O(#channels) cluster-wide,
hash partitioned); the baseline attaches via a stream-static broadcast
join, so no per-record lookup leaves the executor.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cusum_baseline(samples: DataFrame) -> DataFrame:
    """Batch profile: per-channel scaled mean and mean absolute
    deviation, all floor-division integers (deterministic on any engine).

    Returns: channel, mu_scaled, mad_scaled.
    """
    vi = F.expr("CAST(floor(v * 100 + 0.5) AS BIGINT)")
    g = samples.select("channel", vi.alias("_vi")).groupBy("channel").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_vi").alias("_s")
    )
    mu = samples.select("channel", vi.alias("_vi")).join(
        g.select("channel", F.expr("_s div _n").alias("mu_scaled")), "channel"
    )
    return (
        mu.groupBy("channel", "mu_scaled")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.abs(F.col("_vi") - F.col("mu_scaled"))).alias("_a"),
        )
        .select(
            "channel",
            "mu_scaled",
            F.expr("greatest(_a div _n, 1)").alias("mad_scaled"),
        )
    )


#: alarm output: one row per alarm crossing
ALARM_SCHEMA = (
    "channel string, t long, side string, cusum_scaled long, "
    "threshold_scaled long"
)


def stream_cusum(
    stream: DataFrame,
    baseline: DataFrame,
    lam: int = 8,
    key: str = "channel",
    t: str = "t",
) -> DataFrame:
    """Online two-sided CUSUM over a streaming sample DataFrame.

    ``stream`` must carry (channel, t, v); ``baseline`` is
    :func:`cusum_baseline`'s output (attached with a stream-static
    broadcast join). Emits one row per alarm CROSSING (the cusum
    resets after an alarm, the textbook restart rule, so a sustained
    shift re-alarms only after re-accumulating evidence).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    enriched = stream.join(F.broadcast(baseline), key).select(
        key,
        t,
        F.expr("CAST(floor(v * 100 + 0.5) AS BIGINT)").alias("vi"),
        "mu_scaled",
        "mad_scaled",
    )

    def _fn(key_, pdf_iter, state: GroupState):
        s_pos, s_neg = state.get if state.exists else (0, 0)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(t)
            out = {c: [] for c in
                   ("channel", "t", "side", "cusum_scaled", "threshold_scaled")}
            for ti, vi, mu, mad in zip(
                pdf[t].to_numpy(), pdf["vi"].to_numpy(),
                pdf["mu_scaled"].to_numpy(), pdf["mad_scaled"].to_numpy(),
            ):
                thr = int(lam) * int(mad)
                d = int(vi) - int(mu)
                s_pos = max(0, s_pos + d)
                s_neg = max(0, s_neg - d)
                if s_pos > thr:
                    out["channel"].append(key_[0])
                    out["t"].append(int(ti))
                    out["side"].append("pos")
                    out["cusum_scaled"].append(s_pos)
                    out["threshold_scaled"].append(thr)
                    s_pos = 0
                if s_neg > thr:
                    out["channel"].append(key_[0])
                    out["t"].append(int(ti))
                    out["side"].append("neg")
                    out["cusum_scaled"].append(s_neg)
                    out["threshold_scaled"].append(thr)
                    s_neg = 0
            if out["t"]:
                yield pd.DataFrame(out)
        state.update((int(s_pos), int(s_neg)))

    return enriched.groupBy(key).applyInPandasWithState(
        _fn,
        ALARM_SCHEMA,
        "s_pos long, s_neg long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def batch_cusum_reference(
    rows: list[tuple[str, int, float]],
    baseline: dict[str, tuple[int, int]],
    lam: int = 8,
) -> list[tuple[str, int, str, int, int]]:
    """Sequential reference implementation (test parity oracle): the same
    recursion run row-at-a-time in plain Python."""
    out = []
    st: dict[str, list[int]] = {}
    by_ch: dict[str, list[tuple[int, float]]] = {}
    for ch, ti, v in rows:
        by_ch.setdefault(ch, []).append((ti, v))
    for ch, seq in by_ch.items():
        mu, mad = baseline[ch]
        thr = lam * mad
        s_pos = s_neg = 0
        for ti, v in sorted(seq):
            import math

            vi = int(math.floor(v * 100 + 0.5))
            d = vi - mu
            s_pos = max(0, s_pos + d)
            s_neg = max(0, s_neg - d)
            if s_pos > thr:
                out.append((ch, ti, "pos", s_pos, thr))
                s_pos = 0
            if s_neg > thr:
                out.append((ch, ti, "neg", s_neg, thr))
                s_neg = 0
    return sorted(out)
