"""Decimation-level selection + retention-fallback planning.

Reference (`Api10Controller.java:382-518`):

  * ``count`` absent -> raw level 0, limit modes (AT_OR_BEFORE, AT_OR_AFTER).
  * ``count`` present -> ``perfectPeriod = (end-start)/count/1e9`` seconds;
    candidates are the floor/ceiling available levels around it; the shorter
    one is preferred unless the longer one deviates < 5 % AND less than the
    shorter one does.
  * If the chosen level's data does not reach back to ``start``, iterate
    coarser levels; each one only serves the range before the earliest
    sample found so far (exclusive upper bound ``earliest - 1``, both limit
    modes AT_OR_BEFORE), prepended in time order — operator U1.

Spark architecture: this is *plan construction*, not data flow — a thin
driver-side layer (the reference's is too: it runs per-request on one
channel's metadata). The per-level "earliest available sample" probes are
single-row ``min(t)`` aggregations over pruned scans — the same metadata
queries the reference issues against its bucket index. The data path that
comes out is a ``unionByName`` of disjoint range scans, fully declarative,
so Catalyst sees one plan and prunes each branch independently.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import asof

NS = 1_000_000_000


def select_decimation_level(
    levels, start_ns: int, end_ns: int, count: int | None
) -> int:
    """Pick the decimation period (seconds) serving a sampled query.

    Mirrors `Api10Controller.java:396-442` exactly, including the 5 %
    longer-period preference rule. ``levels`` must contain 0 (raw).
    """
    lv = sorted(set(int(x) for x in levels))
    if 0 not in lv:
        raise ValueError("level 0 (raw) must exist")
    if count is None:
        return 0
    if count <= 0:
        raise ValueError(f"count must be positive, got {count}")
    perfect = (end_ns - start_ns) / count / 1e9
    perfect_floor = min(int(perfect), 2**31 - 1) if perfect >= 0 else 0
    longer = next((x for x in lv if x >= perfect_floor), None)
    shorter = max((x for x in lv if x <= perfect_floor), default=0)
    if longer is None:
        return shorter
    if longer == shorter:
        return shorter
    # deviations relative to the *double* perfect period (`:431-440`)
    longer_match = longer / perfect - 1.0
    shorter_match = -(shorter / perfect - 1.0)
    if longer_match < 0.05 and longer_match < shorter_match:
        return longer
    return shorter


def plan_samples(
    levels: Mapping[int, DataFrame],
    start_ns: int,
    end_ns: int,
    count: int | None = None,
    key: str = "channel",
) -> DataFrame:
    """Build the (possibly multi-level) sample query plan for one channel
    series per key.

    ``levels`` maps decimation period seconds -> that level's DataFrame
    (columns must be aligned across levels; include a ``level`` column if
    callers need provenance). Returns the ordered concatenation of disjoint
    per-level range queries per `Api10Controller.java:443-518`.
    """
    best = select_decimation_level(levels.keys(), start_ns, end_ns, count)
    usable = [p for p in sorted(levels) if p >= best]
    pieces: list[DataFrame] = []  # oldest-range first
    earliest: int | None = None
    for period in usable:
        df = levels[period]
        if not pieces:
            cand = asof.get_samples(
                df, start_ns, end_ns, asof.AT_OR_BEFORE, asof.AT_OR_AFTER, key=key
            )
        else:
            # upper mode AT_OR_BEFORE = plain capped range (no forward probe)
            cand = asof.get_samples(
                df,
                start_ns,
                earliest - 1,
                asof.AT_OR_BEFORE,
                asof.AT_OR_BEFORE,
                key=key,
            )
        first_row = cand.agg(F.min("t").alias("t")).first()
        first = first_row.t if first_row is not None else None
        if first is None:
            continue
        if not pieces or first < earliest:
            pieces.insert(0, cand)
            earliest = first
        if first <= start_ns:
            break
    if not pieces:
        # empty plan with the right schema
        some = next(iter(levels.values()))
        return some.limit(0)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy(key, "t")
