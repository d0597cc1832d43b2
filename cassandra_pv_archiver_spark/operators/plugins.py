"""§2.10 extension SPI: third-party sample decimators.

The reference lets a control-system plugin supply its own decimation logic
through ``ControlSystemSupport.createSampleDecimator``
(`ControlSystemSupport.java:180-182`): the archiver owns interval
assignment and calls the plugin's ``SampleDecimator`` with every source
sample overlapping one interval (seed sample first, each with its validity
clipped to the interval — `SampleDecimator.java:40-76`), then collects one
decimated sample per interval.

Spark analog, same division of labor:

* **The engine owns the intervals.** :func:`decimate_with` runs the same
  hold-forward validity split every built-in decimation path uses
  (:func:`~.decimate.explode_validity_windows` — W1/W2, complete-window
  gating, gap fill), so a plugin can never disagree with the engine about
  interval semantics.
* **The plugin owns one interval's math.** It is a plain function
  ``pandas.DataFrame -> dict`` receiving one (channel, window) group's
  samples in processing order (sorted by ``clip``) with their clipped
  validity weights ``ws_ns`` — exactly the information the reference
  feeds ``processSample``. It returns the custom output fields; the
  engine stamps ``channel``/``t`` and enforces the declared schema.
* **Dispatch is data, not code.** Plugins self-register by name
  (:func:`register_decimator`); the engine looks them up at plan time —
  adding one requires zero engine edits, mirroring the reference's SPI
  discovery via ``ControlSystemSupportRegistry``.

Execution shape: one ``applyInPandas`` over ``groupBy(channel, win div
CHUNK)`` — a single hash shuffle on the same key clustering as the
built-in aggregation path, with ~CHUNK windows batched per Arrow crossing
(dispatching per-(channel, win) instead costs ~6 ms of Arrow/pandas
overhead PER INTERVAL — measured 30 s for 5.5k intervals — while the
chunked dispatch is bounded by the plugin's own per-interval cost). The
chunk key also bounds group memory and keeps a hot channel parallel
across tasks. This is a DECLARED Python crossing; plugins expressible as
Catalyst aggregates should use :func:`~.decimate.decimate` instead.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decimate import NS, explode_validity_windows


@dataclass(frozen=True)
class DecimatorPlugin:
    """A third-party per-interval decimator.

    ``fields``: DDL fragment of the OUTPUT fields the plugin produces
    (appended to ``channel string, t long``).
    ``fn``: called once per (channel, window) with the group's samples —
    columns include ``t v severity status clip ws_ns ws`` (plus any extra
    payload columns of the input), sorted by ``clip`` (processing order;
    the seed sample first, like the reference's decimator receiving the
    at-or-before sample before the in-interval ones). Returns a mapping
    of field name -> value matching ``fields``.
    """

    name: str
    fields: str
    fn: Callable[[pd.DataFrame], dict]


_REGISTRY: dict[str, DecimatorPlugin] = {}


def register_decimator(plugin: DecimatorPlugin) -> None:
    _REGISTRY[plugin.name] = plugin


def get_decimator(name: str) -> DecimatorPlugin:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"no decimator plugin {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def decimate_with(
    df: DataFrame,
    period_s: int,
    decimator: str | DecimatorPlugin,
    key: str = "channel",
    max_gap_windows: int | None = None,
) -> DataFrame:
    """Decimate with a registered plugin: engine-side interval assignment,
    plugin-side per-interval math. Output: ``channel, t, <plugin fields>``.
    """
    plugin = (
        decimator if isinstance(decimator, DecimatorPlugin)
        else get_decimator(decimator)
    )
    period_ns = period_s * NS
    d = explode_validity_windows(df, period_ns, key=key,
                                 max_gap_windows=max_gap_windows)
    out_schema = f"{key} string, t long, {plugin.fields}"
    fn = plugin.fn
    chunk = 1024  # windows per Arrow crossing (see module docstring)

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["win", "clip"], kind="mergesort")
        ch = pdf[key].iloc[0]
        rows = []
        for win, g in pdf.groupby("win", sort=True):
            row = dict(fn(g.reset_index(drop=True)))
            row[key] = ch
            row["t"] = int(win) * period_ns
            rows.append(row)
        return pd.DataFrame(rows)

    return d.groupBy(key, F.expr(f"win div {chunk}")).applyInPandas(
        _apply, schema=out_schema
    )


# --------------------------------------------------------------------------
# Example third-party plugin: time-weighted median.
# The reference ships averaging/pick-first decimators and tests them in
# `ChannelAccessSampleDecimatorTest.java`; a median decimator is the
# canonical "the built-ins don't do this" extension (robust to outlier
# spikes that drag a time-weighted mean). Deterministic: the reported
# median is the smallest sample value v such that samples with value <= v
# cover >= half the interval's covered time — attained (an input value,
# never an interpolation), so it has an exact SQL window-function oracle.
# --------------------------------------------------------------------------


def _median_fn(period_ns: int):
    def fn(g: pd.DataFrame) -> dict:
        s = g[["v", "ws_ns"]].dropna().sort_values("v", kind="mergesort")
        if len(s) == 0:
            return {"median": None, "covered_fraction": 0.0, "n_samples": 0}
        cum = s["ws_ns"].cumsum()
        total = int(s["ws_ns"].sum())
        return {
            "median": float(s["v"][cum * 2 >= total].iloc[0]),
            "covered_fraction": float(total) / float(period_ns),
            "n_samples": int(len(g)),
        }

    return fn


def make_median_plugin(period_s: int) -> DecimatorPlugin:
    """Median plugin bound to a period (needed for covered_fraction)."""
    return DecimatorPlugin(
        name="weighted_median",
        fields="median double, covered_fraction double, n_samples long",
        fn=_median_fn(period_s * NS),
    )


register_decimator(make_median_plugin(3600))
