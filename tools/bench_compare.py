"""Diff two bench_details.json files (or a details file vs a BENCH_r{N}.json
record): per-query deltas, sorted by regression size, with the box's
documented run-to-run variance in mind (PERF.md "Bench variance": compare
isolated warm re-runs before believing any single-run delta).

Usage:
    python tools/bench_compare.py OLD.json NEW.json [threshold_sec]

Accepts either a bench_details.json ({"queries": {...}}) or a driver
BENCH_r{N}.json whose "tail" string contains the per-query dict.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items() if k != "sf"}
    if "tail" in d:  # truncated driver record: scrape what survived
        return {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"([a-z0-9_]+)": ([0-9.]+)', d["tail"])
            if m.group(1) != "sf"
        }
    raise SystemExit(f"{path}: neither a details file nor a driver record")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
    common = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    print(f"common {len(common)} queries: {t_old:.1f}s -> {t_new:.1f}s "
          f"({(t_new - t_old) / t_old * 100:+.1f}%)")
    deltas = sorted(((new[k] - old[k], k) for k in common), reverse=True)
    for d, k in deltas:
        if abs(d) >= thr:
            print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({d:+.2f})")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new queries:", ", ".join(f"{k}={new[k]:.2f}s" for k in only_new))


if __name__ == "__main__":
    main()
