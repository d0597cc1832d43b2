"""One-command round gate: the full verification ritual that caught
every round-4 defect early, wired so it cannot be partially skipped
(VERDICT r4 "Next round" #10).

Runs, in order (sequentially — this box cannot run two Spark+DuckDB
sweeps concurrently, see README):

  1. `check_oracles.py` at sf0.001, sf0.01, sf0.1 — every registry
     query vs its DuckDB oracle, value-hash-strict;
  2. `explain_audit.py` — plan-shape rules (no cartesian/SMJ where
     forbidden, pushed filters, exchange budgets);
  3. `bench.py` at sf0.1, diffed against the previous
     `bench_details.json` via `bench_compare.py` (regressions >=
     REGRESSION_FACTOR x and >= REGRESSION_FLOOR s are listed; the
     box's warm-run variance means a listed regression is a prompt to
     re-run isolated, not yet a verdict).

Exit code 0 = every gate green. Usage:

    python tools/round_gate.py             # full ritual
    python tools/round_gate.py --fast      # sf0.01 oracles + audit only
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

REGRESSION_FACTOR = 1.3
REGRESSION_FLOOR = 0.5  # seconds


def run(cmd: list[str], log_name: str) -> tuple[int, str]:
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True
    )
    out = proc.stdout + proc.stderr
    print(f"  -> exit {proc.returncode} in {time.time() - t0:.0f}s")
    return proc.returncode, out


def main() -> int:
    fast = "--fast" in sys.argv
    failures: list[str] = []

    print("[gate] derived counts/ledger (regen_ledger --check)")
    rc, out = run(
        [sys.executable, os.path.join(HERE, "regen_ledger.py"), "--check"],
        "regen_ledger",
    )
    if rc != 0:
        failures.append(
            "derived counts out of date — run tools/regen_ledger.py:\n"
            + out.strip()
        )

    sf_dirs = (
        ["/root/testdata/sf0.01"]
        if fast
        else [
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ]
    )
    for sf in sf_dirs:
        print(f"[gate] oracles @ {sf}")
        rc, out = run(
            [sys.executable, os.path.join(HERE, "check_oracles.py"), sf],
            f"oracles_{os.path.basename(sf)}",
        )
        tail = "\n".join(out.strip().splitlines()[-3:])
        if rc != 0 or "0 failures" not in out:
            failures.append(f"oracles @ {sf}:\n{tail}")
            print(tail)

    print("[gate] explain audit")
    rc, out = run(
        [sys.executable, os.path.join(HERE, "explain_audit.py")], "audit"
    )
    if rc != 0 or "0 failures" not in out:
        failures.append("explain_audit:\n" + "\n".join(
            ln for ln in out.splitlines() if "FAIL" in ln
        ))

    if not fast:
        prev = os.path.join(REPO, "bench_details.json")
        prev_copy = None
        if os.path.exists(prev):
            prev_copy = prev + ".prev"
            shutil.copy(prev, prev_copy)
        print("[gate] bench @ sf0.1")
        rc, out = run([sys.executable, os.path.join(REPO, "bench.py")], "bench")
        line = next(
            (ln for ln in out.splitlines() if ln.startswith('{"metric"')), None
        )
        if rc != 0 or line is None:
            failures.append("bench.py produced no JSON line")
        else:
            rec = json.loads(line)
            n = rec.get("n_queries", len(rec["queries"]))
            print(f"  {rec['value']}s total, {n} queries")
            if prev_copy:
                rc2, out2 = run(
                    [
                        sys.executable,
                        os.path.join(HERE, "bench_compare.py"),
                        prev_copy,
                        prev,
                    ],
                    "bench_compare",
                )
                reg = [
                    ln
                    for ln in out2.splitlines()
                    if "x" in ln and ln.strip().startswith("+")
                ]
                print(out2)
                # bench_compare output is advisory (box variance); the hard
                # gate is oracle + audit. Surface, don't fail.

    print()
    if failures:
        print(f"ROUND GATE: {len(failures)} FAILURE(S)")
        for f in failures:
            print("-", f)
        return 1
    print("ROUND GATE: all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
