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

import glob
import json
import os
import re
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

REGRESSION_FACTOR = 1.3
REGRESSION_FLOOR = 0.5  # seconds


def _current_round() -> int:
    """The round being built = 1 + the newest driver BENCH record."""
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    ]
    return (max(rounds) if rounds else 0) + 1


def _prior_details(cur: int) -> str | None:
    """The last RECORDED round's bench details (`bench_details_r{N}.json`),
    not merely the previous gate run — the r05->r07 `.prev` overwrite
    destroyed the midpoint of the prior chain (VERDICT r7 #6)."""
    best, best_round = None, -1
    for f in glob.glob(os.path.join(REPO, "bench_details_r*.json")):
        n = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if best_round < n < cur:
            best, best_round = f, n
    return best


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
        cur = _current_round()
        details = os.path.join(REPO, "bench_details.json")
        prior = _prior_details(cur)
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
            # dated sidecar: this round's record, for the NEXT round's prior
            shutil.copy(details, os.path.join(
                REPO, f"bench_details_r{cur:02d}.json"))
            if prior:
                print(f"  diff vs {os.path.basename(prior)}")
                rc2, out2 = run(
                    [
                        sys.executable,
                        os.path.join(HERE, "bench_compare.py"),
                        prior,
                        details,
                    ],
                    "bench_compare",
                )
                print(out2)
                # bench_compare output is advisory (box variance); the hard
                # gate is oracle + audit. Surface, don't fail.

    if "--sf1" in sys.argv:
        failures += sf1_sweep()

    print()
    if failures:
        print(f"ROUND GATE: {len(failures)} FAILURE(S)")
        for f in failures:
            print("-", f)
        return 1
    print("ROUND GATE: all green")
    return 0


SF1_DIR = "/tmp/pvspark-sf1"
SF1_QUERIES = [
    "decimate_1h", "decimate_cascade_6h", "union_levels",
    "planner_fallback", "materialize_minhash_pairs",
    "materialize_pq_index", "pq_adc_recall",
    # round-8 throughput ops (documents / events tables, both in the
    # sf1 slice)
    "bm25_topk", "purchase_window_rollup",
    # storage-sizing ops: linear per-channel window shape
    "ts_gorilla_size", "bucket_rollover_estimate",
    # containment/LSH family (VERDICT r8 #5): the banded-vs-exact cost
    # story that most needs a second decade of evidence, and the rows
    # whose suite-pass noise most needs the isolated-rerun protocol
    "containment_pairs_lsh", "containment_recall_audit",
    "substring_dup_spans",
    # VERDICT r9 #5: the two slowest index builds and the end-to-end
    # compositions get their decade-up receipt too (the sweep runs
    # sequentially inside the gate — the isolated protocol)
    "materialize_srp_pairs", "pca_top_component",
    "build_training_shard", "curate_corpus",
    # VERDICT r10 #6: the ANN SERVING path (not just the index builds)
    # gets its decade-up receipt — rerank + end-to-end IVF top-k
    "ivfpq_rerank_recall", "ann_kmeans_ivf_topk",
]
SF1_RECEIPT = ["decimate_1h", "union_levels", "raw_latest_n",
               "hard_negative_mining", "bm25_topk",
               "purchase_window_rollup", "ts_gorilla_size"]
SF1_MARK, SF1_END = "<!-- sf1-sweep -->", "<!-- /sf1-sweep -->"


def sf1_sweep() -> list[str]:
    """Decade-up sweep (VERDICT r7 #8): regenerate the 10x slice, sweep
    the headline families, value-check the receipt queries on it, and
    refresh PERF.md's marker-delimited sf1 block."""
    failures: list[str] = []
    print(f"[gate] sf1 slice -> {SF1_DIR} (gen_sf1.py)")
    rc, out = run(
        [sys.executable, os.path.join(HERE, "gen_sf1.py"), SF1_DIR],
        "gen_sf1",
    )
    if rc != 0:
        return [f"gen_sf1 failed:\n{out.strip().splitlines()[-3:]}"]

    print("[gate] sf1 correctness receipt (check_oracles @ sf1)")
    rc, out = run(
        [sys.executable, os.path.join(HERE, "check_oracles.py"), SF1_DIR]
        + SF1_RECEIPT,
        "oracles_sf1",
    )
    if rc != 0 or "0 failures" not in out:
        failures.append("sf1 oracle receipt:\n"
                        + "\n".join(out.strip().splitlines()[-5:]))

    print("[gate] sf1 perf sweep (perf_sweep --sf1)")
    rc, out = run(
        [sys.executable, os.path.join(HERE, "perf_sweep.py"),
         f"--sf1={SF1_DIR}"] + SF1_QUERIES,
        "perf_sweep_sf1",
    )
    table = [ln for ln in out.splitlines() if ln.startswith("|")]
    if rc != 0 or len(table) < 3:
        failures.append("perf_sweep --sf1 produced no table")
        return failures
    print("\n".join(table))

    perf_path = os.path.join(REPO, "PERF.md")
    perf = open(perf_path).read()
    cur = _current_round()
    block = (
        f"{SF1_MARK}\n"
        f"### sf1 sweep — regenerated by `round_gate --sf1` (round {cur})\n\n"
        + "\n".join(table) + f"\n{SF1_END}"
    )
    if SF1_MARK in perf:
        new_perf = re.sub(
            re.escape(SF1_MARK) + r".*?" + re.escape(SF1_END),
            block, perf, count=1, flags=re.S,
        )
    else:
        new_perf = perf.rstrip() + "\n\n" + block + "\n"
    if new_perf != perf:
        open(perf_path, "w").write(new_perf)
        print("  PERF.md sf1 block refreshed")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
