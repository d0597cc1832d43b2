"""Regenerate every derived count/ledger from the actual registry and
driver records — counts are emitted, never typed (VERDICT r5 #7: a
hand-maintained count drifted twice; this kills the class).

Rewrites, idempotently:
  1. ``registry.py``'s ``_LAST_DRIVER_CHECKED`` — query -> latest round
     with a CORRECTNESS_r*.json row (drives the staleness rotation);
  2. README.md's registry-count sentence;
  3. COVERAGE.md's generated status line (marker-delimited).

``--check`` exits 1 if any file would change (round_gate wires this in
so a drifted count fails the gate instead of shipping) — with ONE
sanctioned exception: a ledger that matches the regeneration from all
CORRECTNESS records EXCEPT the single newest round is the expected
POST-GATE state, not drift (VERDICT r9 #3). The driver writes
CORRECTNESS_r{N}.json after the builder's final commit, so at judge
time the committed ledger always trails the newest artifact by exactly
that one round; only a mismatch against BOTH regenerations (e.g. a
hand-edited count, or a ledger two rounds behind) is a failure.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

COVERAGE_MARK = "<!-- generated-status -->"


def _rounds() -> list[int]:
    return sorted(
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )


def _ledger(exclude_round: int | None = None) -> tuple[dict[str, int], set[str]]:
    """-> (query -> latest attested round, queries RED in that round).

    A red row (any of rows/schema/hash false, or err) must rotate to
    the FRONT of the registry — its fix needs driver re-attestation
    next round, and plain staleness ordering would bury it for a full
    rotation cycle (the r07 -0.0 rows carried ledger=7).

    ``exclude_round`` drops that round's record — --check uses it to
    recognize the expected post-gate state (ledger regenerated before
    the newest CORRECTNESS artifact landed)."""
    ledger: dict[str, int] = {}
    red: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if rnd == exclude_round:
            continue
        for q, row in json.load(open(f)).items():
            if rnd >= ledger.get(q, 0):
                ledger[q] = rnd
                ok = (row.get("rows_match") and row.get("schema_match")
                      and row.get("hash_match", True)
                      and not row.get("err"))
                red.discard(q)
                if not ok:
                    red.add(q)
    return ledger, red


def _counts() -> tuple[int, int]:
    out = subprocess.run(
        [sys.executable, "-c",
         "from cassandra_pv_archiver_spark.registry import REGISTRY;"
         "print(len(REGISTRY),"
         " sum(1 for _, s in REGISTRY.values() if s is not None))"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    return int(out[0]), int(out[1])


def _render_ledger(reg: str, exclude_round: int | None = None) -> str:
    """registry.py text with both generated constants regenerated from
    the CORRECTNESS records (optionally excluding one round)."""
    ledger, red = _ledger(exclude_round)
    lines = ["_LAST_DRIVER_CHECKED = {"]
    for name in sorted(ledger):
        lines.append(f'    "{name}": {ledger[name]},')
    lines.append("}")
    new_reg = re.sub(
        r"_LAST_DRIVER_CHECKED = \{.*?\n\}", "\n".join(lines), reg,
        count=1, flags=re.S,
    )
    red_lines = ["_LATEST_DRIVER_RED = frozenset({"]
    for name in sorted(red):
        red_lines.append(f'    "{name}",')
    red_lines.append("})")
    return re.sub(
        r"_LATEST_DRIVER_RED = frozenset\(\{.*?\n\}\)",
        "\n".join(red_lines), new_reg, count=1, flags=re.S,
    )


def main() -> int:
    check = "--check" in sys.argv
    changed: list[str] = []

    reg_path = os.path.join(REPO, "cassandra_pv_archiver_spark/registry.py")
    reg = open(reg_path).read()
    new_reg = _render_ledger(reg)
    if new_reg != reg:
        rounds = _rounds()
        if check and rounds and reg == _render_ledger(reg, rounds[-1]):
            # expected post-gate state: the ONLY drift is the newest
            # CORRECTNESS artifact, which the driver writes after the
            # builder's final commit — not a failure (VERDICT r9 #3)
            print(
                f"ledger trails exactly one newer CORRECTNESS artifact "
                f"(r{rounds[-1]:02d}) — expected post-gate state, OK"
            )
        else:
            changed.append("registry.py ledger")
            if not check:
                open(reg_path, "w").write(new_reg)

    n, n_oracled = _counts()
    sentence = (
        f"Every one of the {n} registry queries carries an exact DuckDB"
        if n == n_oracled
        else f"{n_oracled} of the {n} registry queries carry an exact DuckDB"
    )
    readme_path = os.path.join(REPO, "README.md")
    readme = open(readme_path).read()
    new_readme = re.sub(
        r"(Every one of the|\d+ of the) \d+ registry queries carr(ies|y)"
        r" an exact DuckDB",
        sentence, readme, count=1,
    )
    if new_readme != readme:
        changed.append("README.md count")
        if not check:
            open(readme_path, "w").write(new_readme)

    cov_path = os.path.join(REPO, "COVERAGE.md")
    cov = open(cov_path).read()
    status = (
        f"{COVERAGE_MARK} Current status (generated by"
        f" tools/regen_ledger.py): **{n} registry queries, {n_oracled}"
        f" with DuckDB value-hash oracles"
        f" ({'zero' if n == n_oracled else n - n_oracled} rows-only)**."
    )
    if COVERAGE_MARK in cov:
        new_cov = re.sub(
            re.escape(COVERAGE_MARK) + r"[^\n]*", status, cov, count=1
        )
    else:
        head, rest = cov.split("\n\n", 1)
        new_cov = f"{head}\n\n{status}\n\n{rest}"
    if new_cov != cov:
        changed.append("COVERAGE.md status")
        if not check:
            open(cov_path, "w").write(new_cov)

    if changed:
        verb = "OUT OF DATE" if check else "regenerated"
        print(f"{verb}: {', '.join(changed)}")
        return 1 if check else 0
    print("all derived counts/ledgers up to date")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
