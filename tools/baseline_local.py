"""Same-environment bench re-baseline (r8 verdict ask #6).

The driver-recorded BENCH_r01.json absolutes were measured on a
different VM era; cross-round ratios against them drift with the
machine, not the code (two provably-minimal sub-second plans crossed
the 2x bar in r8 purely from VM variance). This tool removes the era
offset: it checks out round-1's HEAD into a git worktree and runs BOTH
bench harnesses INTERLEAVED in one session (A B A B), so each side sees
the same machine weather; per-query minima across each side's runs,
ratio = now / r1.

Usage: python tools/baseline_local.py [out_json]
Writes BASELINE_LOCAL_r09.json at the repo root by default.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R1_COMMIT = "13beeec"  # round 1: end-of-round snapshot
WT = os.path.join(ROOT, ".baseline_r1")
ROUNDS = 2


def ensure_worktree() -> str:
    if not os.path.isdir(os.path.join(WT, ".git")) and not os.path.isfile(
        os.path.join(WT, ".git")
    ):
        subprocess.run(
            ["git", "worktree", "add", "--detach", WT, R1_COMMIT],
            cwd=ROOT,
            check=True,
        )
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=WT,
        check=True,
        capture_output=True,
        text=True,
    ).stdout.strip()
    assert head.startswith(R1_COMMIT[:7]), head
    return head


def run_bench(cwd: str, script: str = "bench.py") -> dict:
    out = subprocess.run(
        [sys.executable, script],
        cwd=cwd,
        check=True,
        capture_output=True,
        text=True,
        timeout=900,
    ).stdout
    m = re.findall(r"\{.*\}", out)
    assert m, f"no JSON line from bench in {cwd}"
    return json.loads(m[-1])


def install_current_harness() -> str:
    """Copy the CURRENT bench harness into the r1 worktree, so both
    sides measure with the same methodology (noop sink that defeats
    count()-pruning, per-query min of two separated sweeps, cache
    clears). r1's own bench counted rows — Catalyst prunes unreferenced
    window/JSON work under count(), so projection-heavy queries looked
    ~2x faster than their materialized cost (fixed right after r1 in
    b2824db); harness parity is what makes per-query ratios honest.
    The registry API is compatible (REGISTRY[name].fn on both HEADs);
    queries missing from the r1 registry are skipped by the harness."""
    dst = os.path.join(WT, "bench_harness_current.py")
    with open(os.path.join(ROOT, "bench.py")) as src, open(dst, "w") as out:
        out.write(src.read())
    return "bench_harness_current.py"


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BASELINE_LOCAL_r09.json"
    )
    ensure_worktree()
    now_head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=ROOT,
        check=True,
        capture_output=True,
        text=True,
    ).stdout.strip()
    harness = install_current_harness()
    r1_runs, now_runs = [], []
    for i in range(ROUNDS):
        print(f"-- interleave round {i + 1}/{ROUNDS}: r1 HEAD", flush=True)
        r1_runs.append(run_bench(WT, harness))
        print(f"-- interleave round {i + 1}/{ROUNDS}: current HEAD", flush=True)
        now_runs.append(run_bench(ROOT))

    def minima(runs: list[dict]) -> dict[str, float]:
        out: dict[str, float] = {}
        for r in runs:
            for k, v in r["queries"].items():
                out[k] = min(out.get(k, float("inf")), v)
        return out

    r1_min, now_min = minima(r1_runs), minima(now_runs)
    overlap = sorted(set(r1_min) & set(now_min))
    queries = {
        k: {
            "r1_sec": round(r1_min[k], 4),
            "now_sec": round(now_min[k], 4),
            "ratio": round(now_min[k] / r1_min[k], 3),
        }
        for k in overlap
    }
    t_r1 = sum(r1_min[k] for k in overlap)
    t_now = sum(now_min[k] for k in overlap)
    doc = {
        "r1_commit": R1_COMMIT,
        "now_commit": now_head,
        "sf": now_runs[0].get("sf"),
        "n_overlap": len(overlap),
        "r1_total_sec": round(t_r1, 3),
        "now_total_sec": round(t_now, 3),
        "total_ratio": round(t_now / t_r1, 3),
        "queries": queries,
        "methodology": (
            f"git worktree at {R1_COMMIT} and current HEAD benched "
            f"interleaved (A B x{ROUNDS}) in one session, BOTH under "
            "the current harness (noop sink so count()-pruning cannot "
            "hide projection cost, min of two separated sweeps, cache "
            "clears); per-query minima per side; ratio = now/r1 — "
            "same-day, same-methodology numbers with no VM-era offset. "
            "The driver-recorded BENCH_r01.json bar remains for "
            "cross-round continuity; THIS file is the one the 2x "
            "criterion should be read against."
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(json.dumps({k: v["ratio"] for k, v in queries.items()}))
    print(f"total ratio: {doc['total_ratio']} -> {out_path}")


if __name__ == "__main__":
    main()
