"""Same-environment heavy-line re-baseline (r13 verdict ask #5).

BASELINE_LOCAL_r09.json anchors only the 13 round-1 queries — none of
the graph / ANN / triangle lines that dominate the bench total, so
their drift adjudications had no absolute same-environment bar (r13:
two solo re-measures stayed elevated with only prior-round numbers to
compare against). This tool extends the r9 protocol to those lines:
the heavy names are re-timed from a git worktree at the ROUND-12 HEAD
(8b2e052 — the era the r13 drift was measured against; all heavy names
exist there, unlike at the r1 snapshot, which predates every one of
them) INTERLEAVED with the current HEAD (A B A B), each side a fresh
``tools/solo_remeasure.py`` subprocess (fresh session, per-name min of
3 noop-sink runs), per-name minima across each side's subprocesses.

Usage: python tools/baseline_heavy.py [out_json]
Writes BASELINE_LOCAL_r14.json at the repo root by default. bench.py's
``_load_r1_bar`` merges it under the r09 file (r09 wins on overlap —
an older era is a longer drift window), using ``bar_sec`` = the
WORKTREE-era minimum, same convention as r09's ``r1_sec``.

The interleave doubles as the SCALE_NOTES §60 adjudication A/B for any
heavy name whose solo re-measure drifted: a clean normalized plan diff
(tools/plan_dump.py, both checkouts) plus overlapping interleaved
ranges here = environmental, not a regression.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R12_COMMIT = "8b2e052"  # round 12: end-of-round snapshot
WT = os.path.join(ROOT, ".worktrees", "r12")
ROUNDS = 2

HEAVY = [
    "parts_triangle_counts",
    "parts_triangle_estimate",
    "parts_triangle_estimate_p10",
    "parts_triangle_counts_auto",
    "parts_ktruss_affinity",
    "parts_kcore",
    "parts_copurchase_bfs_3hop",
    "embedding_knn_join_multiprobe_top3",
    "customer_entity_resolution",
    "events_value_drift_daily_ks",
    "jaccard_prefix_pairs",
    "multimodal_phash_near_dup_pairs",
]


def ensure_worktree() -> str:
    if not os.path.exists(os.path.join(WT, ".git")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", WT, R12_COMMIT],
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
    assert head.startswith(R12_COMMIT[:7]), head
    return head


def run_side(cwd: str, names: list[str]) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.join("tools", "solo_remeasure.py"), *names],
        cwd=cwd,
        check=True,
        capture_output=True,
        text=True,
        timeout=1800,
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    return {n: v["sf0.1"] for n, v in d["queries"].items()}


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(ROOT, "BASELINE_LOCAL_r14.json")
    )
    ensure_worktree()
    now_head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=ROOT,
        check=True,
        capture_output=True,
        text=True,
    ).stdout.strip()
    r12_runs, now_runs = [], []
    for i in range(ROUNDS):
        print(f"-- interleave {i + 1}/{ROUNDS}: r12 HEAD", flush=True)
        r12_runs.append(run_side(WT, HEAVY))
        print(f"-- interleave {i + 1}/{ROUNDS}: current HEAD", flush=True)
        now_runs.append(run_side(ROOT, HEAVY))

    def minima(runs: list[dict[str, float]]) -> dict[str, float]:
        out: dict[str, float] = {}
        for r in runs:
            for k, v in r.items():
                out[k] = min(out.get(k, float("inf")), v)
        return out

    def ranges(runs: list[dict[str, float]]) -> dict[str, list[float]]:
        out: dict[str, list[float]] = {}
        for r in runs:
            for k, v in r.items():
                out.setdefault(k, []).append(round(v, 4))
        return out

    r12_min, now_min = minima(r12_runs), minima(now_runs)
    overlap = sorted(set(r12_min) & set(now_min))
    queries = {
        k: {
            "bar_sec": round(r12_min[k], 4),
            "now_sec": round(now_min[k], 4),
            "ratio": round(now_min[k] / r12_min[k], 3),
            "bar_runs": ranges(r12_runs)[k],
            "now_runs": ranges(now_runs)[k],
        }
        for k in overlap
    }
    doc = {
        "bar_commit": R12_COMMIT,
        "now_commit": now_head,
        "sf": 0.1,
        "n_overlap": len(overlap),
        "bar_total_sec": round(sum(r12_min[k] for k in overlap), 3),
        "now_total_sec": round(sum(now_min[k] for k in overlap), 3),
        "total_ratio": round(
            sum(now_min[k] for k in overlap)
            / sum(r12_min[k] for k in overlap),
            3,
        ),
        "queries": queries,
        "methodology": (
            f"git worktree at {R12_COMMIT} and current HEAD, each side "
            f"a fresh tools/solo_remeasure.py subprocess (per-name min "
            f"of 3 noop-sink runs, cache cleared), interleaved A B "
            f"x{ROUNDS}; per-name minima per side; ratio = now/bar — "
            "same-day same-methodology absolutes for the heavy bench "
            "lines the r09 baseline predates. bench.py merges bar_sec "
            "into the >1.3x mover bar under BASELINE_LOCAL_r09 "
            "(r09 wins on overlap)."
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(json.dumps({k: v["ratio"] for k, v in queries.items()}))
    print(f"total ratio: {doc['total_ratio']} -> {out_path}")


if __name__ == "__main__":
    main()
