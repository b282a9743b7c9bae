"""Merge quality-A/B results from the frozen .ab_worktree into the main
repo's benchmarks/quality_ab_results.json (dedup by arm/steps/seed/sched;
worktree entries win on conflict since they're the freshest runs)."""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
MAIN = os.path.join(HERE, "quality_ab_results.json")
WT = os.path.join(os.path.dirname(HERE), ".ab_worktree", "benchmarks", "quality_ab_results.json")


def key(r):
    return (r["arm"], r["steps"], r["seed"], r.get("sched", "prod"))


def main():
    main_rows = json.load(open(MAIN)) if os.path.exists(MAIN) else []
    wt_rows = json.load(open(WT)) if os.path.exists(WT) else []
    merged = {key(r): r for r in main_rows}
    added = 0
    for r in wt_rows:
        if key(r) not in merged or merged[key(r)] != r:
            merged[key(r)] = r
            added += 1
    out = list(merged.values())
    with open(MAIN, "w") as f:
        json.dump(out, f, indent=1)
    print(f"merged: {len(out)} rows ({added} new/updated from worktree)")


if __name__ == "__main__":
    main()
