"""Summarize quality_ab_results.json into the PERFORMANCE.md table: per arm,
mean +/- spread over seeds at the longest completed schedule, plus a one-line
verdict per TPU-default deviation vs the reference-faithful numerics.

Usage: python benchmarks/quality_ab_report.py [--steps 5000]
"""

import argparse
import json
import os
from collections import defaultdict

import numpy as np

COLS = ["psnr", "ssim", "lpips", "depth_median_l2", "intensity_rmse", "chamfer_distance"]
HIGHER = {"psnr", "ssim"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument(
        "--path", default=os.path.join(os.path.dirname(__file__), "quality_ab_results.json")
    )
    args = ap.parse_args()
    rows = [r for r in json.load(open(args.path)) if r["steps"] == args.steps]
    by_arm = defaultdict(list)
    for r in rows:
        by_arm[r["arm"]].append(r)

    print(f"## Quality A/B at {args.steps} steps (synthetic dynamic scene)\n")
    hdr = ["arm", "seeds"] + COLS + ["ms/step"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    stats = {}
    for arm, rs in by_arm.items():
        cells = [arm, str(len(rs))]
        stats[arm] = {}
        for c in COLS:
            vals = np.array([r[c] for r in rs], float)
            stats[arm][c] = vals
            cells.append(f"{vals.mean():.4f}±{vals.std():.4f}" if len(vals) > 1 else f"{vals.mean():.4f}")
        cells.append(f"{np.mean([r['ms_per_step'] for r in rs]):.0f}")
        print("| " + " | ".join(cells) + " |")

    def verdict(arm, base="default"):
        if arm not in stats or base not in stats:
            return f"- {arm}: (incomplete)"
        trails = []
        for c in COLS:
            a, b = stats[arm][c].mean(), stats[base][c].mean()
            # positive = DEFAULT better than the deviation arm
            adv = (b - a) if c in HIGHER else (a - b)
            if adv / (abs(a) + 1e-9) < -0.05:
                trails.append(f"{c} {b:.4f} (default) vs {a:.4f} ({arm})")
        return f"- default vs {arm}: " + (
            "default within 5% or better on every metric"
            if not trails
            else "default trails on: " + "; ".join(trails)
        )

    print("\n### Verdicts (default = TPU-first architecture)\n")
    for arm in (
        "prop-hashgrid", "prop-hashgrid-shared", "prop-hashgrid-fp32",
        "mlp-big", "unpacked", "fp32", "faithful",
    ):
        print(verdict(arm))


if __name__ == "__main__":
    main()
