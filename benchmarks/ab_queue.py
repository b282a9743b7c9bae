"""Serialized TPU job queue for the round-5 quality A/B campaign.

Runs quality_ab.py arms one at a time on the (exclusive-claim) TPU, with:
  - per-arm wall-clock budget sized with >=2x headroom INCLUDING eval
    (round-4 postmortem: two arms were lost to eval-stage OOM/timeout);
  - stall detection: if the arm's log file stops growing for STALL_S the
    process group is killed and the arm retried once (the remote compile
    tunnel stalls mid-run every few hours; retry-after-kill works);
  - incremental results via quality_ab.py's own resume logic (finished arms
    are skipped on retry).

Usage: python benchmarks/ab_queue.py  (intended to run via setsid nohup from
a frozen worktree so code edits in the main tree don't shift arm numerics).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
LOGDIR = os.path.join(HERE, "ab_logs")
# No log growth for 40 min => kill + retry. Sized ABOVE the cold-compile
# window (the full chunked NeuRAD train step compiles silently for many
# minutes through the remote tunnel) but below the arm budget; steps print
# every <=2 min once training starts.
STALL_S = 2400

# (arm, steps, seed, budget_seconds). Budgets ~2x the projected runtime at the
# worst observed ms/step (tunnel-degraded): default 320ms, fp32 400ms,
# prop-hashgrid 830ms, chunked/unpacked ~3x default, faithful ~2x prop-hashgrid.
QUEUE = [
    ("unpacked", 5000, 0, 3 * 5000 * 0.35 * 2 + 1800),       # ~3.2h cap
    ("prop-hashgrid-shared", 5000, 0, 5000 * 0.85 * 2 + 1200),
    ("prop-hashgrid-fp32", 5000, 0, 5000 * 1.0 * 2 + 1200),
    ("faithful", 5000, 0, 5000 * 1.7 * 2 + 1800),            # ~5.2h cap
    ("fp32", 5000, 1, 5000 * 0.45 * 2 + 900),
    ("prop-hashgrid", 5000, 1, 5000 * 0.85 * 2 + 1200),
    ("default", 5000, 2, 5000 * 0.35 * 2 + 900),
]


def run_once(arm: str, steps: int, seed: int, budget: float, attempt: int) -> str:
    log = os.path.join(LOGDIR, f"{arm}_s{seed}_a{attempt}.log")
    cmd = [
        sys.executable, os.path.join(HERE, "quality_ab.py"),
        "--steps", str(steps), "--seed", str(seed), "--arms", arm,
    ]
    with open(log, "w") as lf:
        proc = subprocess.Popen(
            cmd, stdout=lf, stderr=subprocess.STDOUT, cwd=ROOT,
            start_new_session=True,
            # APPEND to PYTHONPATH: /root/.axon_site on it registers the axon
            # TPU backend plugin — clobbering it kills the TPU claim
            env={**os.environ, "PYTHONPATH": ROOT + ":" + os.environ.get("PYTHONPATH", "")},
        )
    t0 = time.time()
    last_size, last_change = 0, time.time()
    while True:
        ret = proc.poll()
        if ret is not None:
            return "ok" if ret == 0 else f"exit={ret}"
        now = time.time()
        size = os.path.getsize(log) if os.path.exists(log) else 0
        if size != last_size:
            last_size, last_change = size, now
        if now - t0 > budget:
            os.killpg(proc.pid, signal.SIGKILL)
            return "budget"
        if now - last_change > STALL_S:
            os.killpg(proc.pid, signal.SIGKILL)
            return "stall"
        time.sleep(20)


def main():
    os.makedirs(LOGDIR, exist_ok=True)
    status_path = os.path.join(LOGDIR, "queue_status.log")
    for arm, steps, seed, budget in QUEUE:
        for attempt in (1, 2):
            with open(status_path, "a") as f:
                f.write(f"{time.strftime('%H:%M:%S')} START {arm} s{seed} attempt {attempt} (budget {budget/60:.0f}m)\n")
            result = run_once(arm, steps, seed, budget, attempt)
            with open(status_path, "a") as f:
                f.write(f"{time.strftime('%H:%M:%S')} END   {arm} s{seed} attempt {attempt}: {result}\n")
            if result == "ok":
                break
            time.sleep(30)  # let the tunnel claim clear before retrying
    with open(status_path, "a") as f:
        f.write(f"{time.strftime('%H:%M:%S')} QUEUE DONE\n")


if __name__ == "__main__":
    main()
