"""Generic serialized TPU job runner with stall watchdog (round-5 stage 2).

Like ab_queue.py but takes (name, argv, budget_s, attempts) jobs from a JSON
file, so the night's remaining TPU schedule (full training runs, perf
windows, leftover A/B arms) runs unattended: one job at a time (the TPU claim
is exclusive), log-growth stall detection sized above the cold-compile
window, kill-by-process-group + retry on stall/budget.

Usage: python benchmarks/tpu_queue.py jobs.json
  jobs.json: [{"name": ..., "argv": [...], "budget_s": N, "attempts": 2,
               "cwd": optional}, ...]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
STALL_S = 2400


def run_once(job, attempt: int, logdir: str) -> str:
    log = os.path.join(logdir, f"{job['name']}_a{attempt}.log")
    with open(log, "w") as lf:
        proc = subprocess.Popen(
            job["argv"], stdout=lf, stderr=subprocess.STDOUT,
            cwd=job.get("cwd", ROOT), start_new_session=True,
            env={**os.environ, "PYTHONPATH": job.get("cwd", ROOT) + ":" + os.environ.get("PYTHONPATH", "")},
        )
    t0 = time.time()
    last_size, last_change = 0, time.time()
    last_loop = time.time()
    while True:
        ret = proc.poll()
        if ret is not None:
            return "ok" if ret == 0 else f"exit={ret}"
        now = time.time()
        if now - last_loop > 120:
            # the runner itself was SIGSTOPped (bench.py pauses the whole
            # queue tree during its timing window) — the job made no log
            # progress through no fault of its own; hold both clocks
            last_change = now
            t0 += now - last_loop
        last_loop = now
        size = os.path.getsize(log) if os.path.exists(log) else 0
        if size != last_size:
            last_size, last_change = size, now
        if now - t0 > job["budget_s"]:
            os.killpg(proc.pid, signal.SIGKILL)
            return "budget"
        if now - last_change > job.get("stall_s", STALL_S):
            os.killpg(proc.pid, signal.SIGKILL)
            return "stall"
        time.sleep(20)


def main():
    jobs = json.load(open(sys.argv[1]))
    logdir = os.path.join(HERE, "tpu_queue_logs")
    os.makedirs(logdir, exist_ok=True)
    status = os.path.join(logdir, "status.log")
    prev_ok = False
    for job in jobs:
        if job.get("skip_if_prev_ok") and prev_ok:
            with open(status, "a") as f:
                f.write(f"{time.strftime('%H:%M:%S')} SKIP  {job['name']} (previous ok)\n")
            continue
        result = None
        for attempt in range(1, job.get("attempts", 2) + 1):
            with open(status, "a") as f:
                f.write(f"{time.strftime('%H:%M:%S')} START {job['name']} a{attempt} (budget {job['budget_s']/60:.0f}m)\n")
            result = run_once(job, attempt, logdir)
            with open(status, "a") as f:
                f.write(f"{time.strftime('%H:%M:%S')} END   {job['name']} a{attempt}: {result}\n")
            if result == "ok":
                break
            time.sleep(30)
        prev_ok = result == "ok"
    with open(status, "a") as f:
        f.write(f"{time.strftime('%H:%M:%S')} QUEUE DONE\n")


if __name__ == "__main__":
    main()
