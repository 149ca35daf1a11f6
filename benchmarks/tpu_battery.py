"""One-shot TPU measurement battery for when the axon chip is reachable.

The round-2/3 axon outages showed chip uptime can be scarce: this script
converts a window of chip availability into every pending round-4 artifact
with no operator latency.  Each step runs in its OWN subprocess with a hard
timeout (a hung remote compile cannot take down the battery, and a failed
backend init in one step does not poison the next), in priority order:

1. bench    — the headline bench.py JSON (what the driver captures)
2. meshgrad — the fixed differentiable-mesh tier (round4_timings)
3. mesh     — packet-engine tiers, fp32 + bf16 leaf precision
4. spectral — spectral engines incl. the bunny-scale row + Cornell
5. profile  — in-kernel work counters + VPU dtype microbench
6. adaptive — tol sweep x scenes with equal-time error columns
7. config5  — 1920x1080 spp256 chunked+CHECKPOINTED scale artifact

A step's stdout/stderr tails and outcome append to
``benchmarks/battery_log_r4.md``.  Usage:

    python benchmarks/tpu_battery.py [--only step[,step...]] [--skip ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "benchmarks", "battery_log_r4.md")

STEPS = [
    ("bench", [sys.executable, "bench.py"], 2400),
    ("meshgrad", [sys.executable, "benchmarks/round4_timings.py",
                  "--tier", "meshgrad"], 2400),
    ("mesh", [sys.executable, "benchmarks/round4_timings.py",
              "--tier", "mesh"], 2400),
    ("spectral", [sys.executable, "benchmarks/round4_timings.py",
                  "--tier", "spectral"], 2400),
    ("profile", [sys.executable, "benchmarks/packet_profile.py"], 2400),
    ("adaptive", [sys.executable, "benchmarks/round4_timings.py",
                  "--tier", "adaptive"], 3600),
    ("config5", [sys.executable, "benchmarks/config5.py", "--mode", "tpu",
                 "--checkpoint",
                 "--out", os.path.join(ROOT, "SCALING_r04.json")], 3600),
]


def log(text):
    with open(LOG, "a") as f:
        f.write(text + "\n")
    print(text, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))

    log(f"\n## battery run {time.strftime('%Y-%m-%d %H:%M:%S')}")
    for name, cmd, tmo in STEPS:
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        log(f"\n### {name}: `{' '.join(cmd[1:])}` (timeout {tmo}s)")
        try:
            out = subprocess.run(
                cmd, cwd=ROOT, capture_output=True, text=True, timeout=tmo)
            dt = time.time() - t0
            tail = lambda s: "\n".join((s or "").strip().splitlines()[-25:])
            log(f"rc={out.returncode} in {dt:.0f}s\n"
                f"```\n{tail(out.stdout)}\n--- stderr ---\n"
                f"{tail(out.stderr)}\n```")
        except subprocess.TimeoutExpired:
            log(f"TIMED OUT after {tmo}s")


if __name__ == "__main__":
    main()
