"""Supervisor for TPU jobs behind the flaky axon tunnel.

The tunnel wedges a fresh client at init with some probability (blocked
forever in a futex waiting on the remote handshake; ~3 s CPU then
nothing).  A wedged client never recovers AND blocks other clients, so
the only cure is: detect the stall (no stdout growth and no CPU growth
over a window), kill the exact process group, back off, retry.

Usage: python benchmarks/tpu_supervise.py [--retries N] [--window S]
           [--timeout S] -- <cmd> [args...]
Child stdout/stderr stream to OUR stdout (line-buffered), so driver logs
stay live.  Exit code: the child's on success; 124 on timeout; 125 when
all retries wedge.
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _cpu_jiffies(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return int(parts[13]) + int(parts[14])
    except OSError:
        return -1


def run_once(cmd, window, timeout):
    t0 = time.time()
    proc = subprocess.Popen(
        cmd, stdout=sys.stdout, stderr=sys.stderr,
        start_new_session=True,
    )
    last_change = time.time()
    last_cpu = 0
    while True:
        rc = proc.poll()
        if rc is not None:
            return ("exit", rc)
        if time.time() - t0 > timeout:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            return ("timeout", 124)
        time.sleep(10)
        cpu = _cpu_jiffies(proc.pid)
        # RATE, not cumulative: a wedged axon client still ticks ~1 jiffy
        # per 10 s (tokio housekeeping), which would eventually cross any
        # cumulative threshold and reset the window forever.  Alive means
        # >= 5 jiffies (0.05 s CPU) in THIS 10 s poll; remote-compile
        # waits tick less, so the window must exceed the longest compile.
        if cpu - last_cpu >= 5:
            last_change = time.time()
        last_cpu = cpu
        if time.time() - last_change > window:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            return ("wedged", 125)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--retries", type=int, default=4)
    ap.add_argument("--window", type=float, default=300.0,
                    help="stall window (s): kill if no CPU growth")
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command")
    for attempt in range(1, args.retries + 1):
        print(f"[supervise] attempt {attempt}/{args.retries}: "
              f"{' '.join(cmd)}", flush=True)
        kind, rc = run_once(cmd, args.window, args.timeout)
        if kind == "exit":
            print(f"[supervise] child exited rc={rc}", flush=True)
            return rc
        print(f"[supervise] {kind}; killed process group, backing off",
              flush=True)
        time.sleep(20 * attempt)
    return 125


if __name__ == "__main__":
    sys.exit(main())
