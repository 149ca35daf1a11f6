#!/bin/bash
# Watch for the axon TPU to become reachable; when it is, run the round-3
# measurement battery (benchmarks/tpu_battery.py). Probe and battery each
# run in their own subprocess so a hung backend init never wedges the loop.
cd /root/repo || exit 1
LOG=/root/repo/benchmarks/tpu_watch.log
echo "=== watcher start $(date) ===" >> "$LOG"
while true; do
  echo "--- probe $(date) ---" >> "$LOG"
  if timeout 600 python benchmarks/tpu_probe.py >> "$LOG" 2>&1; then
    echo "=== TPU UP $(date); launching battery ===" >> "$LOG"
    python benchmarks/tpu_battery.py >> "$LOG" 2>&1
    echo "=== battery done rc=$? $(date) ===" >> "$LOG"
    break
  fi
  echo "probe failed/hung; sleeping 300s" >> "$LOG"
  sleep 300
done
