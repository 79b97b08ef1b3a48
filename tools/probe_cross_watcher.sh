#!/bin/bash
# Waits for a running chain (PID $1) to exit, then runs the v2
# cross-attention kernel probe on the freed TPU (VERDICT r4 item 8).
# Launch:  setsid nohup bash tools/probe_cross_watcher.sh <chain_pid> \
#            > /root/runs/probe_cross_watcher.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1
CHAIN_PID=${1:?usage: probe_cross_watcher.sh <chain_pid>}
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
sleep 120  # let the chain's last TPU process release its lease
timeout 3600 python tools/probe_cross_kernel.py 2>&1 \
  | tee /root/runs/probe_cross.log
echo "probe done rc=$?"
