#!/bin/bash
# Post-chain watcher: wait for the r4mixrec chain process to exit, then
# immediately run the round-final bench on the (possibly newly promoted)
# model of record, so the chip never idles between jobs (CLAUDE.md:
# chain follow-up TPU work rides a detached watcher — background Bash
# tasks die with the driver session; this must be setsid/nohup'd).
#
# Launch:  setsid nohup bash /root/repo/tools/r4mixrec_post.sh <chain_pid> \
#            > /root/runs/r4mixrec_post.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1
. tools/chain_lib.sh

PID=${1:?usage: r4mixrec_post.sh <chain_pid>}
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
wait_tpu_free || exit 1

echo "== $(STAMP) chain exited; round-final bench on the model of record =="
if [ ! -s /root/runs/bench_r4mixrec.json ]; then
  timeout 2400 python bench.py \
    > /root/runs/bench_r4mixrec.json 2>/root/runs/bench_r4mixrec.err || exit 1
fi
cat /root/runs/bench_r4mixrec.json
echo "== $(STAMP) post watcher done =="
