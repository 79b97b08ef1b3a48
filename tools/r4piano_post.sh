#!/bin/bash
# Post-chain watcher: wait for the r4piano chain process to exit, then
# run the round-final bench on the (possibly newly promoted) model of
# record and COMMIT the JSON (the r4mixrec watcher saved to /root/runs,
# which a reset wipes — durability lesson applied).
#
# Launch:  setsid nohup bash /root/repo/tools/r4piano_post.sh <chain_pid> \
#            > /root/runs/r4piano_post.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1
. tools/chain_lib.sh

PID=${1:?usage: r4piano_post.sh <chain_pid>}
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
wait_tpu_free || exit 1

OUT=scores/bench/bench_r4piano_record.json
echo "== $(STAMP) chain exited; round-final bench on the model of record =="
if [ ! -s "$OUT" ]; then
  timeout 2400 python bench.py > "$OUT" 2>/root/runs/r4piano_bench.err \
    || { cat /root/runs/r4piano_bench.err; exit 1; }
fi
cat "$OUT"
git log --oneline -- "$OUT" | grep -q . || \
  commit_retry "Round-final bench JSON on the post-r4piano model of record" \
  "$OUT" || exit 1
echo "== $(STAMP) post watcher done =="
