#!/bin/bash
# r5clamp step 3+4: quality-delta scoring of the per-bin mel noise floor
# and — on a PASS verdict — the serving-default flip (dither OFF, clamp
# ON).  Design and gates PRE-DECLARED in PERFORMANCE.md (r5clamp); the
# dither's own step 3 failed its neutrality bar, this is the named
# alternative under the SAME protocol.
#
# Waits for $1 (the r5fullmix chain / probe watcher PID) before touching
# the TPU — never two TPU holders (CLAUDE.md).
#
# Launch:  setsid nohup bash tools/r5clamp_chain.sh <wait_pid> \
#            > /root/runs/r5clamp_chain.log 2>&1 < /dev/null &
set -x
set -o pipefail  # the verdict python's exit code rides through tee
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

WAIT_PID=${1:-}
R=/root/runs/r5clamp
DCLEAN=/root/runs/corpus400
DHARD=/root/runs/corpus200h
DPIANO=/root/runs/corpus400piano
REC=checkpoints/model_of_record.npz
EVAL_PREFIX="r5clamp scores"
. tools/chain_lib.sh
mkdir -p "$R"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
sleep 120  # let the previous TPU holder's lease expire
wait_tpu_free || exit 1

echo "== $(STAMP) step 3: quality delta (clamp ON, dither OFF) =="
# NOTE: the record may have been promoted to the r5fullmix winner by the
# time this runs — that is CORRECT: the verdict must hold for the model
# actually being served.  The paired baseline is the same model's
# committed clamp-off/dither-off scores; if the record changed, rescore
# the baseline first (guarded below by CSV existence).
if ! cmp -s "$REC" checkpoints/music2midi_r4soup.npz; then
  # record changed since the r4soup no-dither CSVs — build fresh paired
  # baselines at the CURRENT defaults-off configuration
  evalrun r5clamp-base-npz-bf16-clean400 "$DCLEAN" \
    --ckpt "$REC" --dtype bfloat16 --dither 0 || exit 1
  evalrun r5clamp-base-npz-bf16-hard200 "$DHARD" \
    --ckpt "$REC" --dtype bfloat16 --dither 0 || exit 1
  evalrun r5clamp-base-npz-bf16-piano400 "$DPIANO" \
    --ckpt "$REC" --dtype bfloat16 --dither 0 || exit 1
  BASE=r5clamp-base-npz-bf16
else
  BASE=r4soup-npz-bf16
fi
evalrun r5clamp-npz-bf16-clean400 "$DCLEAN" \
  --ckpt "$REC" --dtype bfloat16 --dither 0 --mel_floor 0.003 || exit 1
evalrun r5clamp-npz-bf16-hard200 "$DHARD" \
  --ckpt "$REC" --dtype bfloat16 --dither 0 --mel_floor 0.003 || exit 1
evalrun r5clamp-npz-bf16-piano400 "$DPIANO" \
  --ckpt "$REC" --dtype bfloat16 --dither 0 --mel_floor 0.003 || exit 1

echo "== $(STAMP) verdict (pre-declared bar: CI contains 0 or |mean| < 0.005 on every split) =="
for s in clean400 hard200 piano400; do
  python tools/score_summary.py "scores/score-$BASE-$s.csv" \
    "scores/score-r5clamp-npz-bf16-$s.csv"
done | tee "$R/deltas.txt"
python - "$R/deltas.txt" <<'EOF' | tee "$R/verdict.txt"
import re
import sys

text = open(sys.argv[1]).read()
ok = True
for m in re.finditer(
    r"per-song delta .*?: mean=([-+0-9.]+) ci95=\[([-+0-9.]+), "
    r"([-+0-9.]+)\]", text,
):
    mean, lo, hi = map(float, m.groups())
    split_ok = (lo <= 0.0 <= hi) or abs(mean) < 0.005
    print(f"delta mean={mean:+.4f} ci=[{lo:+.4f},{hi:+.4f}] "
          f"{'ok' if split_ok else 'FAIL'}")
    ok &= split_ok
print("r5clamp neutrality:", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
EOF
VERDICT=$?

if [ "$VERDICT" -eq 0 ] && [ ! -f "$R/.flipped" ]; then
  echo "== $(STAMP) step 4: default flip (clamp ON, dither OFF) =="
  # the flip is a pre-written, reviewed patch (defaults + test re-pins)
  git apply --check tools/r5clamp_flip.patch || exit 1
  git apply tools/r5clamp_flip.patch || exit 1
  python tools/calibration_check.py checkpoints/model_of_record.npz \
    checkpoints/music2midi_r4soup.npz \
    checkpoints/music2midi_r4mix_avg4k.npz \
    checkpoints/music2midi_r4hard_avg16k.npz \
    checkpoints/music2midi_r4s400_avg24k.npz | tee "$R/gate_newdefaults.txt"
  grep -q FAIL "$R/gate_newdefaults.txt" && exit 1
  timeout 2400 python -m pytest tests/test_mel_floor.py \
    tests/test_input_dither.py tests/test_calibration_gate.py -q \
    2>&1 | tail -3 | tee "$R/tests.txt"
  grep -qE "failed|error" "$R/tests.txt" && exit 1
  commit_retry "Flip serving noise-floor defaults: mel clamp ON, dither OFF

r5clamp step 3 PASSED its pre-declared neutrality bar (paired per-song
deltas with bootstrap CIs in /root/runs/r5clamp/deltas.txt, CSVs in
scores/score-r5clamp-*). The per-bin mel floor closes the r4
noise-floor OOD class on every checkpoint (step-2 gate) while leaving
above-floor audio bit-unchanged — the dither's measured -0.007/-0.022
split cost retired it as a default (PERFORMANCE.md r5dither step 3 /
r5clamp)." \
    music2midi_tpu/infer/pipeline.py \
    tests/test_input_dither.py tests/test_mel_floor.py || exit 1
  touch "$R/.flipped"
else
  echo "verdict FAIL or already flipped — defaults unchanged"
fi
echo "== $(STAMP) r5clamp chain done =="
