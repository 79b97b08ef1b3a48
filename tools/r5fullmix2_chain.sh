#!/bin/bash
# r5fullmix2: the pre-declared re-gate of the r5fullmix candidate under
# the post-r5clamp serving configuration (PERFORMANCE.md "r5fullmix
# Results" — declared BEFORE any scoring here ran).
#
# Trigger condition: the r5clamp chain completed with a PASS verdict and
# flipped the serving defaults (/root/runs/r5clamp/.flipped).  Then this
# chain re-runs the EXACT r5fullmix promotion gate on the SAME committed
# candidate npz with --mel_floor 0.003 --dither 0, floors UNCHANGED,
# zero-shot baseline re-scored under the same configuration.  One rerun,
# both directions binding: FAIL archives the candidate for good; PASS
# promotes it (promote_record, mechanical calibration gate included).
#
# Launch:  setsid nohup bash tools/r5fullmix2_chain.sh <r5clamp_pid> \
#            > /root/runs/r5fullmix2_chain.log 2>&1 < /dev/null &
set -x
set -o pipefail
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

WAIT_PID=${1:-}
R=/root/runs/r5fullmix2
RC=/root/runs/r5clamp
DCLEAN=/root/runs/corpus400
DHARD=/root/runs/corpus200h
DPIANO=/root/runs/corpus400piano
DFULL=/root/runs/corpus300f
CAND=checkpoints/music2midi_r5fullmix_avg4k.npz
REC=checkpoints/model_of_record.npz
NORM=(--mel_floor 0.003 --dither 0)
EVAL_PREFIX="r5fullmix2 scores"
. tools/chain_lib.sh
mkdir -p "$R"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
if [ ! -f "$RC/.flipped" ]; then
  echo "r5clamp did not PASS+flip — per the pre-declaration there is no" \
       "re-gate; the r5fullmix negative result is final"
  exit 0
fi
sleep 120
wait_tpu_free || exit 1

echo "== $(STAMP) re-gate scoring (clamp ON, dither OFF) =="
evalrun r5fullmix2-zeroshot-npz-bf16-full300 "$DFULL" \
  --ckpt "$REC" --dtype bfloat16 "${NORM[@]}" || exit 1
evalrun r5fullmix2-npz-bf16-full300 "$DFULL" \
  --ckpt "$CAND" --dtype bfloat16 "${NORM[@]}" || exit 1
evalrun r5fullmix2-npz-bf16-clean400 "$DCLEAN" \
  --ckpt "$CAND" --dtype bfloat16 "${NORM[@]}" || exit 1
evalrun r5fullmix2-npz-bf16-hard200 "$DHARD" \
  --ckpt "$CAND" --dtype bfloat16 "${NORM[@]}" || exit 1
evalrun r5fullmix2-npz-bf16-piano400 "$DPIANO" \
  --ckpt "$CAND" --dtype bfloat16 "${NORM[@]}" || exit 1
for s in r5fullmix2-zeroshot-npz-bf16-full300 r5fullmix2-npz-bf16-full300 \
         r5fullmix2-npz-bf16-clean400 r5fullmix2-npz-bf16-hard200 \
         r5fullmix2-npz-bf16-piano400; do
  split_mean_ci "$s"
done | tee "$R/cis.txt"
python tools/realmix_check.py "$CAND" | tee "$R/realmix.txt"

echo "== $(STAMP) promotion re-gate (floors unchanged) =="
if [ ! -f "$R/.promoted" ] && [ ! -f "$R/.archived" ]; then
  if grep -q '^PASS' "$R/realmix.txt" && python - <<'EOF'
import csv

def mean(name):
    rows = list(csv.DictReader(open(f"scores/score-{name}.csv")))
    return sum(float(r["score"]) for r in rows) / len(rows)

zs = mean("r5fullmix2-zeroshot-npz-bf16-full300")
full = mean("r5fullmix2-npz-bf16-full300")
clean = mean("r5fullmix2-npz-bf16-clean400")
hard = mean("r5fullmix2-npz-bf16-hard200")
piano = mean("r5fullmix2-npz-bf16-piano400")
print(f"fullmix zero-shot={zs:.4f} fine-tuned={full:.4f} "
      f"(delta {full - zs:+.4f}, gate >= +0.02)")
print(f"clean={clean:.4f} (>= 0.885)  hard={hard:.4f} (>= 0.80)  "
      f"piano={piano:.4f} (>= 0.8555)")
ok = (full >= zs + 0.02 and clean >= 0.885 and hard >= 0.80
      and piano >= 0.8555)
print("re-gate:", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
EOF
  then
    promote_record "$CAND" "Promote the r5fullmix fine-tune to model of record (r5fullmix2 re-gate)

The pre-declared re-gate of the unchanged r5fullmix candidate under the
post-r5clamp serving configuration (mel floor ON, dither OFF — the
configuration actually served): every floor cleared, fullmix delta
gated, realmix probe at overlap>=1 with the first overlap=2 artifact.
First gate run (dither-handicapped) FAILED piano by 0.0001 and was
honored as FAIL; this rerun was declared before any of its scoring ran
(PERFORMANCE.md r5fullmix Results). Evidence: scores/score-r5fullmix2-*,
/root/runs/r5fullmix2/cis.txt." || exit 1
    touch "$R/.promoted"
  else
    echo "re-gate FAILED — candidate archived for good (pre-declared)"
    touch "$R/.archived"
  fi
fi
echo "== $(STAMP) r5fullmix2 chain done =="
