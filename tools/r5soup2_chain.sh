#!/bin/bash
# r5soup2: calibration-screened weight soup of (record, r5bare_avg4k) —
# design, selection rule and binding gate PRE-DECLARED in PERFORMANCE.md
# ("r5soup2") before any screening or scoring ran.
#
#   screen  f in {0.7, 0.6, 0.5, 0.4, 0.3}: bare calibration gate (CPU,
#           quality-blind); winner = LARGEST passing f
#   gate    ONE binding test gate of that single winner (same floors as
#           r5bare); PASS -> promote_record, FAIL -> archive
#
# Launch:  setsid nohup bash tools/r5soup2_chain.sh \
#            > /root/runs/r5soup2_chain.log 2>&1 < /dev/null &
set -x
set -o pipefail
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

DCLEAN=/root/runs/corpus400
DHARD=/root/runs/corpus200h
DPIANO=/root/runs/corpus400piano
DFULL=/root/runs/corpus300f
DNF=/root/runs/corpus200nf
R=/root/runs/r5soup2
REC=checkpoints/model_of_record.npz
CAND=checkpoints/music2midi_r5bare_avg4k.npz
BARE=(--dither 0 --mel_floor 0)
EVAL_PREFIX="r5soup2 scores"
. tools/chain_lib.sh
mkdir -p "$R"

echo "== $(STAMP) screen: bare calibration gate per soup fraction =="
WINNER=
for f in 0.7 0.6 0.5 0.4 0.3; do
  soup="$R/soup_f$f.npz"
  [ -f "$soup" ] || python tools/export_npz.py "$soup" "$REC" "$CAND" \
    --weights "$(python -c "print(1-$f)")" "$f" || exit 1
  if python tools/calibration_check.py "$soup" | tee -a "$R/screen.txt" \
      | grep -q '^PASS'; then
    WINNER=$f
    break  # fractions are tried largest-first; first PASS wins
  fi
done
if [ -z "$WINNER" ]; then
  echo "NO soup fraction passes bare calibration — negative result," \
       "record unchanged (pre-declared)"
  exit 0
fi
echo "winner fraction: $WINNER"
NPZ="checkpoints/music2midi_r5soup2_f$WINNER.npz"
[ -f "$NPZ" ] || cp "$R/soup_f$WINNER.npz" "$NPZ" || exit 1
git log --oneline -- "$NPZ" | grep -q . || commit_retry \
  "r5soup2: calibration-screened soup of record + r5bare (f=$WINNER)

Quality-blind mechanical selection per the pre-declared rule (largest
r5bare fraction that passes the bare serving calibration gate; screen
log in /root/runs/r5soup2/screen.txt). Test gate pending — committed
BEFORE scoring, like every candidate." "$NPZ" || exit 1

wait_tpu_free || exit 1

echo "== $(STAMP) binding test gate for f=$WINNER =="
evalrun r5soup2-npz-bf16-clean400 "$DCLEAN" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5soup2-npz-bf16-hard200 "$DHARD" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5soup2-npz-bf16-piano400 "$DPIANO" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5soup2-npz-bf16-full300 "$DFULL" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5soup2-npz-bf16-nofloor200 "$DNF" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
for s in r5soup2-npz-bf16-clean400 r5soup2-npz-bf16-hard200 \
         r5soup2-npz-bf16-piano400 r5soup2-npz-bf16-full300 \
         r5soup2-npz-bf16-nofloor200; do
  split_mean_ci "$s"
done | tee "$R/cis.txt"
python tools/realmix_check.py "$NPZ" | tee "$R/realmix.txt"

if [ ! -f "$R/.promoted" ] && [ ! -f "$R/.promotion_failed" ]; then
  if grep -q '^PASS' "$R/realmix.txt" && python - <<'EOF'
import csv

def mean(name):
    rows = list(csv.DictReader(open(f"scores/score-{name}.csv")))
    return sum(float(r["score"]) for r in rows) / len(rows)

clean = mean("r5soup2-npz-bf16-clean400")
hard = mean("r5soup2-npz-bf16-hard200")
piano = mean("r5soup2-npz-bf16-piano400")
full = mean("r5soup2-npz-bf16-full300")
print(f"clean={clean:.4f} (>= 0.885)  hard={hard:.4f} (>= 0.80)  "
      f"piano={piano:.4f} (>= 0.8555)  fullmix={full:.4f} (>= 0.6654)")
ok = (clean >= 0.885 and hard >= 0.80 and piano >= 0.8555
      and full >= 0.6654)
print("promotion gate:", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
EOF
  then
    promote_record "$NPZ" "Promote the r5soup2 soup to model of record

Calibration-screened soup of the r4soup record and the r5bare
floor-free fine-tune (largest r5bare fraction passing the bare
calibration gate — mechanical, quality-blind selection), then a single
binding test gate at bare serving defaults: every floor, the fullmix
level, and the realmix probe. Gates, CIs and evidence in the r5soup2
section of PERFORMANCE.md and scores/score-r5soup2-*." || exit 1
    touch "$R/.promoted"
  else
    echo "promotion gate FAILED — archive, record unchanged (pre-declared)"
    touch "$R/.promotion_failed"
  fi
fi
echo "== $(STAMP) r5soup2 chain done =="
