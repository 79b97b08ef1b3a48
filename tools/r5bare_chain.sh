#!/bin/bash
# r5bare: bare-serving robustness fine-tune (PERFORMANCE.md "r5bare" —
# design + gates PRE-DECLARED before any scoring ran).  One model that
# passes every gate at the bare serving defaults the r5clamp FAIL
# branch left us with: add a floor-free (`--noise 0`) corpus domain so
# the model itself learns the digitally-clean input class instead of
# leaning on a retired input crutch.
#
# Every stage is guarded/resumable; relaunch the SAME script after any
# interruption.  A wall-clock deadline guard refuses to start the
# trainer or the scoring stages too late to finish before the round-end
# bench needs the chip.
#
# Launch:  setsid nohup bash tools/r5bare_chain.sh \
#            > /root/runs/r5bare_chain.log 2>&1 < /dev/null &
set -x
set -o pipefail
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

DCLEAN=/root/runs/corpus400
DHARD=/root/runs/corpus200h
DPIANO=/root/runs/corpus400piano
DFULL=/root/runs/corpus300f
DNF=/root/runs/corpus200nf
DMIX=/root/runs/corpus_mix
DMIX5=/root/runs/corpus_mix_r5
DMIX5B=/root/runs/corpus_mix_r5b
R=/root/runs/r5bare
CFG=configs/synth16k_aug_r5.yaml
NPZ=checkpoints/music2midi_r5bare_avg4k.npz
REC=checkpoints/model_of_record.npz
# bare defaults are the code defaults now; explicit for auditability
BARE=(--dither 0 --mel_floor 0)
# refuse to START stages after these UTC hours (driver bench needs the
# chip free at round end ~07:00Z; trainer gets a 2.5 h timeout)
TRAIN_START_DEADLINE="2026-08-21T03:20"
SCORE_START_DEADLINE="2026-08-21T06:10"
EVAL_PREFIX="r5bare scores"
. tools/chain_lib.sh
mkdir -p /root/runs "$R"

past() { # past DEADLINE -> 0 if now >= deadline
  [ "$(date -u +%FT%H:%M | cut -c1-16)" \> "$1" ] || \
  [ "$(date -u +%FT%H:%M | cut -c1-16)" = "$1" ]
}

prep_corpus() { # prep_corpus DIR EXTRA_SYNTH_ARGS...
  local dir="$1"; shift
  [ -f "$dir/dataset_split.npz" ] && return 0
  python data/synthesize_corpus.py "$dir" "$@" || return 1
  python data/align_audio_midi.py "$dir" || return 1
  python data/midi_to_numpy.py "$dir" || return 1
  python data/compute_metrics.py "$dir" || return 1
  python data/generate_split.py "$dir" || return 1
}

echo "== $(STAMP) stage 0: nofloor corpus + training mix =="
prep_corpus "$DNF" --songs 200 --noise 0 --seed 7 || exit 1
if [ ! -f "$DMIX/dataset_split.npz" ]; then
  python tools/make_mix_corpus.py "$DCLEAN" "$DHARD" "$DMIX" \
    --prefix hard_ || exit 1
fi
if [ ! -f "$DMIX5/dataset_split.npz" ]; then
  python tools/make_mix_corpus.py "$DMIX" "$DFULL" "$DMIX5" \
    --prefix fm_ || exit 1
fi
if [ ! -f "$DMIX5B/dataset_split.npz" ]; then
  python tools/make_mix_corpus.py "$DMIX5" "$DNF" "$DMIX5B" \
    --prefix nf_ || exit 1
fi
[ -f "$R/init.npz" ] || cp "$REC" "$R/init.npz" || exit 1

wait_tpu_free || exit 1

echo "== $(STAMP) stage 1: bare zero-shot baselines =="
evalrun r5bare-zeroshot-npz-bf16-full300 "$DFULL" \
  --ckpt "$R/init.npz" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5bare-zeroshot-npz-bf16-nofloor200 "$DNF" \
  --ckpt "$R/init.npz" --dtype bfloat16 "${BARE[@]}" || exit 1

echo "== $(STAMP) stage 2: fine-tune to 4k steps =="
if [ ! -f "$R/.stage2_done" ]; then
  ok=
  for attempt in 1 2; do
    if past "$TRAIN_START_DEADLINE"; then
      echo "past TRAIN_START_DEADLINE — not starting the trainer"
      break
    fi
    resume=()
    ls "$R"/ckpt/step_* >/dev/null 2>&1 && resume=(--ckpt "$R/ckpt")
    [ ${#resume[@]} -eq 0 ] && resume=(--init_from "$R/init.npz")
    if timeout 9000 python train.py "$DMIX5B" --config "$CFG" \
        --name r5bare --out_dir /root/runs "${resume[@]}" \
        --max_steps 4000 --steps_per_dispatch 100; then
      ok=1; break
    fi
    echo "train attempt $attempt failed; resuming in 60s"; sleep 60
  done
  [ -n "$ok" ] || exit 1
  touch "$R/.stage2_done"
fi

echo "== $(STAMP) stage 3: average + export npz + COMMIT WEIGHTS =="
if ! git log --oneline -- "$NPZ" | grep -q .; then
  if [ ! -f "$NPZ" ]; then
    python tools/export_npz.py "$NPZ" "$R"/ckpt/step_* || exit 1
  fi
  commit_retry "r5bare: floor-free-domain fine-tune, 4k-step averaged export

Fine-tuned the model of record on the r5fullmix 3-domain mix plus
nf_160 — 160 clean-profile songs synthesized with --noise 0, true
digital silence, the exact input class every prior fine-tune fails
calibration on.  Averaged last-3 checkpoints, bf16 npz.  Pre-declared
design + gates in PERFORMANCE.md (r5bare)." \
    "$NPZ" || exit 1
fi

past "$SCORE_START_DEADLINE" && {
  echo "past SCORE_START_DEADLINE — stopping before scoring"; exit 0; }
wait_tpu_free || exit 1

echo "== $(STAMP) stage 4: test-split scores (bare, with CIs) =="
evalrun r5bare-npz-bf16-clean400 "$DCLEAN" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5bare-npz-bf16-hard200 "$DHARD" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5bare-npz-bf16-piano400 "$DPIANO" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5bare-npz-bf16-full300 "$DFULL" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
evalrun r5bare-npz-bf16-nofloor200 "$DNF" \
  --ckpt "$NPZ" --dtype bfloat16 "${BARE[@]}" || exit 1
for s in r5bare-zeroshot-npz-bf16-full300 r5bare-zeroshot-npz-bf16-nofloor200 \
         r5bare-npz-bf16-clean400 r5bare-npz-bf16-hard200 \
         r5bare-npz-bf16-piano400 r5bare-npz-bf16-full300 \
         r5bare-npz-bf16-nofloor200; do
  split_mean_ci "$s"
done | tee "$R/cis.txt"
python tools/realmix_check.py "$NPZ" | tee "$R/realmix_candidate.txt"
python tools/calibration_check.py "$NPZ" | tee "$R/calibration.txt"

echo "== $(STAMP) stage 5: promotion gate (pre-declared) =="
if [ ! -f "$R/.promoted" ] && [ ! -f "$R/.promotion_failed" ]; then
  if grep -q '^PASS' "$R/realmix_candidate.txt" && python - <<'EOF'
import csv

def mean(name):
    rows = list(csv.DictReader(open(f"scores/score-{name}.csv")))
    return sum(float(r["score"]) for r in rows) / len(rows)

zs = mean("r5bare-zeroshot-npz-bf16-full300")
full = mean("r5bare-npz-bf16-full300")
clean = mean("r5bare-npz-bf16-clean400")
hard = mean("r5bare-npz-bf16-hard200")
piano = mean("r5bare-npz-bf16-piano400")
print(f"fullmix bare zero-shot={zs:.4f} fine-tuned={full:.4f} "
      f"(delta {full - zs:+.4f}, gate >= +0.02)")
print(f"clean={clean:.4f} (>= 0.885)  hard={hard:.4f} (>= 0.80)  "
      f"piano={piano:.4f} (>= 0.8555)")
ok = (full >= zs + 0.02 and clean >= 0.885 and hard >= 0.80
      and piano >= 0.8555)
print("promotion gate:", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
EOF
  then
    promote_record "$NPZ" "Promote the r5bare fine-tune to model of record

One model across clean / hard-mix / piano-timbre / produced-track /
floor-free conditions, gated AT BARE SERVING DEFAULTS: calibration on
bare weights (mechanical), every pre-declared floor, the fullmix delta
vs a bare zero-shot baseline, and the realmix probe.  Gates, CIs and
evidence in the r5bare section of PERFORMANCE.md and
scores/score-r5bare-*." || exit 1
    touch "$R/.promoted"
  else
    echo "promotion gate FAILED — keeping the current record; see CSVs"
    touch "$R/.promotion_failed"
  fi
fi

echo "== $(STAMP) stage 6: fast calibration-gate re-check =="
timeout 1800 python -m pytest tests/test_calibration_gate.py -q 2>&1 | tail -2

echo "== $(STAMP) r5bare chain done =="
