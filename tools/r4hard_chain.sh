#!/bin/bash
# r4hard chain: the hard-corpus quality loop (VERDICT r3 #6 — stop
# scoring a clean-tone best case).  200 songs synthesized with
# --profile hard (vocal-like lead, off-score drums, reverb, pink noise,
# dynamics, +-12% tempo warp), then:
#   Z) ZERO-SHOT: the clean-corpus model of record scored on the hard
#      test split (the honest degradation number), plus a matched
#      clean-corpus baseline of the same model for the delta
#   1) train 16k steps (augment on) on the hard corpus
#   2) average, evaluate (hard test/val), export the artifact, and
#      cross-evaluate the hard-trained model on the CLEAN corpus400
#      test split (does realism training cost clean performance?)
#
# Same hardening as tools/r4s400_chain.sh (stamp files written after
# commits, per-CSV commits, bounded train resume, pathspec-limited git).
#
# Launch:  setsid nohup bash /root/repo/tools/r4hard_chain.sh \
#            > /root/runs/r4hard_chain.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1
mkdir -p /root/runs

D=/root/runs/corpus200h
DCLEAN=/root/runs/corpus400
R=/root/runs/r4hard
CFG=configs/synth16k_aug.yaml
RECORD=checkpoints/model_of_record.npz
STAMP() { date -u +%FT%TZ; }
mkdir -p "$R"

commit_retry() { # commit_retry MESSAGE PATH [PATH ...]
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    if git add -- "$@" && git commit -m "$msg" -- "$@"; then return 0; fi
    echo "commit_retry: attempt $i failed (index lock / race?); waiting"
    sleep 23
  done
  return 1
}

evalrun() { # evalrun NAME DATA_DIR [evaluate.py args ...]
  local name="$1" dir="$2"; shift 2
  if [ ! -f "scores/score-$name.csv" ]; then
    if ! python evaluate.py "$dir" --name "$name" "$@"; then
      echo "evalrun $name FAILED"; return 1
    fi
  fi
  git log --oneline -- "scores/score-$name.csv" | grep -q . || \
    commit_retry "r4hard scores: $name" "scores/score-$name.csv" || return 1
}

train_to() { # train_to MAX_STEPS — bounded resume loop, exit-code gated
  local target="$1"
  for attempt in 1 2 3; do
    local resume=()
    ls "$R"/ckpt/step_* >/dev/null 2>&1 && resume=(--ckpt "$R/ckpt")
    if timeout 8h python train.py "$D" --config "$CFG" \
        --name r4hard --out_dir /root/runs "${resume[@]}" \
        --max_steps "$target" --steps_per_dispatch 100; then
      return 0
    fi
    echo "train_to $target: attempt $attempt failed; resuming in 60s"
    sleep 60
  done
  return 1
}

echo "== $(STAMP) stage 0: synthesize + prep 200-song HARD corpus =="
if [ ! -f "$D/dataset_split.npz" ]; then
  python data/synthesize_corpus.py "$D" --songs 200 --profile hard || exit 1
  python data/align_audio_midi.py "$D" || exit 1
  python data/midi_to_numpy.py "$D" || exit 1
  python data/compute_metrics.py "$D" || exit 1
  python data/generate_split.py "$D" || exit 1
fi

echo "== $(STAMP) stage Z: zero-shot model-of-record on the hard split =="
evalrun r4hard-zeroshot-bf16 "$D" \
  --ckpt "$RECORD" --dtype bfloat16 || exit 1

echo "== $(STAMP) stage 1: train to 16000 steps on the hard corpus =="
if [ ! -f "$R/.stage2_done" ] && [ ! -f "$R/.stage1_done" ]; then
  train_to 16000 || exit 1
  touch "$R/.stage1_done"
fi

echo "== $(STAMP) stage 2: average, evaluate, export, cross-evaluate =="
if [ ! -f "$R/.stage2_done" ]; then
  if [ ! -d "$R/avg16k/params" ]; then
    python tools/average_checkpoints.py "$R/avg16k" "$R"/ckpt/step_* || exit 1
  fi
  evalrun r4hard-avg16k-fp32     "$D" --ckpt "$R/avg16k" || exit 1
  evalrun r4hard-avg16k-fp32-val "$D" --ckpt "$R/avg16k" --split val || exit 1
  evalrun r4hard-final16k-fp32   "$D" --ckpt "$R/ckpt" || exit 1
  if [ ! -f checkpoints/music2midi_r4hard_avg16k.npz ]; then
    python tools/export_npz.py checkpoints/music2midi_r4hard_avg16k.npz \
      "$R"/ckpt/step_* || exit 1
    commit_retry "r4hard: hard-corpus 16k-step averaged export (bf16 npz)

Trained on the 200-song --profile hard corpus (vocal-like lead,
off-score drums, reverb, pink noise, dynamics, +-12% warp). The clean
model_of_record is unchanged; this artifact is the mix-realism
evidence (scores/score-r4hard-*)." \
      checkpoints/music2midi_r4hard_avg16k.npz || exit 1
  fi
  evalrun r4hard-avg16k-npz-bf16 "$D" \
    --ckpt checkpoints/music2midi_r4hard_avg16k.npz --dtype bfloat16 || exit 1
  # cross-corpus: the hard-trained model on the CLEAN 400-song test
  # split (and the clean model's own number is scores/score-r4s400-*)
  if [ -f "$DCLEAN/dataset_split.npz" ]; then
    evalrun r4hard-on-clean400-fp32 "$DCLEAN" --ckpt "$R/avg16k" || exit 1
  fi
  touch "$R/.stage2_done"
fi

echo "== $(STAMP) chain done =="
