#!/bin/bash
# r4mix chain: fine-tune the clean model of record on a MIXED
# clean+hard corpus (480 train songs = corpus400's 320 clean +
# corpus200h's 160 hard, hard ids prefixed "hard_", symlink-merged in
# /root/runs/corpus_mix by a one-shot script — see PERFORMANCE.md).
#
# Question (the lever named in PERFORMANCE.md's r4ft section): can ONE
# model hold the clean record's 0.9011 AND the fine-tune's 0.8419 on
# hard, instead of trading 0.033 of clean for the hard gain the way the
# hard-only fine-tune (r4ft) did?  Stage boundaries at 4k steps (same
# budget as r4ft, direct comparison) and 8k steps (does the mix need
# more budget because hard is only 1/3 of batches?).
#
# Launch:  setsid nohup bash /root/repo/tools/r4mix_chain.sh \
#            > /root/runs/r4mix_chain.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

D=/root/runs/corpus_mix
DHARD=/root/runs/corpus200h
DCLEAN=/root/runs/corpus400
R=/root/runs/r4mix
CFG=configs/synth16k_aug.yaml
RECORD=checkpoints/model_of_record.npz
STAMP() { date -u +%FT%TZ; }
mkdir -p "$R"

commit_retry() {
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    if git add -- "$@" && git commit -m "$msg" -- "$@"; then return 0; fi
    echo "commit_retry: attempt $i failed; waiting"; sleep 23
  done
  return 1
}

evalrun() { # evalrun NAME DATA_DIR [args ...]
  local name="$1" dir="$2"; shift 2
  if [ ! -f "scores/score-$name.csv" ]; then
    if ! python evaluate.py "$dir" --name "$name" "$@"; then
      echo "evalrun $name FAILED"; return 1
    fi
  fi
  git log --oneline -- "scores/score-$name.csv" | grep -q . || \
    commit_retry "r4mix scores: $name" "scores/score-$name.csv" || return 1
}

train_to() { # train_to MAX_STEPS STAGE_STAMP
  local max_steps="$1" stamp="$2"
  [ -f "$R/$stamp" ] && return 0
  for attempt in 1 2 3; do
    resume=()
    ls "$R"/ckpt/step_* >/dev/null 2>&1 && resume=(--ckpt "$R/ckpt")
    if [ ${#resume[@]} -eq 0 ]; then
      resume=(--init_from "$RECORD")
    fi
    if timeout 4h python train.py "$D" --config "$CFG" \
        --name r4mix --out_dir /root/runs "${resume[@]}" \
        --max_steps "$max_steps" --steps_per_dispatch 100; then
      touch "$R/$stamp"; break
    fi
    echo "train_to $max_steps attempt $attempt failed; resuming in 60s"
    sleep 60
  done
  [ -f "$R/$stamp" ]
}

echo "== $(STAMP) stage 1: mixed fine-tune to 4k steps =="
train_to 4000 .stage1_done || exit 1

echo "== $(STAMP) stage 2: average @4k + evaluate both splits =="
if [ ! -f "$R/.stage2_done" ]; then
  if [ ! -d "$R/avg4k/params" ]; then
    python tools/average_checkpoints.py "$R/avg4k" "$R"/ckpt/step_* || exit 1
  fi
  evalrun r4mix-avg4k-on-hard200  "$DHARD"  --ckpt "$R/avg4k" || exit 1
  evalrun r4mix-avg4k-on-clean400 "$DCLEAN" --ckpt "$R/avg4k" || exit 1
  touch "$R/.stage2_done"
fi

echo "== $(STAMP) stage 3: continue to 8k steps =="
train_to 8000 .stage3_done || exit 1

echo "== $(STAMP) stage 4: average @8k + evaluate both splits =="
if [ ! -f "$R/.stage4_done" ]; then
  if [ ! -d "$R/avg8k/params" ]; then
    python tools/average_checkpoints.py "$R/avg8k" "$R"/ckpt/step_* || exit 1
  fi
  evalrun r4mix-avg8k-on-hard200  "$DHARD"  --ckpt "$R/avg8k" || exit 1
  evalrun r4mix-avg8k-on-clean400 "$DCLEAN" --ckpt "$R/avg8k" || exit 1
  touch "$R/.stage4_done"
fi

echo "== $(STAMP) chain done =="
