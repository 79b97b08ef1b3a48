#!/bin/bash
# r4ft chain: fine-tune the clean model of record on the HARD corpus
# (train.py --init_from) and answer the transfer question the
# from-scratch r4hard run can't: does warm-starting from clean weights
# beat 16k-step from-scratch training on hard mixes at 1/4 the steps,
# and what does it cost on the clean test split?
#
# Waits for the r4hard chain to finish (stamp file) before touching the
# TPU (CLAUDE.md: one TPU holder; chain follow-up work waits detached).
#
# Launch:  setsid nohup bash /root/repo/tools/r4ft_chain.sh \
#            > /root/runs/r4ft_chain.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

D=/root/runs/corpus200h
DCLEAN=/root/runs/corpus400
R=/root/runs/r4ft
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
    commit_retry "r4ft scores: $name" "scores/score-$name.csv" || return 1
}

echo "== $(STAMP) waiting for the r4hard chain to release the TPU =="
for i in $(seq 1 720); do  # up to 12 h, poll every minute
  [ -f /root/runs/r4hard/.stage2_done ] && break
  sleep 60
done
if [ ! -f /root/runs/r4hard/.stage2_done ]; then
  echo "r4hard never finished; aborting"; exit 1
fi

echo "== $(STAMP) stage 1: fine-tune the model of record, 4000 steps =="
if [ ! -f "$R/.stage1_done" ]; then
  for attempt in 1 2 3; do
    resume=()
    ls "$R"/ckpt/step_* >/dev/null 2>&1 && resume=(--ckpt "$R/ckpt")
    if [ ${#resume[@]} -eq 0 ]; then
      resume=(--init_from "$RECORD")
    fi
    if timeout 4h python train.py "$D" --config "$CFG" \
        --name r4ft --out_dir /root/runs "${resume[@]}" \
        --max_steps 4000 --steps_per_dispatch 100; then
      touch "$R/.stage1_done"; break
    fi
    echo "fine-tune attempt $attempt failed; resuming in 60s"; sleep 60
  done
  [ -f "$R/.stage1_done" ] || exit 1
fi

echo "== $(STAMP) stage 2: average + evaluate (hard and clean splits) =="
if [ ! -f "$R/.stage2_done" ]; then
  if [ ! -d "$R/avg4k/params" ]; then
    python tools/average_checkpoints.py "$R/avg4k" "$R"/ckpt/step_* || exit 1
  fi
  evalrun r4ft-avg4k-fp32         "$D"      --ckpt "$R/avg4k" || exit 1
  evalrun r4ft-avg4k-on-clean400  "$DCLEAN" --ckpt "$R/avg4k" || exit 1
  touch "$R/.stage2_done"
fi

echo "== $(STAMP) chain done =="
