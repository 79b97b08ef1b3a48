#!/bin/bash
# r4mix chain: fine-tune the clean model of record on a MIXED
# clean+hard corpus (480 train songs = corpus400's 320 clean +
# corpus200h's 160 hard, hard ids prefixed "hard_", symlink-merged in
# /root/runs/corpus_mix by tools/make_mix_corpus.py — see
# PERFORMANCE.md).
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
EVAL_PREFIX="r4mix scores"
. tools/chain_lib.sh
mkdir -p "$R"

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

echo "== $(STAMP) stage 0: merged corpus present? =="
if [ ! -f "$D/dataset_split.npz" ]; then
  for src in "$DCLEAN" "$DHARD"; do
    if [ ! -f "$src/dataset_split.npz" ]; then
      echo "source corpus $src is missing — build it first"; exit 1
    fi
  done
  python tools/make_mix_corpus.py "$DCLEAN" "$DHARD" "$D" \
    --prefix hard_ || exit 1
fi

# never start a trainer while another process holds the chip: a blocked
# trainer would burn its 4h timeout and get killed mid-stall
wait_tpu_free || exit 1

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
