#!/bin/bash
# r3s400 chain: extend the corpus-scaling line to 400 songs (16 -> 64 ->
# 200 -> 400), augment ON (configs/synth16k_aug.yaml), and answer the
# (idempotent: every stage is guarded, so rerunning the script resumes)
# dangling "still climbing past 16k steps?" question by resuming the same
# run to 24000 steps.  Every stage commits its score CSVs into the repo
# immediately so results survive machine resets (the r3xla 24k extension
# was lost exactly this way).
#
# Launch:  setsid nohup bash /root/runs/r3s400_chain.sh \
#            > /root/runs/r3s400_chain.log 2>&1 < /dev/null &
set -x
export PYTHONPATH=/root/.axon_site
cd /root/repo || exit 1

D=/root/runs/corpus400
R=/root/runs/r3s400
STAMP() { date -u +%FT%TZ; }

echo "== $(STAMP) stage 0: synthesize 400-song corpus =="
if [ ! -f "$D/dataset_split.yaml" ]; then
  python data/synthesize_corpus.py "$D" --songs 400 || exit 1
  python data/align_audio_midi.py "$D" || exit 1
  python data/midi_to_numpy.py "$D" || exit 1
  python data/compute_metrics.py "$D" || exit 1
  python data/generate_split.py "$D" || exit 1
fi

echo "== $(STAMP) stage 1: train 16000 steps (augment on) =="
if ! ls "$R"/ckpt/step_* >/dev/null 2>&1; then
  timeout 6h python train.py "$D" --config configs/synth16k_aug.yaml \
    --name r3s400 --out_dir /root/runs --max_steps 16000 \
    --steps_per_dispatch 100 || exit 1
elif [ ! -d "$R/ckpt/step_00016000" ] && [ ! -d "$R/ckpt/step_00024000" ]; then
  # crashed mid-run: resume to the 16k boundary first
  timeout 6h python train.py "$D" --config configs/synth16k_aug.yaml \
    --name r3s400 --out_dir /root/runs --ckpt "$R/ckpt" \
    --max_steps 16000 --steps_per_dispatch 100 || exit 1
fi

echo "== $(STAMP) stage 2: average + evaluate @16k =="
if [ -d "$R/ckpt/step_00016000" ] && [ ! -d "$R/avg16k" ]; then
python tools/average_checkpoints.py "$R/avg16k" "$R"/ckpt/step_* || exit 1
python evaluate.py "$D" --ckpt "$R/avg16k" --name r3s400-avg16k-fp32
python evaluate.py "$D" --ckpt "$R/avg16k" --name r3s400-avg16k-bf16 \
  --dtype bfloat16
python evaluate.py "$D" --ckpt "$R/ckpt/step_00016000" \
  --name r3s400-final16k-fp32
python evaluate.py "$D" --ckpt "$R/avg16k" --name r3s400-avg16k-fp32-val \
  --split val
git add score-r3s400-avg16k-fp32.csv score-r3s400-avg16k-bf16.csv \
  score-r3s400-final16k-fp32.csv score-r3s400-avg16k-fp32-val.csv \
  && git commit -m "r3s400 16k-step scores: 400-song corpus, augment on

Produced by the detached chain (synthesize_corpus 400 songs -> full prep
chain -> train.py 16000 steps with configs/synth16k_aug.yaml ->
average_checkpoints over the kept last-3 -> evaluate.py).  Extends the
16/64/200-song scaling line; write-up lands in PERFORMANCE.md next
session."
fi

echo "== $(STAMP) stage 3: resume to 24000 steps =="
if [ ! -d "$R/ckpt/step_00024000" ]; then
  timeout 6h python train.py "$D" --config configs/synth16k_aug.yaml \
    --name r3s400 --out_dir /root/runs --ckpt "$R/ckpt" \
    --max_steps 24000 --steps_per_dispatch 100 || exit 1
fi

echo "== $(STAMP) stage 4: average + evaluate @24k =="
if [ -d "$R/ckpt/step_00024000" ] && [ ! -d "$R/avg24k" ]; then
python tools/average_checkpoints.py "$R/avg24k" "$R"/ckpt/step_* || exit 1
python evaluate.py "$D" --ckpt "$R/avg24k" --name r3s400-avg24k-fp32
python evaluate.py "$D" --ckpt "$R/ckpt/step_00024000" \
  --name r3s400-final24k-fp32
git add score-r3s400-avg24k-fp32.csv score-r3s400-final24k-fp32.csv \
  && git commit -m "r3s400 24k-step scores: the 16k->24k extension

Answers PERFORMANCE.md's open question (is test accuracy still climbing
past 16k steps?) on the 400-song corpus; write-up next session."
fi

echo "== $(STAMP) chain done =="
