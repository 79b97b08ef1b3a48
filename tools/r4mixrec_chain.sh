#!/bin/bash
# r4mixrec chain: RECOVER the r4mix mixed-domain fine-tune and promote
# it to model of record.
#
# Why: the r4mix chain (tools/r4mix_chain.sh) completed and committed
# its score CSVs — avg4k holds 0.8946 on the clean corpus400 test split
# (record 0.9011, -0.0065) while scoring 0.8477 on the hard split
# (zero-shot 0.7802, +0.0675; it even beats the hard-only r4ft
# fine-tune's 0.8419) — but the machine reset before the weights were
# committed, and /root/runs is gone.  The pre-declared decision rule
# (PERFORMANCE.md, r4mix section) says this model becomes the new model
# of record, so this chain re-runs the deterministic pipeline:
#
#   0) rebuild corpus400 (clean, seeded) + corpus200h (--profile hard)
#      + the symlink-merged mix corpus — all seeded CLIs, same commands
#      as tools/r4s400_chain.sh / r4hard_chain.sh stage 0
#   1) fine-tune the CLEAN record (the immutable avg24k npz, byte-equal
#      to the current model_of_record.npz) for 4000 steps on the mix
#   2) average the last-3 ckpts, export bf16 npz, COMMIT THE WEIGHTS
#      IMMEDIATELY (durability first — the r4mix lesson)
#   3) score the npz (bf16 serving mode) on BOTH test splits, commit
#      CSVs, print the paired delta vs the committed r4mix CSVs
#   4) promotion gate: clean mean >= 0.885 AND hard mean >= 0.83
#      (committed r4mix npz run: 0.8948 / 0.8501) -> cp to
#      checkpoints/model_of_record.npz and commit
#
# Launch:  setsid nohup bash /root/repo/tools/r4mixrec_chain.sh \
#            > /root/runs/r4mixrec_chain.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

D=/root/runs/corpus_mix
DHARD=/root/runs/corpus200h
DCLEAN=/root/runs/corpus400
R=/root/runs/r4mixrec
CFG=configs/synth16k_aug.yaml
# init from the immutable avg24k artifact (byte-equal to the current
# model_of_record.npz) so a rerun after promotion still warm-starts
# from the CLEAN record, not from the promoted mix model
INIT=checkpoints/music2midi_r4s400_avg24k.npz
NPZ=checkpoints/music2midi_r4mix_avg4k.npz
EVAL_PREFIX="r4mixrec scores"
. tools/chain_lib.sh
mkdir -p /root/runs "$R"

prep_corpus() { # prep_corpus DIR EXTRA_SYNTH_ARGS...
  local dir="$1"; shift
  [ -f "$dir/dataset_split.npz" ] && return 0
  python data/synthesize_corpus.py "$dir" "$@" || return 1
  python data/align_audio_midi.py "$dir" || return 1
  python data/midi_to_numpy.py "$dir" || return 1
  python data/compute_metrics.py "$dir" || return 1
  python data/generate_split.py "$dir" || return 1
}

echo "== $(STAMP) stage 0: rebuild corpora (clean 400, hard 200, mix) =="
prep_corpus "$DCLEAN" --songs 400 || exit 1
prep_corpus "$DHARD" --songs 200 --profile hard || exit 1
if [ ! -f "$D/dataset_split.npz" ]; then
  python tools/make_mix_corpus.py "$DCLEAN" "$DHARD" "$D" \
    --prefix hard_ || exit 1
fi

wait_tpu_free || exit 1

echo "== $(STAMP) stage 1: mixed fine-tune to 4k steps =="
if [ ! -f "$R/.stage1_done" ]; then
  ok=
  for attempt in 1 2 3; do
    resume=()
    ls "$R"/ckpt/step_* >/dev/null 2>&1 && resume=(--ckpt "$R/ckpt")
    [ ${#resume[@]} -eq 0 ] && resume=(--init_from "$INIT")
    if timeout 4h python train.py "$D" --config "$CFG" \
        --name r4mixrec --out_dir /root/runs "${resume[@]}" \
        --max_steps 4000 --steps_per_dispatch 100; then
      ok=1; break
    fi
    echo "train attempt $attempt failed; resuming in 60s"; sleep 60
  done
  [ -n "$ok" ] || exit 1
  touch "$R/.stage1_done"
fi

echo "== $(STAMP) stage 2: average + export npz + COMMIT WEIGHTS =="
if ! git log --oneline -- "$NPZ" | grep -q .; then
  if [ ! -f "$NPZ" ]; then
    python tools/export_npz.py "$NPZ" "$R"/ckpt/step_* || exit 1
  fi
  commit_retry "r4mix recovery: mixed-domain 4k-step averaged export (bf16 npz)

Re-run of the r4mix fine-tune lost to the machine reset (score CSVs
survived: scores/score-r4mix-avg4k-*). Fine-tuned the clean avg24k
record for 4000 steps on the 480-song clean+hard mix corpus, averaged
the last-3 checkpoints, exported with tools/export_npz.py." \
    "$NPZ" || exit 1
fi

echo "== $(STAMP) stage 3: score the npz on both test splits =="
evalrun r4mixrec-avg4k-npz-bf16-hard200 "$DHARD" \
  --ckpt "$NPZ" --dtype bfloat16 || exit 1
evalrun r4mixrec-avg4k-npz-bf16-clean400 "$DCLEAN" \
  --ckpt "$NPZ" --dtype bfloat16 || exit 1

echo "== $(STAMP) stage 4: promotion gate =="
if [ ! -f "$R/.promoted" ]; then
  if python - <<'EOF'
import csv

def mean(path):
    rows = list(csv.DictReader(open(path)))
    return sum(float(r["score"]) for r in rows) / len(rows)

def paired_delta(new, old):
    def by_id(path):
        return {r["piano_id"]: float(r["score"])
                for r in csv.DictReader(open(path))}
    a, b = by_id(new), by_id(old)
    common = sorted(set(a) & set(b))
    d = [a[k] - b[k] for k in common]
    return sum(d) / len(d), len(common)

clean = mean("scores/score-r4mixrec-avg4k-npz-bf16-clean400.csv")
hard = mean("scores/score-r4mixrec-avg4k-npz-bf16-hard200.csv")
dc, nc = paired_delta("scores/score-r4mixrec-avg4k-npz-bf16-clean400.csv",
                      "scores/score-r4mix-avg4k-npz-bf16-clean400.csv")
dh, nh = paired_delta("scores/score-r4mixrec-avg4k-npz-bf16-hard200.csv",
                      "scores/score-r4mix-avg4k-npz-bf16-hard200.csv")
print(f"recovered means: clean={clean:.4f} hard={hard:.4f}")
print(f"paired delta vs lost r4mix run: clean {dc:+.4f} (n={nc}), "
      f"hard {dh:+.4f} (n={nh})")
ok = clean >= 0.885 and hard >= 0.83
print("promotion gate:", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
EOF
  then
    cp "$NPZ" checkpoints/model_of_record.npz || exit 1
    commit_retry "Promote the mixed-domain fine-tune to model of record

One model for both domains: holds ~the clean record's accuracy on the
clean corpus400 test split while capturing the full hard-split gain of
the domain fine-tune (see scores/score-r4mixrec-* and the r4mix section
of PERFORMANCE.md). Decision rule pre-declared in PERFORMANCE.md." \
      checkpoints/model_of_record.npz || exit 1
    touch "$R/.promoted"
  else
    echo "promotion gate FAILED — keeping the clean record; see CSVs"
    touch "$R/.promotion_failed"
  fi
fi

echo "== $(STAMP) chain done =="
