#!/bin/bash
# r4soup chain v2: weight-space soups of the r4s400 ancestor, the r4mix
# record, and the r4piano specialist — selected to FIX the serving
# pitch-calibration regression while keeping as much of the fine-tunes'
# domain gains as possible.
#
# Context (PERFORMANCE.md "r4soup"): the pinned serving gate
# (tests/test_transcribe_real_recording.py::test_serving_pitch_calibration,
# CLI form tools/calibration_check.py) FAILS on the current model of
# record — both mixed-domain fine-tunes return zero notes on sparse solo
# audio their r4s400 ancestor transcribes correctly.  A CPU weight-space
# screen (no val/test data) found calibration returns at >= 0.55
# s400-ancestor weight, and that including the r4piano specialist gives
# cleaner sparse output than pure s400.
#
# Design v2 — PRE-DECLARED in PERFORMANCE.md before any val/test scoring:
#   candidates  s55m20p25  s60m20p20  s65mix35  s70m15p15  (all
#   calibration-PASS by construction; weights are s400/mix/piano shares)
#   0) rebuild corpora + soups if /root/runs was wiped (deterministic)
#   1) record + candidates scored on the clean/hard/piano VAL splits
#   2) winner = max unweighted 3-split val mean
#   3) COMMIT WINNER WEIGHTS FIRST (checkpoints/music2midi_r4soup.npz)
#   4) winner scored once on the three TEST splits
#   5) promotion gate: calibration PASS AND clean >= 0.885 AND
#      hard >= 0.80 AND piano >= 0.8555  ->  model_of_record.npz
#      else ROLL BACK the record to the r4s400 avg24k export (best
#      calibration-passing committed model) — no test-split shopping
#   6) run the slow pinned transcription tests (suite must go green)
#
# Launch:  mkdir -p /root/runs && setsid nohup bash \
#            /root/repo/tools/r4soup_chain.sh \
#            > /root/runs/r4soup_chain.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

DCLEAN=/root/runs/corpus400
DHARD=/root/runs/corpus200h
DPIANO=/root/runs/corpus400piano
R=/root/runs/r4soup
S=checkpoints/music2midi_r4s400_avg24k.npz
M=checkpoints/music2midi_r4mix_avg4k.npz
P=checkpoints/music2midi_r4piano_avg4k.npz
WINNPZ=checkpoints/music2midi_r4soup.npz
CANDS="s55m20p25 s60m20p20 s65mix35 s70m15p15"
EVAL_PREFIX="r4soup scores"
. tools/chain_lib.sh
mkdir -p /root/runs "$R"

soup_weights() { # soup_weights NAME -> "wS wM wP" (wP omitted for 2-way)
  case "$1" in
    s55m20p25) echo "0.55 0.20 0.25" ;;
    s60m20p20) echo "0.60 0.20 0.20" ;;
    s65mix35)  echo "0.65 0.35" ;;
    s70m15p15) echo "0.70 0.15 0.15" ;;
    *) return 1 ;;
  esac
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

echo "== $(STAMP) stage 0: ensure corpora + soups =="
prep_corpus "$DCLEAN" --songs 400 || exit 1
prep_corpus "$DHARD" --songs 200 --profile hard || exit 1
if [ ! -f "$DPIANO/dataset_split.npz" ]; then
  python tools/make_timbre_eval.py "$DCLEAN" "$DPIANO" --split test || exit 1
fi
python tools/make_timbre_eval.py "$DCLEAN" "$DPIANO" --split val || exit 1
for C in $CANDS; do
  if [ ! -f "$R/soup_$C.npz" ]; then
    read -r -a W <<< "$(soup_weights "$C")" || exit 1
    SRC=("$S" "$M"); [ "${#W[@]}" = 3 ] && SRC+=("$P")
    python tools/export_npz.py "$R/soup_$C.npz" "${SRC[@]}" \
      --weights "${W[@]}" || exit 1
  fi
done
# calibration screen is a hard precondition — re-verify on this host
python tools/calibration_check.py $(for C in $CANDS; do
  echo "$R/soup_$C.npz"; done) || exit 1

wait_tpu_free || exit 1

echo "== $(STAMP) stage 1: record + candidates on VAL splits =="
evalrun r4soup-val-record-clean400 "$DCLEAN" \
  --ckpt "$M" --dtype bfloat16 --split val || exit 1
evalrun r4soup-val-record-hard200 "$DHARD" \
  --ckpt "$M" --dtype bfloat16 --split val || exit 1
evalrun r4soup-val-record-piano400 "$DPIANO" \
  --ckpt "$M" --dtype bfloat16 --split val || exit 1
for C in $CANDS; do
  evalrun "r4soup-val-$C-clean400" "$DCLEAN" \
    --ckpt "$R/soup_$C.npz" --dtype bfloat16 --split val || exit 1
  evalrun "r4soup-val-$C-hard200" "$DHARD" \
    --ckpt "$R/soup_$C.npz" --dtype bfloat16 --split val || exit 1
  evalrun "r4soup-val-$C-piano400" "$DPIANO" \
    --ckpt "$R/soup_$C.npz" --dtype bfloat16 --split val || exit 1
done

echo "== $(STAMP) stage 2: selection on val =="
if [ ! -f "$R/winner" ]; then
  python - $CANDS > "$R/selection.txt" <<'EOF'
import csv
import sys

def mean(name):
    rows = list(csv.DictReader(open(f"scores/score-{name}.csv")))
    return sum(float(r["score"]) for r in rows) / len(rows)

splits = ("clean400", "hard200", "piano400")
rec = {s: mean(f"r4soup-val-record-{s}") for s in splits}
print("record val:", {k: round(v, 4) for k, v in rec.items()},
      f"mean={sum(rec.values()) / 3:.4f}")
best, best_mean = None, -1.0
for c in sys.argv[1:]:
    s = {sp: mean(f"r4soup-val-{c}-{sp}") for sp in splits}
    m = sum(s.values()) / 3
    print(f"{c}:", {k: round(v, 4) for k, v in s.items()}, f"mean={m:.4f}")
    if m > best_mean:
        best, best_mean = c, m
print("winner:", best)
EOF
  cat "$R/selection.txt"
  awk '/^winner:/ {print $2}' "$R/selection.txt" > "$R/winner"
fi
WIN=$(cat "$R/winner")
[ -n "$WIN" ] || exit 1

echo "== $(STAMP) stage 3: COMMIT WINNER WEIGHTS ($WIN) =="
if ! git log --oneline -- "$WINNPZ" | grep -q .; then
  cp "$R/soup_$WIN.npz" "$WINNPZ" || exit 1
  commit_retry "r4soup: calibration-passing weight soup ($WIN) of s400/mix/piano exports

No training: fp32 weighted average of the committed npz exports
(weights in tools/r4soup_chain.sh soup_weights), re-exported bf16.
Candidate set was screened on the serving pitch-calibration fixture
(tools/calibration_check.py) and the winner chosen on the clean/hard/
piano VAL splits; test splits untouched until this commit.  See the
r4soup section of PERFORMANCE.md." "$WINNPZ" || exit 1
fi

echo "== $(STAMP) stage 4: winner on TEST splits =="
evalrun r4soup-npz-bf16-clean400 "$DCLEAN" \
  --ckpt "$WINNPZ" --dtype bfloat16 || exit 1
evalrun r4soup-npz-bf16-hard200 "$DHARD" \
  --ckpt "$WINNPZ" --dtype bfloat16 || exit 1
evalrun r4soup-npz-bf16-piano400 "$DPIANO" \
  --ckpt "$WINNPZ" --dtype bfloat16 || exit 1

echo "== $(STAMP) stage 5: promotion gate =="
if [ ! -f "$R/.promoted" ] && [ ! -f "$R/.rolled_back" ]; then
  if python tools/calibration_check.py "$WINNPZ" && python - <<'EOF'
import csv

def mean(name):
    rows = list(csv.DictReader(open(f"scores/score-{name}.csv")))
    return sum(float(r["score"]) for r in rows) / len(rows)

clean = mean("r4soup-npz-bf16-clean400")
hard = mean("r4soup-npz-bf16-hard200")
piano = mean("r4soup-npz-bf16-piano400")
print(f"clean={clean:.4f} (gate >= 0.885)  hard={hard:.4f} (gate >= 0.80)"
      f"  piano={piano:.4f} (gate >= 0.8555)")
ok = clean >= 0.885 and hard >= 0.80 and piano >= 0.8555
print("promotion gate:", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
EOF
  then
    cp "$WINNPZ" checkpoints/model_of_record.npz || exit 1
    commit_retry "Promote the r4soup calibration-passing soup to model of record

Restores the pinned serving pitch-calibration behavior the r4mix
record regressed (zero notes on sparse solo audio) while keeping most
of the fine-tunes' hard/piano-domain gains.  Gate and evidence in the
r4soup section of PERFORMANCE.md and scores/score-r4soup-*." \
      checkpoints/model_of_record.npz || exit 1
    touch "$R/.promoted"
  else
    echo "gate FAILED — rolling back the record to the r4s400 avg24k export"
    cp "$S" checkpoints/model_of_record.npz || exit 1
    commit_retry "Roll back model of record to the r4s400 avg24k export

The r4mix record fails the pinned serving pitch-calibration gate
(zero notes on sparse solo audio) and the r4soup interpolation winner
did not clear its pre-declared test gate; correctness outranks the
hard-domain chroma delta.  See the r4soup section of PERFORMANCE.md." \
      checkpoints/model_of_record.npz || exit 1
    touch "$R/.rolled_back"
  fi
fi

echo "== $(STAMP) stage 6: slow pinned transcription tests =="
timeout 2400 python -m pytest tests/test_transcribe_real_recording.py -q \
  2>&1 | tail -3

echo "== $(STAMP) chain done =="
