#!/bin/bash
# r5 re-gate master: session-restart relauncher for the two pre-declared
# chains still outstanding after the /root/runs wipe (PERFORMANCE.md
# r5clamp "Step 3 queued" + r5fullmix "Pre-declared follow-up").
#
#   stage 0  rebuild the deterministic eval corpora (CPU only; the wipe
#            lost them — same prep recipe as tools/r5fullmix_chain.sh)
#   stage 1  tools/r5clamp_chain.sh   — clamp quality delta, verdict,
#            guarded serving-default flip (PRE-DECLARED, binding)
#   stage 2  tools/r5fullmix2_chain.sh — the one binding re-gate of the
#            committed r5fullmix candidate, only if r5clamp flipped
#
# Launch:  setsid nohup bash tools/r5regate_master.sh \
#            > /root/runs/r5regate_master.log 2>&1 < /dev/null &
set -x
set -o pipefail
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

DCLEAN=/root/runs/corpus400
DHARD=/root/runs/corpus200h
DPIANO=/root/runs/corpus400piano
DFULL=/root/runs/corpus300f
. tools/chain_lib.sh
mkdir -p /root/runs

STAMP() { date -u +%FT%TZ; }

prep_corpus() { # prep_corpus DIR EXTRA_SYNTH_ARGS...
  local dir="$1"; shift
  [ -f "$dir/dataset_split.npz" ] && return 0
  python data/synthesize_corpus.py "$dir" "$@" || return 1
  python data/align_audio_midi.py "$dir" || return 1
  python data/midi_to_numpy.py "$dir" || return 1
  python data/compute_metrics.py "$dir" || return 1
  python data/generate_split.py "$dir" || return 1
}

echo "== $(STAMP) stage 0: rebuild eval corpora (CPU) =="
prep_corpus "$DCLEAN" --songs 400 || exit 1
prep_corpus "$DHARD" --songs 200 --profile hard || exit 1
prep_corpus "$DFULL" --songs 300 --profile fullmix || exit 1
if [ ! -f "$DPIANO/dataset_split.npz" ]; then
  python tools/make_timbre_eval.py "$DCLEAN" "$DPIANO" --split test || exit 1
fi

echo "== $(STAMP) stage 1: r5clamp step 3+4 =="
bash tools/r5clamp_chain.sh || exit 1

echo "== $(STAMP) stage 2: r5fullmix2 re-gate (self-gated on .flipped) =="
bash tools/r5fullmix2_chain.sh || exit 1

echo "== $(STAMP) r5regate master done =="
