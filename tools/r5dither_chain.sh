#!/bin/bash
# r5dither protocol step 3 (PERFORMANCE.md "r5dither", pre-declared):
# quality delta of the default-on serving input dither on the record.
#
# The knob landed default-ON (steps 1-2: regression pair + gate on all
# committed checkpoints).  This chain scores the SAME weights
# (model_of_record == music2midi_r4soup) on the three test splits with
# dither ON and compares per-song against the committed no-dither CSVs
# (scores/score-r4soup-npz-bf16-*, scored before the knob existed).
# Verdict rule (declared): quality-neutral iff on EVERY split the
# per-song delta CI contains 0 or |mean| < 0.005; otherwise the knob
# must default OFF and the mel log-floor clamp alternative is evaluated.
#
# Ends by exec-ing tools/r5fullmix_chain.sh so the chip never idles
# between chains (CLAUDE.md detached-watcher protocol).
#
# Launch:  mkdir -p /root/runs && setsid nohup bash \
#            /root/repo/tools/r5dither_chain.sh \
#            > /root/runs/r5dither_chain.log 2>&1 < /dev/null &
set -x
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
cd /root/repo || exit 1

DCLEAN=/root/runs/corpus400
DHARD=/root/runs/corpus200h
DPIANO=/root/runs/corpus400piano
R=/root/runs/r5dither
NPZ=checkpoints/model_of_record.npz
EVAL_PREFIX="r5dither scores"
. tools/chain_lib.sh
mkdir -p /root/runs "$R"

wait_tpu_free || exit 1

echo "== $(STAMP) r5dither step 3: test splits, dither ON =="
evalrun r5dither-npz-bf16-clean400 "$DCLEAN" \
  --ckpt "$NPZ" --dtype bfloat16 || exit 1
evalrun r5dither-npz-bf16-hard200 "$DHARD" \
  --ckpt "$NPZ" --dtype bfloat16 || exit 1
evalrun r5dither-npz-bf16-piano400 "$DPIANO" \
  --ckpt "$NPZ" --dtype bfloat16 || exit 1

echo "== $(STAMP) r5dither verdict (per-song paired deltas) =="
{
  for s in clean400 hard200 piano400; do
    python tools/score_summary.py \
      "scores/score-r4soup-npz-bf16-$s.csv" \
      "scores/score-r5dither-npz-bf16-$s.csv"
  done
} | tee "$R/deltas.txt"
python - <<'EOF' | tee "$R/verdict.txt"
import csv
import numpy as np

rng_ci = None
ok = True
for s in ["clean400", "hard200", "piano400"]:
    def read(name):
        with open(f"scores/score-{name}.csv") as f:
            return {r["piano_id"]: float(r["score"])
                    for r in csv.DictReader(f)}
    a = read(f"r4soup-npz-bf16-{s}")
    b = read(f"r5dither-npz-bf16-{s}")
    shared = sorted(set(a) & set(b))
    d = np.array([b[k] - a[k] for k in shared])
    rng = np.random.default_rng(0)
    means = rng.choice(d, size=(10000, len(d)), replace=True).mean(axis=1)
    lo, hi = np.percentile(means, [2.5, 97.5])
    neutral = (lo <= 0.0 <= hi) or abs(d.mean()) < 0.005
    ok &= neutral
    print(f"{s}: n={len(d)} mean={d.mean():+.4f} ci95=[{lo:+.4f}, {hi:+.4f}]"
          f" -> {'neutral' if neutral else 'NOT NEUTRAL'}")
print("r5dither step-3 verdict:", "QUALITY-NEUTRAL (knob stays default-ON)"
      if ok else "FAILED the declared bar — default the knob OFF and "
      "evaluate the mel log-floor clamp alternative")
EOF

echo "== $(STAMP) handing off to the r5fullmix chain =="
exec bash tools/r5fullmix_chain.sh
