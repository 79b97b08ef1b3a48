# Shared helpers for the detached TPU run chains (tools/*_chain.sh).
# Source from a chain script after setting EVAL_PREFIX (the commit-message
# prefix for score CSVs, e.g. "r4mix scores").
#
# Conventions these encode (CLAUDE.md "Environment gotchas"):
#   * exactly ONE process may hold the TPU — wait_tpu_free polls before
#     any stage that starts a holder, instead of letting a blocked
#     trainer burn its timeout and get SIGKILLed mid-stall (which
#     extends the relay's lease poison window)
#   * score CSVs commit individually with retries, so one relay flake
#     does not drop the other artifacts of a stage

STAMP() { date -u +%FT%TZ; }

commit_retry() { # commit_retry MSG PATH...
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    if git add -- "$@" && git commit -m "$msg" -- "$@"; then return 0; fi
    echo "commit_retry: attempt $i failed; waiting"; sleep 23
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
    commit_retry "${EVAL_PREFIX:-scores}: $name" "scores/score-$name.csv" \
    || return 1
}

promote_record() { # promote_record SRC_NPZ COMMIT_MSG
  # The ONLY sanctioned way for a chain to update the model of record:
  # the serving calibration gate (tools/calibration_check.py, CPU-only)
  # runs on the candidate FIRST and a FAIL aborts the promotion — the r4
  # regression shipped because this gate was advisory prose (VERDICT r4
  # weak #3).  Also runs on the copy after the commit as a paranoia
  # re-check of what was actually committed.
  local src="$1" msg="$2"
  python tools/calibration_check.py "$src" || {
    echo "promote_record: $src FAILS the serving calibration gate — REFUSED"
    return 1
  }
  cp "$src" checkpoints/model_of_record.npz || return 1
  commit_retry "$msg" checkpoints/model_of_record.npz || return 1
  python tools/calibration_check.py checkpoints/model_of_record.npz
}

split_mean_ci() { # split_mean_ci SCORE_NAME -> "mean=X ci95=[lo, hi]" line
  # Quote the bootstrap CI next to every gate verdict (VERDICT r4 #7);
  # uses the same estimator as tools/score_summary.py.
  python tools/score_summary.py "scores/score-$1.csv" | head -1
}

wait_tpu_free() { # poll (read-only) until no other TPU-holding CLI runs
  local i
  for i in $(seq 1 240); do
    if ! ps -eo args | grep -E 'python[0-9.]* .*(train|evaluate|bench)\.py' \
        | grep -vE 'grep|chain_lib' | grep -q .; then
      return 0
    fi
    echo "$(STAMP) wait_tpu_free: another TPU holder is live; waiting ($i)"
    sleep 60
  done
  echo "wait_tpu_free: gave up after 4h"; return 1
}
