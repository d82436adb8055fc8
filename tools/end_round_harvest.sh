#!/bin/bash
# Round-end sequence for a supervised training run on the single-chip setup:
# graceful stop (SIGTERM -> checkpoint -> clean exit), harvest evidence into
# docs/evidence/, and copy the latest (replay-less) checkpoint into a
# committed path so the NEXT round resumes instead of restarting (runs/ is
# gitignored — round-2 and the first round-3 session both lost their runs by
# leaving artifacts only there).
#
#   tools/end_round_harvest.sh <run_dir> <name> [supervisor_pid]
set -eu
RUN=${1:?run dir}
NAME=${2:?evidence name}
SUP_PID=${3:-}

# Validate the run BEFORE touching the previously committed checkpoint: a
# wrong run dir or an unfinalized LATEST must not delete last round's
# artifacts from the working tree.
LATEST=$(cat "$RUN/models/LATEST" 2>/dev/null || true)
if [ -z "$LATEST" ] || [ ! -d "$RUN/models/ckpt_$LATEST" ]; then
  echo "ERROR: $RUN/models has no finalized LATEST checkpoint; refusing to harvest" >&2
  exit 1
fi

if [ -n "$SUP_PID" ] && kill -0 "$SUP_PID" 2>/dev/null; then
  # Supervisor forwards SIGTERM to the child, which checkpoints after the
  # current iteration and exits; supervisor then exits without relaunching.
  kill -TERM "$SUP_PID"
  for i in $(seq 1 180); do
    kill -0 "$SUP_PID" 2>/dev/null || break
    sleep 2
  done
  if kill -0 "$SUP_PID" 2>/dev/null; then
    echo "WARNING: supervisor still alive after 6 min" >&2
  fi
fi

python tools/harvest_evidence.py --run "$RUN" --name "$NAME"

# Never replace a committed agent_best with a WORSE one: if the previously
# committed best.json beats the run's, keep the committed pair (covers runs
# launched without seeding best.json, where best_eval re-inits to -inf).
DEST="checkpoints/$NAME"
KEEP_BEST=""
if [ -f "$DEST/best.json" ] && [ -f "$RUN/models/best.json" ]; then
  OLD_R=$(python -c "import json,sys;print(json.load(open(sys.argv[1]))['eval_reward'])" "$DEST/best.json")
  NEW_R=$(python -c "import json,sys;print(json.load(open(sys.argv[1]))['eval_reward'])" "$RUN/models/best.json")
  if python -c "import sys;sys.exit(0 if float(sys.argv[1]) > float(sys.argv[2]) else 1)" "$OLD_R" "$NEW_R"; then
    echo "keeping committed agent_best (eval $OLD_R > run's $NEW_R)"
    KEEP_BEST=$(mktemp -d)
    cp "$DEST/best.json" "$KEEP_BEST/"
    [ -d "$DEST/agent_best" ] && cp -r "$DEST/agent_best" "$KEEP_BEST/agent_best"
  fi
fi

# Copy the newest checkpoint (and run metadata) to the committed path.
rm -rf "$DEST" && mkdir -p "$DEST"
cp -r "$RUN/models/ckpt_$LATEST" "$DEST/ckpt_$LATEST"
echo "$LATEST" > "$DEST/LATEST"
for f in best.json kickstart.json run_meta.json; do
  [ -f "$RUN/models/$f" ] && cp "$RUN/models/$f" "$DEST/" || true
done
# agent_best (never-pruned best-eval params) if present
if [ -n "$KEEP_BEST" ]; then
  cp "$KEEP_BEST/best.json" "$DEST/"
  [ -d "$KEEP_BEST/agent_best" ] && cp -r "$KEEP_BEST/agent_best" "$DEST/agent_best" || true
  rm -rf "$KEEP_BEST"
elif [ -d "$RUN/models/agent_best" ]; then
  cp -r "$RUN/models/agent_best" "$DEST/agent_best"
fi
du -sh "$DEST"
cp "$RUN/logs/metrics.csv" "$DEST/metrics.csv" 2>/dev/null || true
tail -50 "$RUN/stdout.log" > "$DEST/stdout_tail.txt" 2>/dev/null || true
echo "harvested: docs/evidence/${NAME}_* and $DEST/"
