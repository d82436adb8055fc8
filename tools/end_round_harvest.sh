#!/bin/bash
# Round-end sequence for a supervised training run on the single-chip setup:
# graceful stop (SIGTERM -> checkpoint -> clean exit), harvest evidence into
# docs/evidence/, and copy the latest (replay-less) checkpoint into a
# committed path so the NEXT round resumes instead of restarting (runs/ is
# gitignored — round-2 and the first round-3 session both lost their runs by
# leaving artifacts only there).
#
#   tools/end_round_harvest.sh <run_dir> <name> [supervisor_pid]
set -u
RUN=${1:?run dir}
NAME=${2:?evidence name}
SUP_PID=${3:-}

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

python tools/harvest_evidence.py --run "$RUN" --name "$NAME" || exit 1

# Copy the newest checkpoint (and run metadata) to a committed path.
DEST="checkpoints/$NAME"
rm -rf "$DEST" && mkdir -p "$DEST"
LATEST=$(cat "$RUN/models/LATEST" 2>/dev/null)
if [ -n "$LATEST" ]; then
  cp -r "$RUN/models/ckpt_$LATEST" "$DEST/ckpt_$LATEST"
  echo "$LATEST" > "$DEST/LATEST"
  for f in best.json run_meta.json; do
    [ -f "$RUN/models/$f" ] && cp "$RUN/models/$f" "$DEST/"
  done
  # agent_best (never-pruned best-eval params) if present
  [ -d "$RUN/models/agent_best" ] && cp -r "$RUN/models/agent_best" "$DEST/agent_best"
  du -sh "$DEST"
else
  echo "WARNING: no LATEST checkpoint found in $RUN/models" >&2
fi
cp "$RUN/logs/metrics.csv" "$DEST/metrics.csv" 2>/dev/null
tail -50 "$RUN/stdout.log" > "$DEST/stdout_tail.txt" 2>/dev/null
echo "harvested: docs/evidence/${NAME}_* and $DEST/"
