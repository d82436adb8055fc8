#!/bin/bash
# Bounded LunarLander leg (BASELINE config 2) with the round-4 fixes:
#   - wm.reset_on_episode_start=true (in configs/lunar_lander.yaml): episodes
#     terminate early, so replay windows straddle auto-resets — the diagnosed
#     cause of the rounds-1..3 monotonic decline (-136 -> -411)
#   - min_std=0.1 (since round 3)
# Goal: an IMPROVING eval trend inside a ~1 h window, not the full 5k-iter
# schedule.  eval_every=100 for curve resolution; hang watchdog on.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/lunar_r4/logs runs/lunar_r4/models
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
nohup python tools/run_supervised.py --config configs/lunar_lander.yaml --max-restarts 20 \
  --watch-file runs/lunar_r4/logs/heartbeat --hang-timeout 1800 \
  -- --overrides \
     runtime.rollout_device=cpu runtime.async_rollout=true \
     runtime.checkpoint_replay=false runtime.async_checkpoint=true \
     train.eval_every=100 train.checkpoint_every=200 \
     train.resume_prime_iterations=50 \
     runtime.log_dir=runs/lunar_r4/logs \
     runtime.checkpoint_dir=runs/lunar_r4/models \
  > runs/lunar_r4/stdout.log 2>&1 &
echo "supervisor_pid=$!"
