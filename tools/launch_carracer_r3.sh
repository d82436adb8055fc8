#!/bin/bash
# Flagship CarRacing run (BASELINE config 1, full 500+10,000-iter schedule,
# min_std=0.1).  Single-chip protocol: replay-less fast checkpoints every
# 250 iters so the newest one is small enough to COMMIT for cross-round
# resume (the ring costs ~13 min/save over this tunnel and ~2.6 GB per
# checkpoint; resume re-primes instead: train.resume_prime_iterations random
# rounds).  Self-backgrounds; tail runs/carracer_r3/stdout.log.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/carracer_r3/logs runs/carracer_r3/models
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
nohup python tools/run_supervised.py --config configs/car_racer.yaml --max-restarts 50 \
  -- --resume --overrides \
     runtime.rollout_device=cpu runtime.async_rollout=true \
     runtime.checkpoint_replay=false runtime.async_checkpoint=true \
     train.resume_prime_iterations=200 train.checkpoint_every=250 \
     runtime.log_dir=runs/carracer_r3/logs \
     runtime.checkpoint_dir=runs/carracer_r3/models \
  > runs/carracer_r3/stdout.log 2>&1 &
echo "supervisor_pid=$!"
