#!/bin/bash
# Bounded 64-env CarRacing leg (BASELINE config 3) — the first on-chip run of
# the B=128 learner shape + 64-env async farm together (round 4 measured only
# the host-side farm: docs/evidence/env_farm_64.json, 130 agent-steps/s on
# this 2-core host).
#
# Host-bound reality check: one rollout round = 50 steps x 64 envs = 3,200
# agent-steps ~= 25 s on this host's farm, so the parity kickstart
# (random_iterations=200 ~= 80 min) would eat the whole bounded window —
# trimmed to 30 rounds (96k transitions of priming).  This leg's goals are
# (a) the 64-env pipeline end-to-end on the chip, (b) learner-iteration
# timing at B=128 (PERFORMANCE.md row), (c) the first bounded stretch of the
# training curve; it is NOT a completed schedule.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/car64/logs runs/car64/models
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
# hang-timeout 1800: B=128 fused program is a COLD compile (9-24 min) —
# the watchdog must not kill the child mid-compile.
# train.buffer_size=200000: the parity 512k ring is ~6.3 GB of uint8 obs and
# the ring-write scatter currently compiles with ~11.8 GB of temporaries —
# past the 16 GB v5e HBM (measured OOM, round 5).  200k matches the flagship
# ring and changes nothing about this leg's goals (pipeline + timing).
# Proper fix tracked: contiguous dynamic-update-slice ring writes.
nohup python tools/run_supervised.py --config configs/car_racer_64env.yaml --max-restarts 20 \
  --watch-file runs/car64/logs/heartbeat --hang-timeout 1800 \
  -- --overrides \
     train.buffer_size=204800 \
     runtime.async_rollout=true runtime.checkpoint_replay=false \
     runtime.async_checkpoint=true runtime.traced_nu=true \
     agent.nu=1e-2 \
     train.random_iterations=30 train.eval_every=50 train.eval_episodes=3 \
     train.checkpoint_every=100 train.resume_prime_iterations=10 \
     runtime.log_dir=runs/car64/logs \
     runtime.checkpoint_dir=runs/car64/models \
  > runs/car64/stdout.log 2>&1 &
echo "supervisor_pid=$!"
