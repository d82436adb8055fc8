#!/bin/bash
# BipedalWalkerHardcore smoke leg (BASELINE config 4, single-host variant).
# Goal: prove the SECOND terminating env exercises wm.reset_on_episode_start
# end-to-end on the chip and produces a sane WM loss curve — not a completed
# schedule.  The parity config's 128 envs are a 2-host layout; this host's 2
# cores run 16 (VERDICT r4 scoped the 2-host rollout out of this hardware).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bipedal/logs runs/bipedal/models
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
nohup python tools/run_supervised.py --config configs/bipedal_walker.yaml --max-restarts 20 \
  --watch-file runs/bipedal/logs/heartbeat --hang-timeout 1800 \
  -- --overrides \
     env.num_envs=16 train.batch_size=48 \
     runtime.rollout_device=cpu runtime.async_rollout=true \
     runtime.checkpoint_replay=false runtime.async_checkpoint=true \
     train.random_iterations=50 train.eval_every=100 train.eval_episodes=3 \
     train.checkpoint_every=200 train.resume_prime_iterations=20 \
     runtime.log_dir=runs/bipedal/logs \
     runtime.checkpoint_dir=runs/bipedal/models \
  > runs/bipedal/stdout.log 2>&1 &
echo "supervisor_pid=$!"
