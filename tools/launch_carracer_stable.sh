#!/bin/bash
# Round-5 stable-config validation leg (VERDICT r4 ask #2): FRESH-START
# configs/car_racer_stable.yaml — the parity flagship + the two deviations the
# completed 525k-env-step run proved necessary (nu=1e-2, min_std=0.1) — and
# run it past the iter-1500..2800 rise-then-fade window the parity nu=3e-4
# config exhibited (docs/evidence/carracer_collapse_diagnosis.md).
# Success = no rise-then-fade, entropy >= -3 throughout the bounded window.
#
# runtime.traced_nu=true (baked into the config) keeps the compiled program
# dose-independent: any further escalation is `echo 3e-2 > runs/car_stable/
# logs/nu_override`, applied next iteration, no recompile/restart.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/car_stable/logs runs/car_stable/models
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
# hang-timeout 1800: the traced-nu flagship-size program is a cold compile
# the first time (9-24 min on the remote-compile tunnel).
nohup python tools/run_supervised.py --config configs/car_racer_stable.yaml --max-restarts 20 \
  --watch-file runs/car_stable/logs/heartbeat --hang-timeout 1800 \
  -- --overrides \
     runtime.rollout_device=cpu runtime.async_rollout=true \
     runtime.checkpoint_replay=false runtime.async_checkpoint=true \
     train.eval_every=250 train.eval_episodes=3 train.checkpoint_every=250 \
     train.resume_prime_iterations=200 \
     runtime.log_dir=runs/car_stable/logs \
     runtime.checkpoint_dir=runs/car_stable/models \
  > runs/car_stable/stdout.log 2>&1 &
echo "supervisor_pid=$!"
