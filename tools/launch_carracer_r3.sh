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
# Cross-round resume: if the gitignored run dir has no checkpoint (fresh
# host), seed it from the COMMITTED harvest — including best.json/agent_best
# (without them best_eval re-inits to -inf and the first post-resume eval
# would overwrite the committed best policy with a possibly worse one) and
# kickstart.json (kickstart-progress sidecar).
if [ ! -f runs/carracer_r3/models/LATEST ] && [ -f checkpoints/carracer_r3/LATEST ]; then
  cp -r checkpoints/carracer_r3/ckpt_* checkpoints/carracer_r3/LATEST \
        runs/carracer_r3/models/
  for f in best.json kickstart.json run_meta.json; do
    [ -f "checkpoints/carracer_r3/$f" ] && cp "checkpoints/carracer_r3/$f" runs/carracer_r3/models/
  done
  [ -d checkpoints/carracer_r3/agent_best ] && \
    cp -r checkpoints/carracer_r3/agent_best runs/carracer_r3/models/agent_best
  echo "seeded runs/carracer_r3/models from committed checkpoints/carracer_r3"
fi
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
# --watch-file: hang watchdog (round 4: a dropped tunnel call silently
# stalled the run 1h+; exit-code supervision alone cannot catch a hang).
# eval_every=250: finer curve around the collapse-question regime.
nohup python tools/run_supervised.py --config configs/car_racer.yaml --max-restarts 50 \
  --watch-file runs/carracer_r3/logs/heartbeat --hang-timeout 1800 \
  -- --resume --overrides \
     runtime.rollout_device=cpu runtime.async_rollout=true \
     runtime.checkpoint_replay=false runtime.async_checkpoint=true \
     train.resume_prime_iterations=200 train.checkpoint_every=250 \
     train.eval_every=250 agent.nu=1e-2 train.eval_episodes=5 \
     runtime.log_dir=runs/carracer_r3/logs \
     runtime.checkpoint_dir=runs/carracer_r3/models \
  > runs/carracer_r3/stdout.log 2>&1 &
echo "supervisor_pid=$!"
