#!/bin/bash
# Round-5 LunarLander leg: RESUME the committed round-4 checkpoint (iter 650,
# trained with wm.reset_on_episode_start=true) and run the schedule out to
# the full 5,000 iterations (the recovery estimate in docs/evidence/README.md;
# round 4 stopped at 650, inside the expected early dip).
# Protocol identical to tools/launch_carracer_r3.sh: replay-less committed
# checkpoint seeding + re-prime on resume + hang watchdog.
#
# Round-5 recipe changes:
#
# (1) env.next_step_autoreset (now in configs/lunar_lander.yaml): terminal
#     transitions become learnable.  The first 1,468 resumed iterations ran
#     without it: wm/cont_ce sat at ~9e-6 (the continue head had literally
#     never seen a continue=0 example), imag_cont_mean ~= 1.0 (dreams never
#     terminated), and the crash/landing +-100 rewards were invisible — the
#     policy crash-looped (done_frac ~2% ~= 100-frame episodes) because
#     crashing was FREE in imagination.
# (2) runtime.traced_nu + agent.nu=3e-3: by iter 1300-1400 the eval had
#     climbed -378 -> -140 but entropy had collapsed 1.15 -> -0.25 and was
#     still falling — the exact rise-then-fade signature of the CarRacing
#     collapse diagnosis, on the same too-weak default nu=3e-4.  Start at
#     3e-3; escalate live via `echo 1e-2 > runs/lunar_r4/logs/nu_override`
#     if the entropy slide continues (no recompile, no restart).
# (3) wm_epochs 2->4, ac_epochs 2->6.  The lunar learner
# iteration costs ~tens of ms on the chip while the 16-env host rollout
# round costs ~4-5 s (2 cores rendering 640 Box2D frames) — the chip idles
# >99% of each iteration.  The dip-recovery estimate that produced the
# 5,000-iteration schedule is denominated in GRADIENT UPDATES (CarRacing
# recovered at ~4.8k updates); tripling AC updates per iteration buys the
# same update count in ~1/3 the host-bound wall-clock for free.  Epoch
# counts are baked into the fused program (lax.scan length), so this is a
# one-time cold compile vs the round-4 program.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/lunar_r4/logs runs/lunar_r4/models
if [ ! -f runs/lunar_r4/models/LATEST ] && [ -f checkpoints/lunar_r4/LATEST ]; then
  cp -r checkpoints/lunar_r4/ckpt_* checkpoints/lunar_r4/LATEST \
        runs/lunar_r4/models/
  for f in best.json kickstart.json run_meta.json; do
    [ -f "checkpoints/lunar_r4/$f" ] && cp "checkpoints/lunar_r4/$f" runs/lunar_r4/models/
  done
  [ -d checkpoints/lunar_r4/agent_best ] && \
    cp -r checkpoints/lunar_r4/agent_best runs/lunar_r4/models/agent_best
  echo "seeded runs/lunar_r4/models from committed checkpoints/lunar_r4"
fi
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
nohup python tools/run_supervised.py --config configs/lunar_lander.yaml --max-restarts 50 \
  --watch-file runs/lunar_r4/logs/heartbeat --hang-timeout 1200 \
  -- --resume --overrides \
     runtime.rollout_device=cpu runtime.async_rollout=true \
     runtime.checkpoint_replay=false runtime.async_checkpoint=true \
     runtime.traced_nu=true agent.nu=3e-3 \
     train.wm_epochs=4 train.ac_epochs=6 \
     train.eval_every=100 train.checkpoint_every=200 \
     train.resume_prime_iterations=50 \
     runtime.log_dir=runs/lunar_r4/logs \
     runtime.checkpoint_dir=runs/lunar_r4/models \
  > runs/lunar_r4/stdout.log 2>&1 &
echo "supervisor_pid=$!"
