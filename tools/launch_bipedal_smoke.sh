#!/bin/bash
# BipedalWalkerHardcore smoke leg (BASELINE config 4, single-host variant).
# Goal: prove the SECOND terminating env exercises the round-5 terminal
# pipeline end-to-end on the chip — next_step_autoreset farm, firsts ring,
# terminal-inclusive WM loss (falling = -100 terminal) — and produces a sane
# WM loss curve.  NOT a capability run.
#
# Two deviations from configs/bipedal_walker.yaml, both forced by the
# bounded single-chip window and labeled in the harvest:
# - 16 envs (the parity 128 is a 2-host rollout layout; this host has 2
#   cores), as in round-4 planning;
# - lunar-sized RSSM overrides: the 600-wide flagship model costs a
#   ~15-25 min cold compile on the remote-compile tunnel — more than the
#   whole smoke window — while the 300-wide model compiles in ~3 min
#   (measured round 5 on the lunar program).  Env semantics (pixels 64x64,
#   action_dim 4, action_repeat 2, terminal learning) are the config's.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bipedal/logs runs/bipedal/models
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
nohup python tools/run_supervised.py --config configs/bipedal_walker.yaml --max-restarts 20 \
  --watch-file runs/bipedal/logs/heartbeat --hang-timeout 1200 \
  -- --overrides \
     env.num_envs=16 train.batch_size=48 \
     wm.hidden_dim=300 wm.latent_rows=16 wm.latent_classes=16 \
     wm.encoder_filters_1=16 wm.encoder_filters_2=32 wm.encoder_hidden=128 \
     wm.decoder_filters_1=16 wm.decoder_filters_2=32 wm.decoder_hidden=128 \
     wm.dyn_hidden_1=128 wm.dyn_hidden_2=128 wm.rew_hidden_1=128 \
     wm.rew_hidden_2=128 wm.cont_hidden_1=128 wm.cont_hidden_2=128 \
     agent.actor_hidden_1=128 agent.actor_hidden_2=128 \
     agent.critic_hidden_1=128 agent.critic_hidden_2=128 \
     train.sequence_length=40 train.horizon=20 train.buffer_size=160000 \
     runtime.rollout_device=cpu runtime.async_rollout=true \
     runtime.checkpoint_replay=false runtime.async_checkpoint=true \
     runtime.traced_nu=true agent.nu=3e-3 \
     train.random_iterations=30 train.eval_every=50 train.eval_episodes=2 \
     train.checkpoint_every=100 train.resume_prime_iterations=20 \
     runtime.log_dir=runs/bipedal/logs \
     runtime.checkpoint_dir=runs/bipedal/models \
  > runs/bipedal/stdout.log 2>&1 &
echo "supervisor_pid=$!"
