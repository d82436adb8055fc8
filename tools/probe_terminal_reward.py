"""Probe: does the reward head predict the terminal reward at crash frames?

Loads a checkpoint's WM params (CPU), runs real env episodes with the stored
actor (stochastic), and at every terminal transition compares the env's
reward with the reward head's prediction at the post-observation latent —
the exact (latent, target) pairing the env.next_step_autoreset loss trains.

    python tools/probe_terminal_reward.py --config configs/lunar_lander.yaml \
        --ckpt runs/lunar_r4/models [--episodes 3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--max-steps", type=int, default=400)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.envs.adaptors import make_env
    from dreamer_tpu.orchestrator.dreamer import Dreamer

    cfg = DreamerConfig.from_yaml(args.config, overrides=[
        f"runtime.checkpoint_dir={args.ckpt}",
        "runtime.log_dir=/tmp/probe_logs",
        "runtime.rollout_device=cpu",
        "env.num_envs=1",
    ])
    d = Dreamer(cfg)
    assert d.restore_latest(), f"no checkpoint under {args.ckpt}"
    print(f"restored iteration {d.iteration}")
    t = d.trainer
    wm_p = d.state.wm.params
    actor_p = d.state.ac.actor_params

    env = make_env(cfg.env.env_id, obs_size=cfg.wm.obs_size,
                   action_repeat=cfg.env.action_repeat,
                   crop_rows=cfg.env.crop_rows)
    key = jax.random.PRNGKey(123)

    def pred_reward(h, z):
        from dreamer_tpu.core.math import twohot_expectation
        logits = t.rssm.reward_logits(wm_p, h, z)
        # twohot_expectation applies symexp internally (core/math.py:91-100).
        return float(twohot_expectation(
            logits.astype(jnp.float32), t.rssm.buckets).squeeze())

    def pred_cont(h, z):
        logit = t.rssm.cont_logit(wm_p, h, z)
        return float(jax.nn.sigmoid(logit.astype(jnp.float32)).squeeze())

    rows = []
    for ep in range(args.episodes):
        obs, _ = env.reset(seed=1000 + ep)
        obs = np.asarray(obs, np.uint8)[None]
        key, k = jax.random.split(key)
        h, z = t.policy_reset(wm_p, obs, k)
        for step in range(args.max_steps):
            key, k1, k2 = jax.random.split(key, 3)
            action = t.policy_act(actor_p, h, z, k1, deterministic=False)
            obs_next, r, term, trunc, _ = env.step(np.asarray(action)[0])
            obs_next = np.asarray(obs_next, np.uint8)[None]
            # Posterior latent AFTER observing the arrived-at frame — for a
            # terminal step this is the crash/landing frame itself (the
            # next_step_autoreset pairing).
            z, h = t.policy_observe(wm_p, z, h, action, obs_next, k2)
            if term or trunc:
                rows.append((ep, step, float(r), pred_reward(h, z),
                             pred_cont(h, z)))
                break
            if step % 25 == 0:
                rows.append((ep, step, float(r), pred_reward(h, z),
                             pred_cont(h, z)))
    env.close()

    print(f"{'ep':>3} {'step':>5} {'env_r':>9} {'pred_r':>9} {'pred_cont':>9}")
    for ep, step, r, pr, pc in rows:
        tag = "  <-- TERMINAL" if (ep, step) in [(e, s) for e, s, *_ in rows
                                                 if (e, s) == (ep, step) and
                                                 s == max(s2 for e2, s2, *_ in rows
                                                          if e2 == ep)] else ""
        print(f"{ep:>3} {step:>5} {r:>9.2f} {pr:>9.2f} {pc:>9.3f}{tag}")


if __name__ == "__main__":
    main()
