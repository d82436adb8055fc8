"""Per-component wall-clock breakdown of the flagship learner iteration.

Times each compute stage of the fused iteration as its own jitted program on
the default device (the real TPU under the driver), so optimization effort
goes where the milliseconds are:

  - encoder fwd+bwd           (conv tower over B*T frames)
  - decoder fwd+bwd           (conv-transpose tower over B*T states)
  - posterior scan fwd+bwd    (GRU + posterior MLP + STE sample, T steps)
  - heads fwd+bwd             (prior/reward/continue MLPs over B*T)
  - full WM update
  - imagination scan fwd+bwd  (actor + GRU + prior sample, H steps)
  - full AC update
  - full train_iteration      (2 WM + 2 AC, the bench program)

Usage:  python tools/profile_breakdown.py [--iters 20] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--pallas", action="store_true")
    args = parser.parse_args()

    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.train import Trainer

    cfg = DreamerConfig()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, buffer_size=4096),
        runtime=dataclasses.replace(cfg.runtime, use_pallas_gru=args.pallas))
    trainer = Trainer(cfg, donate=False)
    rssm, agent = trainer.rssm, trainer.agent

    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    B, T, H = cfg.train.batch_size, cfg.train.horizon, cfg.train.horizon
    hw = cfg.wm.obs_size
    obs = jax.random.uniform(key, (B, T, hw[0], hw[1], 3), jnp.float32) - 0.5
    obs_u8 = ((obs + 0.5) * 255).astype(jnp.uint8)
    actions = jax.random.uniform(key, (B, T, 3), minval=-1, maxval=1)
    rewards = jnp.tanh(jax.random.normal(key, (B, T)))
    conts = jnp.ones((B, T), jnp.float32)
    wm_p = state.wm.params

    h_seq = jax.random.normal(key, (B, T, cfg.wm.hidden_dim), jnp.float32)
    z_seq = jax.random.normal(key, (B, T, cfg.wm.latent_dim), jnp.float32)

    results = {}

    # --- encoder fwd / fwd+bwd ---------------------------------------- #
    enc_fwd = jax.jit(lambda p, o: rssm.encode_obs(p, o))
    results["encoder_fwd"] = timeit(enc_fwd, wm_p, obs, iters=args.iters)
    enc_grad = jax.jit(jax.grad(lambda p, o: jnp.sum(
        rssm.encode_obs(p, o).astype(jnp.float32) ** 2)))
    results["encoder_fwd_bwd"] = timeit(enc_grad, wm_p, obs, iters=args.iters)

    # --- decoder ------------------------------------------------------- #
    dec_fwd = jax.jit(lambda p, h, z: rssm.decode(p, h, z))
    results["decoder_fwd"] = timeit(dec_fwd, wm_p, h_seq, z_seq, iters=args.iters)
    dec_grad = jax.jit(jax.grad(lambda p, h, z: jnp.sum(
        rssm.decode(p, h, z).astype(jnp.float32) ** 2)))
    results["decoder_fwd_bwd"] = timeit(dec_grad, wm_p, h_seq, z_seq, iters=args.iters)

    # --- posterior scan (feats precomputed) ----------------------------- #
    feats = enc_fwd(wm_p, obs)

    def scan_loss(p, f, a, k):
        # observe_sequence but consuming precomputed conv feats
        B_, T_ = f.shape[0], f.shape[1]
        a_in = jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
        h0, z0 = rssm.initial_state(B_)
        keys = jax.random.split(k, T_)

        def step(carry, xs):
            h, z = carry
            f_t, a_t, k_t = xs
            h2 = rssm.gru_step(p, z, a_t, h)
            logits = rssm.posterior_logits(p, f_t, h2)
            z2 = rssm._sample(logits, k_t)
            return (h2, z2), (h2, z2, logits)

        xs = (f.swapaxes(0, 1), a_in.swapaxes(0, 1), keys)
        _, (hs, zs, lg) = jax.lax.scan(step, (h0, z0), xs)
        return (jnp.sum(hs.astype(jnp.float32) ** 2)
                + jnp.sum(zs.astype(jnp.float32) ** 2)
                + jnp.sum(lg.astype(jnp.float32) ** 2))

    scan_fwd = jax.jit(scan_loss)
    results["posterior_scan_fwd"] = timeit(scan_fwd, wm_p, feats, actions, key,
                                           iters=args.iters)
    scan_grad = jax.jit(jax.grad(scan_loss))
    results["posterior_scan_fwd_bwd"] = timeit(scan_grad, wm_p, feats, actions,
                                               key, iters=args.iters)

    # --- heads ----------------------------------------------------------- #
    def heads_loss(p, h, z):
        pr = rssm.prior_logits(p, h)
        rw = rssm.reward_logits(p, h, z)
        cn = rssm.cont_logit(p, h, z)
        return (jnp.sum(pr.astype(jnp.float32) ** 2)
                + jnp.sum(rw.astype(jnp.float32) ** 2)
                + jnp.sum(cn.astype(jnp.float32) ** 2))

    results["heads_fwd_bwd"] = timeit(jax.jit(jax.grad(heads_loss)), wm_p,
                                      h_seq, z_seq, iters=args.iters)

    # --- full WM update --------------------------------------------------- #
    from dreamer_tpu.train.world_model import wm_update

    wm_step = jax.jit(lambda s, b, k: wm_update(rssm, trainer.wm_opt, s, b, k, cfg))
    batch = (obs_u8, actions, rewards, conts)
    results["wm_update"] = timeit(wm_step, state.wm, batch, key, iters=args.iters)

    # --- imagination scan --------------------------------------------------- #
    h0 = h_seq[:, 0]
    z0 = z_seq[:, 0]

    def imagine_loss(ap, p, h, z, k):
        actor_fn = agent.actor_fn(ap)
        traj = rssm.imagine(p, actor_fn, z, h, H, k)
        return jnp.sum(traj.reward ** 2) + jnp.sum(traj.h.astype(jnp.float32) ** 2)

    results["imagine_fwd_bwd"] = timeit(
        jax.jit(jax.grad(imagine_loss)), state.ac.actor_params, wm_p, h0, z0,
        key, iters=args.iters)

    # --- full AC update --------------------------------------------------- #
    ac_step = jax.jit(lambda acs, wp, b, k: agent.ac_update(
        trainer.actor_opt, trainer.critic_opt, acs, wp, rssm, b, k))
    results["ac_update"] = timeit(ac_step, state.ac, wm_p, batch, key,
                                  iters=args.iters)

    # --- full iteration --------------------------------------------------- #
    buf = trainer.buffer.init_state()
    n = cfg.train.sequence_length + 14
    buf = trainer.buffer.add_batch(
        buf, obs_u8[:1, :n] if n <= T else
        jnp.tile(obs_u8[:1], (1, (n + T - 1) // T, 1, 1, 1))[:, :n],
        jnp.tile(actions[:1], (1, (n + T - 1) // T, 1))[:, :n],
        jnp.tile(rewards[:1], (1, (n + T - 1) // T))[:, :n],
        jnp.tile(conts[:1], (1, (n + T - 1) // T))[:, :n])
    results["train_iteration"] = timeit(trainer.train_iteration, state, buf,
                                        key, iters=args.iters)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
