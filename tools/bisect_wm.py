"""Bisect the world-model update's wall-clock on the real chip.

Times progressively larger slices of the wm_update pipeline plus XLA
cost-analysis (FLOPs / bytes) per slice to locate where the milliseconds go
(tools/profile_breakdown.py showed parts summing to ~1.2 ms but the fused
update at 13.5 ms).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def cost(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return {"gflop": round(c.get("flops", 0) / 1e9, 1),
                "gb": round(c.get("bytes accessed", 0) / 1e9, 3)}
    except Exception as e:  # noqa
        return {"err": str(e)[:80]}


def main():
    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.train import Trainer
    from dreamer_tpu.train.world_model import wm_loss, wm_update

    cfg = DreamerConfig()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, buffer_size=4096))
    trainer = Trainer(cfg, donate=False)
    rssm = trainer.rssm

    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    B, T = cfg.train.batch_size, cfg.train.horizon
    hw = cfg.wm.obs_size
    obs_u8 = (jax.random.uniform(key, (B, T, hw[0], hw[1], 3)) * 255).astype(jnp.uint8)
    actions = jax.random.uniform(key, (B, T, 3), minval=-1, maxval=1)
    rewards = jnp.tanh(jax.random.normal(key, (B, T)))
    conts = jnp.ones((B, T), jnp.float32)
    p = state.wm.params

    results = {}

    loss_fn = lambda pp: wm_loss(rssm, pp, obs_u8, actions, rewards, conts,
                                 key, cfg)[0]
    f_fwd = jax.jit(loss_fn)
    results["loss_fwd"] = {"ms": timeit(f_fwd, p), **cost(loss_fn, p)}

    f_grad = jax.jit(jax.grad(loss_fn))
    results["loss_grad"] = {"ms": timeit(f_grad, p), **cost(jax.grad(loss_fn), p)}

    # opt step alone
    grads = f_grad(p)

    def opt_only(g, s, pp):
        u, no = trainer.wm_opt.update(g, s, pp)
        import optax
        return optax.apply_updates(pp, u), no

    results["opt_step"] = {"ms": timeit(jax.jit(opt_only), grads, state.wm.opt_state, p),
                           **cost(opt_only, grads, state.wm.opt_state, p)}

    # full update
    upd = jax.jit(lambda s, b, k: wm_update(rssm, trainer.wm_opt, s, b, k, cfg))
    batch = (obs_u8, actions, rewards, conts)
    results["wm_update_full"] = {
        "ms": timeit(upd, state.wm, batch, key),
        **cost(lambda s, b, k: wm_update(rssm, trainer.wm_opt, s, b, k, cfg),
               state.wm, batch, key)}

    # loss variants: drop terms to find the heavy one
    from dreamer_tpu.train.world_model import wm_loss_terms

    def partial_loss(pp, which):
        H = cfg.train.horizon
        obs = obs_u8.astype(jnp.float32) / 255.0 - 0.5
        o, a = obs[:, :H], actions[:, :H]
        r, c = rewards[:, :H], conts[:, :H]
        seq = rssm.observe_sequence(pp, o, a, key)
        if which == "scan_only":
            return (jnp.sum(seq.h ** 2) + jnp.sum(seq.z ** 2)
                    + jnp.sum(seq.post_logits.astype(jnp.float32) ** 2))
        if which == "no_decoder":
            prior = rssm.prior_logits(pp, seq.h)
            rew = rssm.reward_logits(pp, seq.h[:, 1:], seq.z[:, 1:])
            cn = rssm.cont_logit(pp, seq.h[:, 1:], seq.z[:, 1:])
            return (jnp.sum(prior.astype(jnp.float32) ** 2)
                    + jnp.sum(rew.astype(jnp.float32) ** 2)
                    + jnp.sum(cn.astype(jnp.float32) ** 2)
                    + jnp.sum(seq.h ** 2))
        if which == "decoder_only":
            dec = rssm.decode(pp, seq.h, seq.z)
            return jnp.sum((dec.astype(jnp.float32) - o) ** 2)
        raise ValueError(which)

    for which in ["scan_only", "no_decoder", "decoder_only"]:
        g = jax.grad(lambda pp: partial_loss(pp, which))
        results[f"grad_{which}"] = {"ms": timeit(jax.jit(g), p), **cost(g, p)}

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
