"""Compile + equivalence + timing check for ops/imagine_pallas on the current
default device (real TPU under axon; CPU runs use interpret-mode semantics
via JAX_PLATFORMS=cpu + the kernel's plain-JAX math).

    python tools/try_imagine_pallas.py [--dtype bfloat16] [--horizon 30] [--b 50]

Compares the Pallas whole-imagination kernel against the XLA fused scan
(ops/fused_scans.imagine_scan) at flagship CarRacer shapes: forward outputs
must match within bf16 rounding (latent one-hots exactly), and reports
per-call timings for both.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--b", type=int, default=50)
    p.add_argument("--hidden", type=int, default=0,
                   help="override wm.hidden_dim (e.g. 512 so f32 weights fit VMEM)")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import dataclasses

    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.rssm import RSSM
    from dreamer_tpu.train.agent import AgentTrainer
    from dreamer_tpu.ops.fused_scans import _ImagineCfg, imagine_scan
    from dreamer_tpu.ops.imagine_pallas import imagine_rollout_pallas

    cfg = DreamerConfig()
    if args.hidden:
        cfg = dataclasses.replace(cfg, wm=dataclasses.replace(
            cfg.wm, hidden_dim=args.hidden))
    dtype = jnp.dtype(args.dtype)
    rssm = RSSM(cfg.wm, action_dim=cfg.env.action_dim, dtype=dtype,
                fused_scan_grads=True)
    params = rssm.init_params(jax.random.PRNGKey(0))
    agent = AgentTrainer(cfg, dtype=dtype)
    actor_params, _ = agent.init_params(jax.random.PRNGKey(1),
                                        cfg.wm.hidden_dim, cfg.wm.latent_dim)
    B, T = args.b, args.horizon
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.wm.hidden_dim), jnp.float32)
    z0 = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.wm.latent_dim), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(4),
                            (T, B, cfg.env.action_dim), jnp.float32)
    gum = jax.random.gumbel(jax.random.PRNGKey(5),
                            (T, B, cfg.wm.latent_rows, cfg.wm.latent_classes),
                            jnp.float32)

    icfg = _ImagineCfg(horizon=T, unimix=cfg.wm.unimix,
                       latent_dim=cfg.wm.latent_dim, rows=cfg.wm.latent_rows,
                       classes=cfg.wm.latent_classes, dtype=dtype, unroll=5,
                       min_std=cfg.agent.min_std)
    sub = {"gru": params["gru"], "dyn": params["dyn_head"],
           "actor": actor_params}

    xla_fn = jax.jit(lambda s, h, z, e, g: imagine_scan(icfg, s, h, z, e, g))
    pal_fn = jax.jit(lambda s, h, z, e, g: imagine_rollout_pallas(
        s, h, z, e, g, rows=cfg.wm.latent_rows, classes=cfg.wm.latent_classes,
        unimix=cfg.wm.unimix, min_std=cfg.agent.min_std, dtype=dtype))

    t0 = time.perf_counter()
    a = jax.block_until_ready(xla_fn(sub, h0, z0, eps, gum))
    print(f"xla compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    b = jax.block_until_ready(pal_fn(sub, h0, z0, eps, gum))
    print(f"pallas compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

    names = ["h_fin", "z_fin", "h_seq", "z_seq", "a_seq", "mu_seq", "sig_seq"]
    z_exact = bool(jnp.array_equal(a[3], b[3]))
    print(f"z_seq identical: {z_exact}")
    for name, x, y in zip(names, a, b):
        x, y = np.asarray(x, np.float32), np.asarray(y, np.float32)
        err = np.max(np.abs(x - y)) / (np.max(np.abs(x)) + 1e-9)
        print(f"  {name:8s} rel-max-err {err:.3e}")

    def bench(fn):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fn(sub, h0, z0, eps, gum)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / args.iters)
        return sorted(times)[1]

    tx, tp = bench(xla_fn), bench(pal_fn)
    print(f"forward per-call: xla {tx*1e3:.2f} ms | pallas {tp*1e3:.2f} ms "
          f"| speedup {tx/tp:.2f}x")


if __name__ == "__main__":
    main()
