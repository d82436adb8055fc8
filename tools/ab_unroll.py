"""A/B the scan unroll factor for the fused learner iteration on the chip.

Usage: python tools/ab_unroll.py [--unrolls 1 5 10 30] [--iters 10]
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


def measure(unroll: int, iters: int):
    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.train import Trainer

    cfg = DreamerConfig()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, buffer_size=4096),
        runtime=dataclasses.replace(cfg.runtime, scan_unroll=unroll))
    trainer = Trainer(cfg, donate=True)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    buf = trainer.buffer.init_state()
    n = cfg.train.sequence_length + 14
    obs = (jax.random.uniform(key, (1, n, 64, 64, 3)) * 255).astype(jnp.uint8)
    buf = trainer.buffer.add_batch(
        buf, obs,
        jax.random.uniform(key, (1, n, 3), minval=-1, maxval=1),
        jnp.sin(jnp.arange(n, dtype=jnp.float32))[None],
        jnp.ones((1, n), jnp.float32))

    state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--unrolls", type=int, nargs="*", default=[1, 5, 10, 30])
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()
    out = {}
    for u in args.unrolls:
        out[f"unroll_{u}"] = round(measure(u, args.iters), 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
