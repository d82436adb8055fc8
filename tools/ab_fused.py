"""A/B the deferred-weight-gradient scans on the chip.

Times train_iteration for {fused, autodiff} x {unroll} and prints JSON.
"""

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


def measure(fused: bool, unroll: int, iters: int):
    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.train import Trainer

    cfg = DreamerConfig()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, buffer_size=4096),
        runtime=dataclasses.replace(cfg.runtime, scan_unroll=unroll,
                                    fused_scan_grads=fused))
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
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--variants", type=str, nargs="*",
                   default=["fused_u1", "fused_u10"])
    args = p.parse_args()
    out = {}
    for v in args.variants:
        fused = v.startswith("fused")
        unroll = int(v.split("_u")[1])
        out[v] = round(measure(fused, unroll, args.iters), 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
