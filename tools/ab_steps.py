"""Time wm_step and ac_step separately at given scan-unroll factors."""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp

from dreamer_tpu.config import DreamerConfig
from dreamer_tpu.train import Trainer


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--unrolls", type=int, nargs="*", default=[10])
    args = p.parse_args()

    res = {}
    for unroll in args.unrolls:
        cfg = DreamerConfig()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, buffer_size=4096),
            runtime=dataclasses.replace(cfg.runtime, scan_unroll=unroll))
        t = Trainer(cfg, donate=False)
        key = jax.random.PRNGKey(0)
        state = t.init_state(key)
        buf = t.buffer.init_state()
        n = cfg.train.sequence_length + 14
        obs = (jax.random.uniform(key, (1, n, 64, 64, 3)) * 255).astype(jnp.uint8)
        buf = t.buffer.add_batch(
            buf, obs, jax.random.uniform(key, (1, n, 3), minval=-1, maxval=1),
            jnp.sin(jnp.arange(n, dtype=jnp.float32))[None],
            jnp.ones((1, n), jnp.float32))
        res[f"wm_step_u{unroll}"] = round(timeit(t.wm_step, state, buf, key), 2)
        print(json.dumps(res), flush=True)
        res[f"ac_step_u{unroll}"] = round(timeit(t.ac_step, state, buf, key), 2)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
