"""Shared setup/timing helpers for the A/B and profiling tools.

Every learner-timing tool measures the SAME synthetic workload: a flagship
DreamerConfig with a small replay ring primed with sequence_length + 14
transitions of deterministic data.  Keeping the recipe in one place means
the tools can never silently measure different workloads.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp


def make_trainer_and_buf(donate: bool = True, **runtime_overrides):
    """Flagship-config Trainer + a primed replay ring.

    runtime_overrides are applied to cfg.runtime (e.g. scan_unroll=5,
    fused_scan_grads=False, use_pallas_gru=True).
    """
    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.train import Trainer

    cfg = DreamerConfig()
    cfg = dataclasses.replace(
        cfg,
        # Capacity does not affect update cost; 200k zero-init obs would.
        train=dataclasses.replace(cfg.train, buffer_size=4096),
        runtime=dataclasses.replace(cfg.runtime, **runtime_overrides))
    trainer = Trainer(cfg, donate=donate)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    buf = trainer.buffer.init_state()
    n = cfg.train.sequence_length + 14
    h, w = cfg.wm.obs_size
    obs = (jax.random.uniform(key, (1, n, h, w, 3)) * 255).astype(jnp.uint8)
    buf = trainer.buffer.add_batch(
        buf, obs,
        jax.random.uniform(key, (1, n, 3), minval=-1, maxval=1),
        jnp.sin(jnp.arange(n, dtype=jnp.float32))[None],
        jnp.ones((1, n), jnp.float32))
    return trainer, state, buf, cfg


def time_iterations(trainer, state, buf, iters: int = 10) -> float:
    """ms per train_iteration: one warmup/compile call, then a timed chain
    of `iters` calls with distinct keys, blocked once at the end."""
    state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters * 1000.0


def time_fn(fn, *args, iters: int = 10) -> float:
    """ms per call of an arbitrary device fn (same warmup-then-chain shape)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0
