"""Per-op TPU profile of the fused learner iteration.

Traces a few train_iterations with jax.profiler, then parses the xplane via
tensorboard_plugin_profile into a ranked table of HLO-op self-times, so
optimization targets the ops that actually burn microseconds (cost-analysis
and hand-timing disagree on this chip — see tools/bisect_wm.py).

Usage: python tools/xprof_summary.py [--iters 5] [--top 40]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp


def trace_iterations(logdir: str, iters: int, unroll: int):
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

    with jax.profiler.trace(logdir):
        for i in range(iters):
            state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(m)


def summarize(logdir: str, top: int):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found under", logdir)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(paths, key=os.path.getmtime)], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "ignore")
    try:
        parsed = json.loads(data)
    except Exception:
        out = os.path.join(logdir, "op_stats_raw.txt")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else repr(data))
        print("wrote raw tool data to", out)
        return
    # framework_op_stats rows: list of dicts with 'occurrences','totalSelfTimeUs' etc.
    rows = parsed if isinstance(parsed, list) else parsed.get("data", parsed)
    print(json.dumps(rows[:top] if isinstance(rows, list) else rows, indent=1)[:8000])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--unroll", type=int, default=10)
    parser.add_argument("--logdir", type=str, default="/tmp/xprof_iter")
    parser.add_argument("--parse-only", action="store_true")
    args = parser.parse_args()
    if not args.parse_only:
        trace_iterations(args.logdir, args.iters, args.unroll)
    summarize(args.logdir, args.top)


if __name__ == "__main__":
    main()
