"""Benchmark: fused learner-iteration throughput at the reference workload.

Measures the flagship CarRacer-parity config (B=50 sequences x T=30 steps,
2 world-model + 2 actor-critic gradient updates per iteration, 9M params,
64x64x3 pixels) running as ONE compiled XLA program per iteration on the
default device (the real TPU chip under the driver).

Headline metric: grad-updates/s (BASELINE.json metric).  ``vs_baseline``
compares against the PyTorch reference implementation executing its own
train_world_model + train_Agent loop on this host (measured once by
tools/measure_reference_baseline.py, cached in bench_baseline.json; the
reference publishes no numbers of its own — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")

# Persistent XLA compilation cache: the flagship program takes minutes to
# compile over the remote-compile tunnel; cache it across bench runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def measure_ours(num_iters: int = 10, use_pallas: bool = False,
                 remat: bool = False, pallas_imagine: bool = False,
                 batch: int = 0):
    import jax
    import jax.numpy as jnp

    from dreamer_tpu.config import DreamerConfig
    import dataclasses

    cfg = DreamerConfig()
    # Full flagship model/batch; small replay capacity (capacity does not
    # affect update cost, and 200k obs = 2.3 GB of pointless zero-init).
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, buffer_size=4096,
                                  batch_size=batch or cfg.train.batch_size),
        runtime=dataclasses.replace(cfg.runtime, use_pallas_gru=use_pallas,
                                    use_pallas_imagine=pallas_imagine,
                                    remat_decoder=remat))
    from dreamer_tpu.train import Trainer

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

    # Warmup/compile.
    state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(1))
    jax.block_until_ready(m)

    # Median of 3 timed windows: the remote-tunnel runtime occasionally
    # mis-reports a single window (observed a 10x-too-fast outlier), and the
    # driver records whatever one line we print.
    times = []
    seed = 2
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(num_iters):
            state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(seed))
            seed += 1
        jax.block_until_ready(m)
        times.append((time.perf_counter() - t0) / num_iters)
    per_iter = sorted(times)[1]

    # One "update" = one optimizer step, matching the orchestrator's counter
    # (orchestrator/dreamer.py): each WM epoch steps the WM optimizer once;
    # each AC epoch steps BOTH the actor and critic optimizers.
    updates_per_iter = cfg.train.wm_epochs + 2 * cfg.train.ac_epochs
    return updates_per_iter / per_iter, per_iter


def get_baseline():
    """Cached reference throughput (tools/measure_reference_baseline.py)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    return None


def unified_ref_updates_per_s(baseline):
    """Reference optimizer-steps/s under the unified counting (one update =
    one optimizer step): each reference iteration runs one train_world_model()
    call (WM_epochs=2 WM steps) + one train_Agent() call (AC_epochs=2 epochs,
    each stepping BOTH the actor and critic optimizers) = 6 steps.  The cache
    stores per-call wall times; prefer the fp32 (fair-CPU) pair."""
    for pfx in ("fp32_", ""):
        wm = baseline.get(f"{pfx}wm_call_seconds")
        ac = baseline.get(f"{pfx}ac_call_seconds")
        if wm and ac:
            return 6.0 / (min(wm) + min(ac))
    return baseline.get("reference_fp32_grad_updates_per_s") or baseline.get(
        "reference_grad_updates_per_s")


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--pallas", action="store_true",
                        help="use the fused Pallas GRU cell")
    parser.add_argument("--pallas-imagine", action="store_true",
                        help="whole-rollout Pallas imagination forward")
    parser.add_argument("--batch", type=int, default=0,
                        help="override train.batch_size")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize conv towers in backward")
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    ours, iter_seconds = measure_ours(args.iters, use_pallas=args.pallas,
                                      remat=args.remat,
                                      pallas_imagine=args.pallas_imagine,
                                      batch=args.batch)
    baseline = get_baseline() or {}
    # Fair baseline: the torch reference in fp32 on this host's CPU (its own
    # hard-coded fp16 autocast is software-emulated on CPU — ~30x slower than
    # the same code in fp32 — so that path is kept only as a footnote in
    # bench_baseline.json).  No reference GPU is available; the remaining
    # hardware asymmetry (TPU vs host CPU) is stated in the unit string.
    ref = unified_ref_updates_per_s(baseline) if baseline else None
    vs = ours / ref if ref else 1.0
    bsz = args.batch or 50
    print(json.dumps({
        "metric": "grad_updates_per_s",
        "value": round(ours, 3),
        "unit": f"optimizer-steps/s (B={bsz},T=30; 6 steps/iter = 2 WM + "
                "2 AC epochs, each AC epoch steps actor+critic; iter="
                f"{iter_seconds*1000:.0f}ms; vs torch-ref fp32 on host CPU "
                "— no reference GPU available)",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
