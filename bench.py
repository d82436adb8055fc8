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
                 batch: int = 0, cfg_path: str = "", with_cost: bool = False):
    import jax
    import jax.numpy as jnp

    from dreamer_tpu.config import DreamerConfig
    import dataclasses

    cfg = DreamerConfig.from_yaml(cfg_path) if cfg_path else DreamerConfig()
    # Full model shapes from the config; small replay capacity and a 1-env
    # ring (capacity/farm size do not affect update cost, and 200k obs =
    # 2.3 GB of pointless zero-init).  Single-chip: clear any mesh plan.
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, buffer_size=4096,
                                  batch_size=batch or cfg.train.batch_size),
        env=dataclasses.replace(cfg.env, num_envs=1),
        runtime=dataclasses.replace(cfg.runtime, use_pallas_gru=use_pallas,
                                    use_pallas_imagine=pallas_imagine,
                                    remat_decoder=remat, mesh_shape=None,
                                    rollout_device="default",
                                    async_rollout=False))
    from dreamer_tpu.train import Trainer

    trainer = Trainer(cfg, donate=True)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    buf = trainer.buffer.init_state()
    n = cfg.train.sequence_length + 14
    h, w = cfg.wm.obs_size
    adim = cfg.env.action_dim
    obs = (jax.random.uniform(key, (1, n, h, w, 3)) * 255).astype(jnp.uint8)
    buf = trainer.buffer.add_batch(
        buf, obs,
        jax.random.uniform(key, (1, n, adim), minval=-1, maxval=1),
        jnp.sin(jnp.arange(n, dtype=jnp.float32))[None],
        jnp.ones((1, n), jnp.float32))

    cost = None
    if with_cost:
        # XLA cost analysis of the whole fused iteration: FLOPs + HBM bytes
        # give arithmetic intensity and, with the measured wall time,
        # sustained %HBM-bandwidth and %bf16-peak (PERFORMANCE.md roofline).
        # Lower through the SAME jitted (donating) callable the timing loop
        # uses — a fresh jax.jit here would have different aliasing options
        # and force a second full compile per sweep point (minutes each over
        # the remote-compile tunnel).
        try:
            ca = (trainer.train_iteration
                  .lower(state, buf, jax.random.PRNGKey(1))
                  .compile().cost_analysis())
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            cost = {"gflop": ca.get("flops", 0.0) / 1e9,
                    "gbytes": ca.get("bytes accessed", 0.0) / 1e9}
        except Exception:
            cost = None

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
    resolved = {"batch": cfg.train.batch_size,
                "seq_t": cfg.train.horizon,
                "wm_epochs": cfg.train.wm_epochs,
                "ac_epochs": cfg.train.ac_epochs}
    return updates_per_iter / per_iter, per_iter, cost, resolved


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
    parser.add_argument("--config", type=str, default="",
                        help="bench the model/train shapes of this YAML "
                             "config (e.g. configs/drone.yaml) instead of "
                             "the flagship defaults")
    parser.add_argument("--sweep", type=str, default="",
                        help="comma-separated batch sizes; prints one JSON "
                             "row per point with XLA cost analysis "
                             "(HBM%%/MXU%% at v5e peaks) — not the driver's "
                             "single-line contract")
    args = parser.parse_args()

    if args.sweep:
        # v5e single-chip peaks: ~819 GB/s HBM, ~197 TFLOP/s bf16.
        HBM_GBPS, BF16_TFLOPS = 819.0, 197.0
        for b in [int(x) for x in args.sweep.split(",")]:
            ups, it_s, cost, resolved = measure_ours(
                args.iters, use_pallas=args.pallas, remat=args.remat,
                pallas_imagine=args.pallas_imagine, batch=b,
                cfg_path=args.config, with_cost=True)
            row = {"config": args.config or "configs/car_racer.yaml(defaults)",
                   **resolved,
                   "pallas_gru": bool(args.pallas),
                   "pallas_imagine": bool(args.pallas_imagine),
                   "grad_updates_per_s": round(ups, 2),
                   "iter_ms": round(it_s * 1000, 1)}
            if cost:
                row.update({
                    "gflop_per_iter": round(cost["gflop"], 1),
                    "gbytes_per_iter": round(cost["gbytes"], 1),
                    "hbm_pct": round(100 * cost["gbytes"] / it_s / HBM_GBPS, 1),
                    "mxu_pct": round(100 * cost["gflop"] / 1e3 / it_s
                                     / BF16_TFLOPS, 1)})
            print(json.dumps(row), flush=True)
        return

    ours, iter_seconds, _, resolved = measure_ours(
        args.iters, use_pallas=args.pallas, remat=args.remat,
        pallas_imagine=args.pallas_imagine, batch=args.batch,
        cfg_path=args.config)
    baseline = get_baseline() or {}
    # Fair baseline: the torch reference in fp32 on this host's CPU (its own
    # hard-coded fp16 autocast is software-emulated on CPU — ~30x slower than
    # the same code in fp32 — so that path is kept only as a footnote in
    # bench_baseline.json).  No reference GPU is available; the remaining
    # hardware asymmetry (TPU vs host CPU) is stated in the unit string.
    ref = unified_ref_updates_per_s(baseline) if baseline else None
    vs = ours / ref if ref else 1.0
    n_up = resolved["wm_epochs"] + 2 * resolved["ac_epochs"]
    print(json.dumps({
        "metric": "grad_updates_per_s",
        "value": round(ours, 3),
        "unit": f"optimizer-steps/s (B={resolved['batch']},"
                f"T={resolved['seq_t']}; {n_up} steps/iter = "
                f"{resolved['wm_epochs']} WM + {resolved['ac_epochs']} AC "
                "epochs, each AC epoch steps actor+critic; iter="
                f"{iter_seconds*1000:.0f}ms; vs torch-ref fp32 on host CPU "
                "— no reference GPU available)",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
