"""One-time measurement of the PyTorch reference's learner throughput on this
host, cached to bench_baseline.json for bench.py's vs_baseline ratio.

Runs the reference code IN PLACE from /root/reference (execution only): fills
its replay buffer with synthetic transitions, then times its own
train_world_model() + train_Agent() loop (2 WM + 2 AC epochs at B=50, T=30 —
the same workload bench.py measures for us).

    python tools/measure_reference_baseline.py [--max-seconds 1800] [--iters 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "bench_baseline.json")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-seconds", type=float, default=1800.0)
    parser.add_argument("--iters", type=int, default=2)
    parser.add_argument("--ref-dir", type=str, default="/root/reference")
    parser.add_argument("--fp32", action="store_true",
                        help="neutralise the reference's hard-coded fp16 "
                        "autocast (WorldModel.py:162).  On CPU torch emulates "
                        "fp16 in software (~30x slower than its own fp32), so "
                        "the autocast path wildly understates what the "
                        "reference can do on this host; the fp32 number is "
                        "the FAIR same-hardware baseline for vs_baseline.")
    args = parser.parse_args()

    import numpy as np

    sys.path.insert(0, args.ref_dir)
    import importlib
    import torch
    import yaml

    if args.fp32:
        import contextlib

        torch.autocast = lambda *a, **k: contextlib.nullcontext()

    Dreamer = importlib.import_module("Dreamer").Dreamer
    with open(os.path.join(args.ref_dir, "car_racer_config.yaml")) as f:
        config = yaml.safe_load(f)
    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
    print(f"reference device: {device}")
    agent = Dreamer(config, device=device)
    rs = np.random.RandomState(0)
    for i in range(config["sequence_length"] + 14):
        agent.buffer.add_to_buffer(
            rs.randint(0, 255, size=(3, 64, 64), dtype=np.uint8),
            rs.uniform(-1, 1, 3).astype(np.float32),
            float(np.sin(i)), 1.0)

    # Incremental measurement: time each phase call and write the cache after
    # every sample, so a timeout still leaves a valid (partial) baseline.
    # (On CPU the reference's fp16 autocast makes one WM epoch pair take
    # ~20 min, so full iterations may never finish inside a CI budget.)
    wm_times, ac_times = [], []

    def flush():
        # Each train_world_model()/train_Agent() call runs WM_epochs/AC_epochs
        # gradient updates respectively.
        per_update = []
        if wm_times:
            per_update.append(min(wm_times) / config["WM_epochs"])
        if ac_times:
            per_update.append(min(ac_times) / config["AC_epochs"])
        if not per_update:
            return
        avg_update = sum(per_update) / len(per_update)
        key = ("reference_fp32_grad_updates_per_s" if args.fp32
               else "reference_grad_updates_per_s")
        payload = {}
        if os.path.exists(CACHE):
            with open(CACHE) as f:
                payload = json.load(f)
        payload.update({
            key: 1.0 / avg_update,
            f"{'fp32_' if args.fp32 else ''}wm_call_seconds": wm_times,
            f"{'fp32_' if args.fp32 else ''}ac_call_seconds": ac_times,
            "device": str(device),
            "note": "PyTorch reference (youngers2006/Dreamer) WM/AC update "
                    "timings at B=50 T=30 (car_racer_config.yaml), this host. "
                    "fp32_* = autocast neutralised (fair CPU mode); plain = "
                    "its own fp16-autocast path (software-emulated on CPU).",
        })
        with open(CACHE, "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(payload), flush=True)

    t_start = time.perf_counter()
    for i in range(args.iters + 1):  # first sample doubles as warmup
        t0 = time.perf_counter()
        agent.train_world_model()
        wm_times.append(time.perf_counter() - t0)
        flush()
        t0 = time.perf_counter()
        agent.train_Agent()
        ac_times.append(time.perf_counter() - t0)
        flush()
        if time.perf_counter() - t_start > args.max_seconds:
            break


if __name__ == "__main__":
    main()
