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
    args = parser.parse_args()

    import numpy as np

    sys.path.insert(0, args.ref_dir)
    import importlib
    import torch
    import yaml

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

    # Warmup one WM epoch pair so lazy init doesn't pollute timing.
    agent.train_world_model()

    t0 = time.perf_counter()
    iters = 0
    while iters < args.iters and time.perf_counter() - t0 < args.max_seconds:
        agent.train_world_model()
        agent.train_Agent()
        iters += 1
        print(f"iter {iters}: {time.perf_counter() - t0:.1f}s elapsed")
    elapsed = time.perf_counter() - t0
    updates = iters * (config["WM_epochs"] + config["AC_epochs"])
    ups = updates / elapsed
    payload = {
        "reference_grad_updates_per_s": ups,
        "device": str(device),
        "iters_measured": iters,
        "note": "PyTorch reference (youngers2006/Dreamer) 2 WM + 2 AC epochs "
                "at B=50 T=30 (car_racer_config.yaml), measured on this host",
    }
    with open(CACHE, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
