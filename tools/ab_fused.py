"""A/B the deferred-weight-gradient scans on the chip.

Times train_iteration for {fused, autodiff} x {unroll} and prints JSON.
Variant syntax: <fused|auto>_u<unroll>, e.g. fused_u5 auto_u1.
"""

import argparse
import json

from _bench_common import make_trainer_and_buf, time_iterations


def measure(fused: bool, unroll: int, iters: int) -> float:
    trainer, state, buf, _ = make_trainer_and_buf(
        scan_unroll=unroll, fused_scan_grads=fused)
    return time_iterations(trainer, state, buf, iters)


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
