"""A/B the scan unroll factor for the fused learner iteration on the chip.

Usage: python tools/ab_unroll.py [--unrolls 1 5 10 30] [--iters 10]
"""

from __future__ import annotations

import argparse
import json

from _bench_common import make_trainer_and_buf, time_iterations


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--unrolls", type=int, nargs="*", default=[1, 5, 10, 30])
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()
    out = {}
    for u in args.unrolls:
        trainer, state, buf, _ = make_trainer_and_buf(scan_unroll=u)
        out[f"unroll_{u}"] = round(time_iterations(trainer, state, buf, args.iters), 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
