"""Time wm_step and ac_step separately at given scan-unroll factors."""

import argparse
import json

from _bench_common import make_trainer_and_buf, time_fn

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unrolls", type=int, nargs="*", default=[10])
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    res = {}
    for unroll in args.unrolls:
        t, state, buf, _ = make_trainer_and_buf(donate=False, scan_unroll=unroll)
        key = jax.random.PRNGKey(0)
        res[f"wm_step_u{unroll}"] = round(
            time_fn(t.wm_step, state, buf, key, iters=args.iters), 2)
        print(json.dumps(res), flush=True)
        res[f"ac_step_u{unroll}"] = round(
            time_fn(t.ac_step, state, buf, key, iters=args.iters), 2)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
