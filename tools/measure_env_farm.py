"""Rollout-side throughput of the vectorized env farm at the 64-env config's
scale (BASELINE config 3) — measurable WITHOUT the accelerator: random-policy
stepping through the full wrapper stack (crop/resize/action-map/repeat),
sync EnvFarm vs subprocess AsyncEnvFarm.

    PALLAS_AXON_POOL_IPS= python tools/measure_env_farm.py [--envs 64] [--steps 60]
writes docs/evidence/env_farm_64.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(farm_cls, n_envs, steps, action_repeat):
    from dreamer_tpu.envs.adaptors import make_env

    ctors = [lambda: make_env("CarRacing-v3", action_repeat=action_repeat)
             for _ in range(n_envs)]
    farm = farm_cls(ctors, seed=0)
    farm.reset_all()
    # Warmup (first steps pay Box2D track generation)
    for _ in range(5):
        farm.step(farm.sample_actions())
    t0 = time.perf_counter()
    for _ in range(steps):
        farm.step(farm.sample_actions())
    dt = time.perf_counter() - t0
    if hasattr(farm, "close"):
        farm.close()
    # Each farm.step = 1 agent step = action_repeat raw frames per env.
    return {
        "agent_steps_per_s": n_envs * steps / dt,
        "raw_frames_per_s": n_envs * steps * action_repeat / dt,
        "ms_per_farm_step": dt / steps * 1000,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--action-repeat", type=int, default=4)
    args = ap.parse_args()

    from dreamer_tpu.envs.vector import AsyncEnvFarm, EnvFarm

    out = {"n_envs": args.envs, "steps_timed": args.steps,
           "action_repeat": args.action_repeat,
           "host": "2-core build host (throughput scales with cores; "
                   "per-env cost is the portable number)"}
    for name, cls in (("async_subprocess", AsyncEnvFarm), ("sync", EnvFarm)):
        out[name] = measure(cls, args.envs, args.steps, args.action_repeat)
        print(name, json.dumps(out[name]))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "evidence", "env_farm_64.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
