"""Rendered demo episode from a weights-only agent export.

Parity with the reference notebook's demo cell (Results_Graphing.ipynb cell 7:
load ./models/agent.pth, run one rendered episode via Dreamer.Run, print the
return — its committed output is 27.21 on seed 42).  Ours additionally saves
the episode as an animated GIF so the artifact is committable:

    python tools/render_demo.py --config configs/car_racer.yaml \
        --agent runs/carracer_r3/models/agent_best \
        --out docs/evidence/carracer_demo.gif [--seed 42] [--platform cpu]

The policy runs host-side (rollout_device=cpu), so this works with or without
the accelerator — rendering is a host workload anyway.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def save_gif(frames, path: str, step_ms: int = 40, every: int = 1,
             max_frames: int = 300):
    """Animated GIF via Pillow; subsamples to at most max_frames.  The frame
    duration scales by the TOTAL subsample ratio so playback speed matches
    the episode's real time regardless of how many frames were dropped."""
    from PIL import Image

    if not frames:
        raise ValueError(
            "no frames captured — the env's render() returned nothing "
            "(does make_env honor render_mode for this env id?)")
    n_raw = len(frames)
    frames = frames[::every]
    if len(frames) > max_frames:
        idx = np.linspace(0, len(frames) - 1, max_frames).astype(int)
        frames = [frames[i] for i in idx]
    ratio = n_raw / len(frames)
    imgs = [Image.fromarray(np.asarray(f, np.uint8)) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(round(step_ms * ratio)), loop=0, optimize=True)
    return len(imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--agent", required=True, help="weights-only export "
                    "(save_agent / agent_best)")
    ap.add_argument("--out", default="docs/evidence/demo.gif")
    ap.add_argument("--seed", type=int, default=42,
                    help="env seed (the reference demo uses 42)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform, e.g. 'cpu'")
    ap.add_argument("--max-steps", type=int, default=2000)
    ap.add_argument("--every", type=int, default=2,
                    help="keep every Nth rendered frame in the GIF")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.orchestrator import Dreamer

    cfg = DreamerConfig.from_yaml(args.config, overrides=[
        "runtime.rollout_device=cpu",     # policy host-side; render is host work
        "train.buffer_size=1024",         # no training: skip the 2.3 GB ring
        "runtime.mesh_shape=null",
    ])
    dreamer = Dreamer(cfg)
    dreamer.load_agent(args.agent)

    # A dedicated render-enabled env: gym returns frames from env.render()
    # only when constructed with render_mode="rgb_array" (the training env
    # uses the render-skipping fast path instead).
    from dreamer_tpu.envs import make_env

    env = make_env(cfg.env.env_id, obs_size=cfg.wm.obs_size,
                   action_repeat=cfg.env.action_repeat,
                   crop_rows=cfg.env.crop_rows, render_mode="rgb_array")

    frames = []
    total = dreamer.run(env=env, env_seed=args.seed, render=False,
                        max_steps=args.max_steps, frames=frames)
    print(f"Episode return (seed {args.seed}): {total:.2f}  "
          f"[reference notebook cell 7: 27.21]")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    n = save_gif(frames, args.out, every=args.every)
    meta = {
        "agent": args.agent,
        "config": args.config,
        "seed": args.seed,
        "episode_return": round(float(total), 2),
        "reference_notebook_return": 27.21,
        "env_steps": len(frames),
        "gif_frames": n,
    }
    with open(os.path.splitext(args.out)[0] + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {args.out} ({n} frames) + sidecar json")
    return total


if __name__ == "__main__":
    main()
