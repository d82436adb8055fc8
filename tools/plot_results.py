"""Offline results analysis — the script equivalent of the reference's
Results_Graphing.ipynb (SURVEY §2.1): plots the four logged curves from
training_logs.npz and optionally replays a trained agent for one episode.

    python tools/plot_results.py --logs ./logs/training_logs.npz --out curves.png
    python tools/plot_results.py --config configs/car_racer.yaml --episode \
        [--render] [--seed 42]

Loads OUR logs or the reference's (same npz schema).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plot_curves(npz_path: str, out_path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    data = np.load(npz_path)
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    panels = [
        ("world_model_loss", "World model loss"),
        ("actor_loss", "Actor loss"),
        ("critic_loss", "Critic loss"),
        ("rewards", "Eval reward"),
    ]
    for ax, (key, title) in zip(axes.ravel(), panels):
        values = np.asarray(data[key], dtype=np.float32)
        if values.ndim > 1:
            values = values.mean(axis=-1)
        ax.plot(values)
        ax.set_title(title)
        ax.set_xlabel("iteration" if key != "rewards" else "eval #")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


def run_episode(config_path: str, seed: int, render: bool):
    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.orchestrator import Dreamer

    cfg = DreamerConfig.from_yaml(config_path)
    dreamer = Dreamer(cfg)
    if not dreamer.restore_latest():
        print("no checkpoint found in", cfg.runtime.checkpoint_dir)
        return
    total = dreamer.run(env_seed=seed, render=render)
    print(f"episode return: {total:.2f}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logs", type=str, default="./logs/training_logs.npz")
    parser.add_argument("--out", type=str, default="training_curves.png")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--episode", action="store_true")
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    if args.episode:
        assert args.config, "--episode requires --config"
        run_episode(args.config, args.seed, args.render)
    else:
        plot_curves(args.logs, args.out)


if __name__ == "__main__":
    main()
