"""Collect training-run evidence into docs/evidence/ (committed, unlike the
gitignored runs/): curves PNG, eval table, and a summary markdown.

    python tools/harvest_evidence.py --run runs/carracer --name carracer
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True, help="run dir containing logs/")
    parser.add_argument("--name", required=True)
    parser.add_argument("--out", default="docs/evidence")
    parser.add_argument("--env-steps-per-iter", type=int, default=50,
                        help="sequence_length * num_envs of the run's config "
                             "(default matches the single-env CarRacer config)")
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    logs = os.path.join(args.run, "logs")

    from tools.plot_results import plot_curves

    # A supervised run's restarts rotate per-leg files (metrics.leg1.csv,
    # training_logs.leg1.npz, ...; utils/metrics.py) — concatenate legs in
    # order, current file last, so the harvested curve covers the WHOLE run.
    def leg_files(base, ext):
        import re

        out = []
        for f in os.listdir(logs):
            m = re.fullmatch(re.escape(base) + r"\.leg(\d+)" + re.escape(ext), f)
            if m:
                out.append((int(m.group(1)), os.path.join(logs, f)))
        out.sort()
        cur = os.path.join(logs, base + ext)
        return [p for _, p in out] + ([cur] if os.path.exists(cur) else [])

    npz_files = leg_files("training_logs", ".npz")
    npz = os.path.join(logs, "training_logs.npz")
    if len(npz_files) > 1:
        merged = {}
        for p in npz_files:
            d = np.load(p)
            for k in d.files:
                arr = np.asarray(d[k])
                merged.setdefault(k, []).append(arr)
        npz = os.path.join(logs, "training_logs_merged.npz")
        np.savez(npz, **{k: np.concatenate(v, axis=0)
                         for k, v in merged.items()})
    png = os.path.join(args.out, f"{args.name}_curves.png")
    plot_curves(npz, png)

    data = np.load(npz)
    rows = []
    for p in leg_files("metrics", ".csv"):
        rows.extend(csv.DictReader(open(p)))
    eval_rows = [(int(r["iteration"]), float(r["eval/mean_reward"]))
                 for r in rows if r.get("eval/mean_reward")]
    train_rows = [r for r in rows if r.get("rollout/reward_mean")]
    # wall_time restarts at 0 each leg; total wall = sum of per-segment maxima
    # (a drop between consecutive rows marks a leg boundary).
    wall_hours, seg_max = 0.0, 0.0
    for r in rows:
        if not r.get("wall_time"):
            continue
        w = float(r["wall_time"])
        if w < seg_max:
            wall_hours += seg_max
            seg_max = 0.0
        seg_max = max(seg_max, w)
    wall_hours = (wall_hours + seg_max) / 3600

    summary = {
        "name": args.name,
        "iterations": int(train_rows[-1]["iteration"]) if train_rows else 0,
        "env_steps": (int(train_rows[-1]["iteration"]) if train_rows else 0)
                     * args.env_steps_per_iter,
        "wall_hours": round(wall_hours, 2),
        "eval_curve": eval_rows,
        "final_wm_loss": float(train_rows[-1]["wm/loss"]) if train_rows else None,
        "npz_keys": {k: list(np.asarray(data[k]).shape) for k in data.files},
    }
    # Policy-entropy health: the round-1 collapse showed as entropy falling
    # monotonically to ~-7 (sigma pinned at the reference's 1e-3 floor).
    # Record window means so collapse-freedom is checkable from the summary.
    ent = np.array([float(r["ac/entropy"]) for r in train_rows
                    if r.get("ac/entropy")])
    if ent.size:
        w = max(1, ent.size // 10)
        summary["entropy_windows"] = {
            "first": round(float(ent[:w].mean()), 3),
            "mid": round(float(ent[ent.size // 2 - w // 2:
                                   ent.size // 2 + w // 2 + 1].mean()), 3),
            "last": round(float(ent[-w:].mean()), 3),
            "min": round(float(ent.min()), 3),
        }
    # Reproducibility passthrough (run_meta.json is written by the
    # orchestrator since round 3).
    meta_path = os.path.join(logs, "run_meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        summary["git_sha"] = meta.get("git_sha")
        summary["config_overrides_source"] = meta.get("argv")
    with open(os.path.join(args.out, f"{args.name}_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    # keep the raw npz alongside for reproducibility
    import shutil

    shutil.copy(npz, os.path.join(args.out, f"{args.name}_training_logs.npz"))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
