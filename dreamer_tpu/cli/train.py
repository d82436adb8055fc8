"""CLI entry point (reference: train_car_racer.py:15-63).

    python -m dreamer_tpu.cli.train --config configs/car_racer.yaml \
        [--overrides train.training_iterations=100 env.num_envs=4 ...] \
        [--resume] [--platform cpu]

Accepts both our nested YAML schema and the reference's flat
car_racer_config.yaml unchanged.  Honors SM_MODEL_DIR / SM_OUTPUT_DATA_DIR
like the reference (train_car_racer.py:39,44).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a dreamer_tpu agent")
    parser.add_argument("--config", type=str, required=True,
                        help="Path to YAML config (nested or reference flat schema)")
    parser.add_argument("--overrides", type=str, nargs="*", default=[],
                        help="Dotted config overrides, e.g. train.batch_size=16")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest checkpoint if present")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a jax platform (e.g. 'cpu' for local runs)")
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # Multi-host init BEFORE any other jax call (no-op single-process;
    # auto-detects TPU pods / JAX_COORDINATOR_ADDRESS-style env vars).
    from dreamer_tpu.parallel.distributed import init_distributed, is_primary

    multiprocess = init_distributed()

    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.orchestrator import Dreamer

    cfg = DreamerConfig.from_yaml(args.config, overrides=args.overrides)

    # SageMaker-style output dirs, like the reference.
    model_dir = os.environ.get("SM_MODEL_DIR")
    output_dir = os.environ.get("SM_OUTPUT_DATA_DIR")
    if model_dir:
        cfg = cfg.with_override(f"runtime.checkpoint_dir={model_dir}")
    if output_dir:
        cfg = cfg.with_override(f"runtime.log_dir={output_dir}")

    if cfg.runtime.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if multiprocess and not cfg.runtime.mesh_shape:
        # Default multi-host layout: pure data parallelism over every chip.
        cfg = cfg.with_override(
            f"runtime.mesh_shape=[{len(jax.devices())}, 1]")

    if is_primary():
        print(f"devices: {jax.devices()}")
        if multiprocess:
            print(f"multi-host: {jax.process_count()} processes, "
                  f"process {jax.process_index()}")
    dreamer = Dreamer(cfg, resuming=args.resume)

    # Graceful preemption: SIGTERM checkpoints after the current iteration
    # and exits 0 (zero lost progress; the supervisor sees a clean finish).
    import signal

    signal.signal(signal.SIGTERM, lambda *_: dreamer.request_stop())

    final_reward = dreamer.train(resume=args.resume, progress=is_primary())
    if dreamer.stopped:
        # Graceful preemption: checkpointed mid-schedule, not a completion.
        # Exit EX_TEMPFAIL so a supervisor resumes immediately (exit 0 would
        # read as "training completed" and silently end the schedule).
        if is_primary():
            print(f"Preempted at iter {dreamer.iteration} (checkpointed).")
        raise SystemExit(75)
    if is_primary():
        print(f"Final eval reward: {final_reward:.2f}")
    dreamer.metrics.save_npz()
    return final_reward


if __name__ == "__main__":
    main()
