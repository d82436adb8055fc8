"""Failure detection / elastic recovery wrapper (SURVEY §5: the reference
loses up to 1000 iterations on a crash; our checkpoints capture everything).

Runs the trainer as a subprocess and relaunches it with ``--resume`` on any
non-zero exit, with exponential backoff, until it completes or the retry
budget is exhausted:

    python tools/run_supervised.py --config configs/car_racer.yaml \
        [--max-restarts 10] [-- <extra cli args...>]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--max-restarts", type=int, default=10)
    parser.add_argument("rest", nargs=argparse.REMAINDER,
                        help="extra args passed to dreamer_tpu.cli.train")
    args = parser.parse_args()

    extra = [a for a in args.rest if a != "--"]
    backoff = 5.0
    # SIGTERM to the supervisor = stop the whole run cleanly: forward it to
    # the child (which checkpoints and exits 75, cli/train.py) and do NOT
    # relaunch.  A child-only SIGTERM (e.g. cluster preemption of one
    # process) instead resumes immediately: exit 75 = EX_TEMPFAIL.
    import signal

    stop = {"requested": False, "child": None}

    def _on_term(signum, frame):
        stop["requested"] = True
        if stop["child"] is not None and stop["child"].poll() is None:
            stop["child"].send_signal(signal.SIGTERM)

    signal.signal(signal.SIGTERM, _on_term)

    for attempt in range(args.max_restarts + 1):
        cmd = [sys.executable, "-m", "dreamer_tpu.cli.train",
               "--config", args.config]
        if attempt > 0 and "--resume" not in extra:
            cmd.append("--resume")
        cmd += extra
        print(f"[supervisor] attempt {attempt}: {' '.join(cmd)}", flush=True)
        started = time.monotonic()
        proc = subprocess.Popen(cmd)
        stop["child"] = proc
        rc = proc.wait()
        ran_for = time.monotonic() - started
        if rc == 0:
            print("[supervisor] training completed", flush=True)
            return 0
        if stop["requested"]:
            print(f"[supervisor] stopped by SIGTERM (child exit {rc}, "
                  "checkpointed)", flush=True)
            return 0
        if rc == 75:
            print("[supervisor] child preempted (checkpointed); resuming "
                  "immediately", flush=True)
            continue
        if ran_for > 600.0:
            # The child trained for a while before dying (transient failure,
            # e.g. an accelerator-tunnel drop) — restart promptly instead of
            # inheriting a backoff accumulated by earlier fast crashes.
            backoff = 5.0
        print(f"[supervisor] exit code {rc}; restarting in "
              f"{backoff:.0f}s (resume from latest checkpoint)", flush=True)
        time.sleep(backoff)
        if stop["requested"]:
            print("[supervisor] stopped by SIGTERM during backoff", flush=True)
            return 0
        backoff = min(backoff * 2, 300.0)
    print("[supervisor] retry budget exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
