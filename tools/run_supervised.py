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


def _wait_with_watchdog(proc, watch_file, hang_timeout, started, stop):
    """Wait for the child; with a watch file, kill it and return None if the
    file's mtime stays stale for ``hang_timeout`` seconds.  Staleness is
    measured against max(mtime, child start) so a pre-existing file from the
    previous attempt never counts against the new child, and the child's
    compile window gets the full timeout."""
    import os
    import signal as _signal

    if not watch_file:
        return proc.wait()
    poll_s = min(15.0, max(0.5, hang_timeout / 4.0))
    while True:
        try:
            return proc.wait(timeout=poll_s)
        except subprocess.TimeoutExpired:
            pass
        if stop["requested"]:
            # SIGTERM path: give the graceful checkpoint its own window.
            try:
                return proc.wait(timeout=max(hang_timeout, 300.0))
            except subprocess.TimeoutExpired:
                proc.kill()
                return proc.wait()
        try:
            mtime = os.path.getmtime(watch_file)
        except OSError:
            mtime = 0.0
        freshness = max(mtime, _mono_to_wall(started))
        if time.time() - freshness > hang_timeout:
            # Hung: SIGTERM would land in the same stuck device call; go
            # straight to SIGKILL (the periodic checkpoint is the recovery
            # point — graceful save is impossible from a hung process).
            proc.send_signal(_signal.SIGKILL)
            proc.wait()
            return None


def _mono_to_wall(monotonic_t):
    """Wall-clock time corresponding to a time.monotonic() stamp."""
    return time.time() - (time.monotonic() - monotonic_t)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--max-restarts", type=int, default=10)
    parser.add_argument("--watch-file", default=None,
                        help="hang watchdog: path the trainer touches from its "
                             "main work loop (<log_dir>/heartbeat on process "
                             "0; <log_dir>/heartbeat.procN on process N — "
                             "per-host supervisors of a multi-host run must "
                             "pass their own host's file); if its "
                             "mtime goes stale for --hang-timeout seconds the "
                             "child is killed and relaunched with --resume. "
                             "A hung device call (dropped accelerator tunnel) "
                             "never exits, so exit-code supervision alone "
                             "cannot catch it — observed as a silent 1h stall "
                             "in round 4.")
    parser.add_argument("--hang-timeout", type=float, default=1800.0,
                        help="seconds of heartbeat staleness before the child "
                             "is declared hung (default 30 min — must exceed "
                             "the worst cold-compile window, 9-24 min on the "
                             "remote-compile tunnel)")
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
        rc = _wait_with_watchdog(proc, args.watch_file, args.hang_timeout,
                                 started, stop)
        ran_for = time.monotonic() - started
        if rc is None:
            # Hung child killed by the watchdog: relaunch immediately (the
            # latest checkpoint is intact; the hang wasted enough time).
            print("[supervisor] child hung (stale heartbeat "
                  f"> {args.hang_timeout:.0f}s); killed, resuming", flush=True)
            backoff = 5.0
            continue
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
