"""Per-op TPU profile of the fused learner iteration.

Traces a few train_iterations with jax.profiler, then parses the xplane via
tensorboard_plugin_profile into a ranked table of HLO-op self-times, so
optimization targets the ops that actually burn microseconds (cost-analysis
and hand-timing disagree on this chip — see tools/bisect_wm.py).

Usage: python tools/xprof_summary.py [--iters 5] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax


def trace_iterations(logdir: str, iters: int, unroll: int):
    from _bench_common import make_trainer_and_buf

    trainer, state, buf, _ = make_trainer_and_buf(scan_unroll=unroll)
    state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(1))
    jax.block_until_ready(m)

    with jax.profiler.trace(logdir):
        for i in range(iters):
            state, m = trainer.train_iteration(state, buf, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(m)


def summarize(logdir: str, top: int, root_filter: str | None = None):
    """Direct xplane.pb parse (the tensorboard_plugin_profile converter's
    pywrap symbol is absent in this image): compute per-op SELF-times on the
    'XLA Ops' line via interval nesting (events nest: a while/fusion parent
    envelops its children, so flat sums double-count), then print the top
    ops.  With --root NAME, only ops whose top-level ancestor matches NAME
    are aggregated (e.g. --root while.941 for one epoch loop).  Run under
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (C++ descriptor pool
    rejects TF's stale generated protos)."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found under", logdir)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())

    plane = next((p for p in space.planes if p.name == "/device:TPU:0"), None)
    if plane is None:
        print("no TPU plane (planes: %s)" % [p.name for p in space.planes])
        return
    meta = plane.event_metadata
    line = next((l for l in plane.lines if l.name == "XLA Ops"), None)
    if line is None:
        print("no 'XLA Ops' line")
        return

    evs = sorted((e.offset_ps, e.duration_ps, e.metadata_id) for e in line.events)
    agg, full, roots = {}, {}, {}
    stack = []  # [end_ps, child_total_ps, metadata_id, duration_ps, root_name]

    def name_of(mid):
        return meta[mid].name if mid in meta else str(mid)

    def close(upto):
        while stack and stack[-1][0] <= upto:
            end, child, mid, dur, root = stack.pop()
            if stack:
                stack[-1][1] += dur
            else:
                r = roots.setdefault(root, [0, 0])
                r[0] += dur
                r[1] += 1
            if root_filter and root_filter not in root:
                continue
            nm = name_of(mid)
            key = nm.split(" = ")[0]
            a = agg.setdefault(key, [0, 0])
            a[0] += dur - child
            a[1] += 1
            full.setdefault(key, nm)

    for off, dur, mid in evs:
        close(off + 1)
        nm = name_of(mid).split(" = ")[0]
        root = stack[0][4] if stack else nm
        stack.append([off + dur, 0, mid, dur, root])
    close(float("inf"))

    print("— top-level regions —")
    for k, (ps, n) in sorted(roots.items(), key=lambda kv: -kv[1][0])[:12]:
        print(f"{ps/1e6:10.1f} us x{n:<4d} {k[:90]}")
    total = sum(v[0] for v in agg.values()) / 1e6
    scope = f"root~'{root_filter}'" if root_filter else "all roots"
    print(f"\n— per-op self-time ({scope}): total {total:.0f} us —")
    for k, (ps, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{ps/1e6:9.1f} us {100*ps/1e6/total:5.1f}%  x{n:<5d} {full[k][:150]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--unroll", type=int, default=5)
    parser.add_argument("--logdir", type=str, default="/tmp/xprof_iter")
    parser.add_argument("--parse-only", action="store_true")
    parser.add_argument("--root", type=str, default=None)
    args = parser.parse_args()
    if not args.parse_only:
        trace_iterations(args.logdir, args.iters, args.unroll)
    summarize(args.logdir, args.top, args.root)


if __name__ == "__main__":
    main()
