"""Measure the cross-host collective overhead of the data-parallel learner
on CPU meshes (BASELINE "≥80% efficiency 1 host → N hosts" stand-in: no
multi-chip TPU is reachable from this host, but the collective BYTES per
iteration are topology-independent facts, and the gloo-loopback overhead
bounds the transport term from above — ICI is orders of magnitude faster).

Design: identical global program (flagship MODEL widths — the psum payload
is the full ~9M-param gradient tree — but tiny batch/sequence so compute
noise does not swamp the collective term) on
  A: 1 process × 2 virtual CPU devices  (in-process collectives), vs
  B: 2 processes × 1 device each, gloo  (cross-process collectives).
Per-device work is identical; the B−A per-iteration delta isolates the
cross-process transport cost.

    PALLAS_AXON_POOL_IPS= python tools/measure_scaling.py
writes docs/evidence/scaling_cpu_mesh.json.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CFG = os.path.join(REPO, "configs", "car_racer.yaml")
TIMED_ITERS = 6
WARMUP_ITERS = 2


def overrides(out_dir, mesh_rows, envs_per_proc):
    return [
        f"runtime.mesh_shape=[{mesh_rows},1]",
        "runtime.rollout_device=cpu",
        "runtime.compute_dtype=float32",   # CPU bf16 is emulated/slow; the
                                           # psum payload (f32 grads) is
                                           # unchanged by compute dtype
        "env.env_id=fake",
        # 2 GLOBAL env streams in both topologies (ring env-axis shards
        # over the data axis): 2 local for 1-proc, 1 per process for 2-proc
        f"env.num_envs={envs_per_proc}",
        "train.batch_size=4",              # tiny compute, full-width params
        "train.sequence_length=12",
        "train.horizon=8",
        "train.wm_epochs=1",
        "train.ac_epochs=1",
        "train.random_iterations=1",
        f"runtime.log_dir={out_dir}/logs",
        f"runtime.checkpoint_dir={out_dir}/models",
    ]


def worker():
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REPO)
    from dreamer_tpu.config import DreamerConfig
    from dreamer_tpu.orchestrator import Dreamer
    from dreamer_tpu.parallel.distributed import init_distributed, is_primary

    init_distributed()
    out_dir = sys.argv[2]
    mesh_rows = int(sys.argv[3])
    envs_per_proc = int(sys.argv[4])
    cfg = DreamerConfig.from_yaml(
        CFG, overrides=overrides(out_dir, mesh_rows, envs_per_proc))
    d = Dreamer(cfg)
    while int(d._host_value(d.buf.size)) < cfg.train.sequence_length:
        d.rollout_policy(random_policy=True)

    it_fn = d._sharded_iteration or d.trainer.train_iteration
    times = []
    for i in range(WARMUP_ITERS + TIMED_ITERS):
        t0 = time.perf_counter()
        d.state, m = it_fn(d.state, d.buf, d._learner_key())
        jax.block_until_ready(m["wm/loss"])
        if i >= WARMUP_ITERS:
            times.append(time.perf_counter() - t0)

    if is_primary():
        import numpy as np

        n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(
            (d.state.wm.params, d.state.ac.actor_params,
             d.state.ac.critic_params)))
        print(f"RESULT {json.dumps({'times': times, 'n_params': n_params})}",
              flush=True)


def launch(n_proc, out_dir):
    """Run the worker under 1 or 2 processes; return the RESULT payload."""
    os.makedirs(out_dir, exist_ok=True)
    envs = []
    if n_proc == 1:
        envs.append(dict(os.environ, PALLAS_AXON_POOL_IPS="",
                         JAX_PLATFORMS="cpu",
                         XLA_FLAGS="--xla_force_host_platform_device_count=2"))
    else:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        for pid in range(n_proc):
            envs.append(dict(os.environ, PALLAS_AXON_POOL_IPS="",
                             JAX_PLATFORMS="cpu",
                             XLA_FLAGS="--xla_force_host_platform_device_count=1",
                             JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                             JAX_NUM_PROCESSES=str(n_proc),
                             JAX_PROCESS_ID=str(pid)))
    envs_per_proc = 2 if n_proc == 1 else 1
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", f"{out_dir}/p{i}", "2",
         str(envs_per_proc)],
        env=e, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i, e in enumerate(envs)]
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
    raise RuntimeError("no RESULT line:\n" + outs[0][-2000:])


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker()
        return
    import numpy as np

    res = {}
    for name, n_proc in (("1proc_2dev", 1), ("2proc_gloo", 2)):
        r = launch(n_proc, f"/tmp/scaling_{name}")
        med = float(np.median(r["times"]))
        res[name] = {"iter_s_median": med, "iter_s_all": r["times"],
                     "n_params": r["n_params"]}
        print(f"{name}: median {med*1000:.1f} ms/iter over {len(r['times'])}")

    n_params = res["1proc_2dev"]["n_params"]
    psum_bytes = 2 * 0.5 * n_params * 4 * 3   # 2(N-1)/N, N=2; 3 opt steps/iter
    out = {
        "workload": "flagship model widths, B=4 T=12 H=8, wm/ac_epochs=1",
        "n_params": n_params,
        "psum_payload_bytes_per_iter": int(psum_bytes),
        **res,
        "overhead_s_per_iter": res["2proc_gloo"]["iter_s_median"]
                               - res["1proc_2dev"]["iter_s_median"],
    }
    path = os.path.join(REPO, "docs", "evidence", "scaling_cpu_mesh.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
