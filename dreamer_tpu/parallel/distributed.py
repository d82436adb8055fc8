"""Multi-host initialisation (SURVEY §2.3 distributed-comm backend obligation).

The reference has no distributed machinery; the TPU-native equivalent is
``jax.distributed.initialize`` (one process per host, all devices visible as
one global mesh) + in-program XLA collectives.  Call ``init_distributed()``
before building any mesh; on single-process runs it is a no-op.

Per-host env farms: each host runs ``cfg.env.num_envs`` local environments
and writes its shard of the (host-sharded) replay ring; the learner's data
axis spans all hosts, so gradient psums cross ICI within a slice and DCN
across slices — XLA picks the reduction topology from the mesh layout.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialise multi-host JAX.  Arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars (and
    are auto-detected on Cloud TPU pods).  Returns True if a multi-process
    setup was initialised."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # Single-process (or TPU-pod auto-detected) run.
        if _on_tpu_pod():
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def _int_env(name: str) -> Optional[int]:
    val = os.environ.get(name)
    return int(val) if val is not None else None


def _on_tpu_pod() -> bool:
    return os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
