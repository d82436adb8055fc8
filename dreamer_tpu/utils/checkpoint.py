"""Resumable checkpointing — the full-resume path the reference lacks.

The reference saves only module weights every 1000 iters (Dreamer.py:347-354);
optimizer state, buffer contents, iteration count and RNG are lost on crash
(SURVEY §5).  Here a checkpoint is ONE pytree containing:

    {"state": DreamerState (params + optimizer states + target critic + S),
     "buffer": ReplayState (obs/action/reward/cont rings + head/size),
     "rng": PRNG key, "iteration": int, "env_seed": int}

Saved via orbax (async-capable, tensorstore-backed — handles the multi-GB
replay arrays) with restore into an exemplar pytree so NamedTuple/optax
structures round-trip exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, keep_last: int = 3, use_async: bool = False):
        """``use_async``: write checkpoints with orbax's AsyncCheckpointer —
        save() blocks only for the device->host copy; serialization overlaps
        training (SURVEY §5: "Orbax-style async save")."""
        self.directory = os.path.abspath(directory)
        self.keep_last = keep_last
        os.makedirs(self.directory, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ocp = ocp
        if use_async:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()
        self._async = use_async
        self._pending_step = None
        import threading

        self._finalize_lock = threading.Lock()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}")

    def save(self, step: int, tree: Any) -> str:
        """Write checkpoint for ``step``, update the 'latest' pointer, and
        prune all but the newest ``keep_last`` checkpoints (each checkpoint
        includes the replay rings — GBs at the flagship config)."""
        path = self._path(step)
        if self._async:
            # Land (and finalize) any previous in-flight save first.
            self.wait_until_finished()
        self._ckptr.save(path, tree, force=True)
        if self._async:
            # Finalize (LATEST pointer + prune) from a daemon thread as soon
            # as the write lands — a crash between checkpoints must still
            # leave a resumable LATEST for run_supervised.py.
            import threading

            self._pending_step = step
            threading.Thread(target=self.wait_until_finished, daemon=True).start()
            return path
        self._finalize(step)
        return path

    def _finalize(self, step: int):
        with open(os.path.join(self.directory, "LATEST"), "w") as f:
            f.write(str(step))
        self._prune()

    def wait_until_finished(self):
        """Block until any in-flight async save has landed and finalized
        (idempotent; also invoked from the post-save daemon thread)."""
        if self._async:
            self._ckptr.wait_until_finished()
            with self._finalize_lock:
                pending = self._pending_step
                if pending is not None:
                    self._finalize(pending)
                    self._pending_step = None

    def _prune(self):
        import re
        import shutil

        steps = sorted(
            int(m.group(1)) for name in os.listdir(self.directory)
            if (m := re.fullmatch(r"ckpt_(\d+)", name)))
        for old in steps[: max(0, len(steps) - self.keep_last)]:
            shutil.rmtree(self._path(old), ignore_errors=True)

    def latest_step(self) -> Optional[int]:
        self.wait_until_finished()
        marker = os.path.join(self.directory, "LATEST")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return int(f.read().strip())

    def restore_numpy(self, path: str, target: Any) -> Any:
        """Topology-independent raw restore: every leaf comes back as host
        numpy in the structure of ``target``, with no device placement and no
        dependence on the checkpoint's saved sharding/device metadata (safe
        across platforms — e.g. TPU-trained weights into a CPU process)."""
        restore_args = jax.tree.map(
            lambda _: self._ocp.RestoreArgs(restore_type=np.ndarray), target)
        return self._ckptr.restore(os.path.abspath(path), item=target,
                                   restore_args=restore_args)

    def restore(self, step: int, target: Any, shardings: Any = None) -> Any:
        """Restore into the structure of ``target`` (an exemplar pytree with
        correct shapes/dtypes, e.g. a freshly-initialised state).

        ``shardings``: optional pytree of jax.sharding.Sharding matching
        ``target`` — leaves are placed directly onto their mesh shardings
        (mesh-resume; without it a sharded run would restore unsharded)."""
        if jax.process_count() == 1:
            # Topology-independent restore: deserialize every leaf as host
            # numpy and re-place below.  Without explicit restore_args orbax
            # reads the checkpoint's sharding file and resolves saved device
            # strings against jax.local_devices() — which breaks whenever the
            # restore topology differs from the save topology (e.g. a leaf
            # saved on the host CPU device "TFRT_CPU_0" while rollout_device
            # was 'cpu' cannot be resolved under the axon TPU platform, where
            # local_devices() lists only the TPU chip).
            restored = self.restore_numpy(self._path(step), target)
        else:
            # Multi-host: restore global arrays in place (same topology by
            # construction — every process participates in the restore).
            restored = self._ckptr.restore(self._path(step), item=target)
        if shardings is not None:
            def _place(exemplar, val, sh):
                if isinstance(val, jax.Array) and not val.is_fully_addressable:
                    # Multi-host: orbax restored a global array directly onto
                    # the target's shardings; re-fetching it is impossible
                    # (and re-placement unnecessary).
                    return val
                arr = np.asarray(val, dtype=getattr(exemplar, "dtype", None))
                if (getattr(sh, "is_fully_addressable", True)
                        or jax.process_count() == 1):
                    return jax.device_put(arr, sh)
                # Multi-host, host-restored leaf: assemble the global array
                # from this process's addressable shards.
                return jax.make_array_from_callback(arr.shape, sh,
                                                    lambda idx: arr[idx])

            return jax.tree.map(_place, target, restored, shardings)
        # orbax may return numpy leaves; push them back to device arrays with
        # the exemplar's dtypes.
        return jax.tree.map(
            lambda exemplar, val: jax.numpy.asarray(val, dtype=getattr(exemplar, "dtype", None)),
            target, restored)

    def restore_latest(self, target: Any, shardings: Any = None
                       ) -> Optional[Tuple[int, Any]]:
        step = self.latest_step()
        if step is None:
            return None
        return step, self.restore(step, target, shardings=shardings)
